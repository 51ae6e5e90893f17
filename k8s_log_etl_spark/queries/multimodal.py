"""Multimodal / nested-column queries (§2c charter): typed extraction
from the events.props JSON column, opaque binary payload columns with
metadata, and the Arrow-batched decode stub (operators/multimodal.py)
— oracle-checked because the fake decode is deterministic from md5
bytes, which DuckDB can recompute from the hex digest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from k8s_log_etl_spark.operators import multimodal as MM
from k8s_log_etl_spark.plans.registry import register
from k8s_log_etl_spark.tables import ensure_min_parallelism, load_table, spill_checkpoint

_PROPS_SQL = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
       min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
       max(CAST(props->>'$.k' AS BIGINT)) AS max_k,
       count(*) FILTER (CAST(props->>'$.k' AS BIGINT) IS NULL) AS null_k
FROM events
GROUP BY event_type
"""


@register("events_props_typed", oracle=_PROPS_SQL, tags=("multimodal",))
def events_props_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read over the nested props JSON column: one from_json
    into a typed struct, aggregated per event type. The parse happens
    in the scan stage; only (event_type, k) survive into the shuffle."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k bigint")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count(F.when(F.col("k").isNull(), 1)).alias("null_k"),
        )
    )


_BLOB_SQL = """
SELECT source,
       count(*) AS n_payloads,
       CAST(sum(octet_length(from_hex(md5(text)))) AS BIGINT) AS total_bytes,
       count(DISTINCT md5(text)) AS distinct_payloads
FROM documents
GROUP BY source
"""


@register("multimodal_blob_meta", oracle=_BLOB_SQL, tags=("multimodal",))
def multimodal_blob_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary payload columns with typed metadata: per-source
    byte totals and payload dedup counts, all JVM-side binary ops."""
    d = MM.attach_payload(ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark, "doc_id"))
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_payloads"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.countDistinct(F.md5("text")).alias("distinct_payloads"),
    )


_DECODE_SQL = """
WITH meta AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(text), 1, 2)) AS INTEGER) AS width,
         CAST(concat('0x', substr(md5(text), 3, 2)) AS INTEGER) AS height
  FROM documents WHERE text IS NOT NULL
)
SELECT width % 16 AS width_bucket,
       count(*) AS n_images,
       CAST(sum(CAST(width AS BIGINT) * height) AS BIGINT) AS total_pixels
FROM meta
GROUP BY width % 16
"""


@register("multimodal_decode_stats", oracle=_DECODE_SQL, tags=("multimodal",))
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drives the Arrow-batched mapInPandas decode stub end-to-end and
    aggregates the decoded metadata. The only Python-worker stage in
    the engine — batch-columnar, fixed schema, decode swap-ready."""
    d = MM.attach_payload(ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark, "doc_id"))
    decoded = MM.decode_metadata(d)
    return decoded.groupBy((F.col("width") % 16).alias("width_bucket")).agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum("n_pixels").alias("total_pixels"),
    )


_RESIZE_SQL = """
WITH meta AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(text), 1, 2)) AS INTEGER) AS w,
         CAST(concat('0x', substr(md5(text), 3, 2)) AS INTEGER) AS h
  FROM documents WHERE text IS NOT NULL
)
SELECT count(*) AS n_images,
       CAST(sum(CAST(CAST(floor(w * least(64.0 / greatest(w, h, 1), 1.0)) AS INTEGER) AS BIGINT)) AS BIGINT) AS total_thumb_width,
       max(CAST(floor(h * least(64.0 / greatest(w, h, 1), 1.0)) AS INTEGER)) AS max_thumb_height
FROM meta
"""


@register("multimodal_resize_stats", oracle=_RESIZE_SQL, tags=("multimodal",))
def multimodal_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drives the mapInPandas resize stub (binary in → scaled metadata +
    thumbnail binary out) and aggregates — the oracle recomputes the
    deterministic fake's arithmetic from the md5 hex."""
    d = MM.attach_payload(ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark, "doc_id"))
    thumbs = MM.resize_thumbnails(d)
    return thumbs.agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum("width").alias("total_thumb_width"),
        F.max("height").alias("max_thumb_height"),
    )


_FRAMES_SQL = """
SELECT count(*) AS n_frames, count(DISTINCT doc_id) AS n_docs
FROM (SELECT doc_id, unnest(range(0, 16, 4)) FROM documents WHERE text IS NOT NULL)
"""


@register("multimodal_frame_sample", oracle=_FRAMES_SQL, tags=("multimodal",))
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drives the mapInPandas frame sampler (1:N flatMap over binary
    payloads): every 4th byte-frame of the 16-byte fake payload →
    4 frames per doc."""
    d = MM.attach_payload(ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark, "doc_id"))
    frames = MM.sample_frames(d)
    return frames.agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# multimodal curation capstone: decode gate -> payload dedup -> budget
# ---------------------------------------------------------------------------

MM_MIN_DIM = 32      # decode-gate: both fake dimensions must be >= this
MM_SOURCE_CAP = 10   # per-source keep budget

_MM_W_SQL = "CAST(concat('0x', substr(md5(text), 1, 2)) AS INTEGER)"
_MM_H_SQL = "CAST(concat('0x', substr(md5(text), 3, 2)) AS INTEGER)"
_MM_PRIO_SQL = "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"

_MM_CURATE_SQL = f"""
WITH decoded AS (
  SELECT doc_id, source, md5(text) AS phex,
         {_MM_W_SQL} AS width, {_MM_H_SQL} AS height
  FROM documents WHERE text IS NOT NULL
),
gated AS (
  SELECT * FROM decoded
  WHERE width >= {MM_MIN_DIM} AND height >= {MM_MIN_DIM}
),
deduped AS (
  SELECT g.* FROM gated g
  JOIN (SELECT phex, min(doc_id) AS keep_id FROM gated GROUP BY phex) k
    ON g.doc_id = k.keep_id
),
budgeted AS (
  SELECT * FROM (
    SELECT d.*,
           row_number() OVER (
             PARTITION BY source ORDER BY {_MM_PRIO_SQL}, doc_id
           ) AS rn
    FROM deduped d
  ) WHERE rn <= {MM_SOURCE_CAP}
)
SELECT source,
       count(*) AS n_kept,
       CAST(sum(CAST(width AS BIGINT) * height) AS BIGINT) AS total_pixels,
       min(doc_id) AS first_doc
FROM budgeted
GROUP BY source
"""


@register("multimodal_curation_pipeline", oracle=_MM_CURATE_SQL, tags=("multimodal", "llmprep"))
def multimodal_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal curation capstone — the image-corpus analogue of
    corpus_clean_pipeline: decode metadata (the REAL Arrow mapInPandas
    plumbing around the clearly-marked fake decoder), gate on minimum
    dimensions, exact-dedup on the payload digest (keep lowest doc_id),
    then apply a deterministic per-source keep budget (md5-priority
    WindowGroupLimit — the same seeded-sampling discipline as
    sample_stratified_topk). Plan at 100 TB: decode is one
    partition-parallel Python pass (the unavoidable media step — all
    later stages are JVM-side), the gate prunes before any shuffle, the
    dedup is a hash-agg on the 16-byte digest, and the budget window
    partitions on source with map-side group limits. The oracle
    recomputes the fake decoder's arithmetic from the md5 hex, so the
    whole chain — decode, gate, dedup frontier, budget frontier — is
    hash-verified."""
    from pyspark.sql import Window

    from k8s_log_etl_spark.functions import xengine as X

    d = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    decoded = MM.decode_metadata(MM.attach_payload(d)).select(
        "doc_id", F.hex(F.col("payload")).alias("phex_raw"), "width", "height"
    ).withColumn("phex", F.lower(F.col("phex_raw")))
    gated = decoded.filter(
        (F.col("width") >= MM_MIN_DIM) & (F.col("height") >= MM_MIN_DIM)
    )
    keep = gated.groupBy("phex").agg(F.min("doc_id").alias("keep_id"))
    deduped = (
        gated.join(keep, gated["doc_id"] == keep["keep_id"], "left_semi")
        .join(d.select("doc_id", "source"), "doc_id")
    )
    prio = X.md5_long(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(prio.asc(), F.asc("doc_id"))
    budgeted = deduped.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= MM_SOURCE_CAP
    )
    return budgeted.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(F.col("width").cast("bigint") * F.col("height")).alias("total_pixels"),
        F.min("doc_id").alias("first_doc"),
    )


# ---------------------------------------------------------------------------
# feature extraction (the embed step of a multimodal pipeline)
# ---------------------------------------------------------------------------

_FEAT_TERMS = " + ".join(
    f"(CAST(concat('0x', substr(md5(text), {2 * i + 1}, 2)) AS INTEGER) / 255.0)"
    f" * (CAST(concat('0x', substr(md5(text), {2 * i + 1}, 2)) AS INTEGER) / 255.0)"
    for i in range(MM.FEATURE_DIMS)
)

_FEATURES_SQL = f"""
WITH norms AS (
  SELECT doc_id, source,
         CAST(round(sqrt({_FEAT_TERMS}) * {MM.FEATURE_QUANT}) AS BIGINT) AS norm_q
  FROM documents WHERE text IS NOT NULL
)
SELECT source, count(*) AS n_images,
       round(sum(norm_q) * 1.0 / count(*) / {MM.FEATURE_QUANT}, 6) AS mean_feat_norm,
       round(min(norm_q) * 1.0 / {MM.FEATURE_QUANT}, 6) AS min_feat_norm,
       round(max(norm_q) * 1.0 / {MM.FEATURE_QUANT}, 6) AS max_feat_norm
FROM norms GROUP BY source
"""


@register("multimodal_feature_extract", oracle=_FEATURES_SQL, tags=("multimodal",))
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drives the mapInPandas feature-extract stub (the embed step a
    real pipeline runs a vision encoder for): per-image fake feature
    vector from payload bytes → L2 norm quantized to integer
    micro-units INSIDE the UDF, so the per-source aggregates are exact
    integer sums — order-free across partitions, immune to float
    accumulation order (the text_perplexity_proxy discipline applied to
    a Python-side producer). The oracle recomputes the byte→feature
    arithmetic from the md5 hex with the same sequential fold. At
    100 TB this is the canonical embed stage: one partition-parallel
    Arrow pass, everything after it JVM-side."""
    d = MM.attach_payload(
        ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    )
    feats = MM.extract_features(d)
    src = d.select("doc_id", "source")
    return (
        feats.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.round(
                F.sum("norm_q") / F.count(F.lit(1)) / MM.FEATURE_QUANT, 6
            ).alias("mean_feat_norm"),
            F.round(F.min("norm_q") / float(MM.FEATURE_QUANT), 6).alias(
                "min_feat_norm"
            ),
            F.round(F.max("norm_q") / float(MM.FEATURE_QUANT), 6).alias(
                "max_feat_norm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# perceptual near-dup over decoded pixel features (the image analogue
# of dedup_simhash_banded)
# ---------------------------------------------------------------------------

_HEXD = "0123456789abcdef"

_PHASH_PIX_CTES = f"""
base AS (SELECT doc_id, md5(text) AS hex FROM documents WHERE text IS NOT NULL),
corpus AS (
  SELECT doc_id, hex FROM base
  UNION ALL
  SELECT doc_id + {MM.PHASH_VARIANT_OFFSET} AS doc_id,
         array_to_string(list_transform(range(16), j ->
           substr(hex, CAST(2 * j + 1 AS INTEGER), 1) ||
           substr('{_HEXD}', CAST((doc_id + j) % 16 AS INTEGER) + 1, 1)), '')
           AS hex
  FROM base WHERE doc_id % {MM.PHASH_VARIANT_MOD} = 0
),
hh AS (
  -- the re-encode-invariant perceptual channel: the 16 high-nibble
  -- hex chars (odd positions of the payload hex)
  SELECT doc_id, hex,
         array_to_string(list_transform(range(16), j ->
           substr(hex, CAST(2 * j + 1 AS INTEGER), 1)), '') AS hh
  FROM corpus
),
bd AS (
  -- stub 32x32 decode: 64 md5 block digests seeded by the perceptual
  -- channel = 1024 full-entropy pixel bytes (decoded_block_sums)
  SELECT doc_id, hex,
         list_transform(range({MM.PHASH_PIXELS}), blk ->
           md5(hh || ':' || CAST(blk AS VARCHAR))) AS bd
  FROM hh
),
px AS (
  SELECT doc_id, hex,
         flatten(list_transform(bd, d ->
           list_transform(range(16), k ->
             (strpos('{_HEXD}', substr(d, CAST(2 * k + 1 AS INTEGER), 1)) - 1) * 16
             + strpos('{_HEXD}', substr(d, CAST(2 * k + 2 AS INTEGER), 1)) - 1)))
           AS px
  FROM bd
),
pix AS (
  -- exact 8x8 downscale: 4x4 block SUMS of the 32x32 field (sums ==
  -- means under both scale-invariant thresholds)
  SELECT doc_id, hex,
         list_transform(range({MM.PHASH_PIXELS}), i ->
           list_sum(list_transform(range(16), t ->
             px[CAST(((i // 8) * 4 + t // 4) * 32
                     + (i % 8) * 4 + t % 4 AS INTEGER) + 1]))) AS p
  FROM px
)"""

_PHASH_SIG_CTES = f"""{_PHASH_PIX_CTES},
sig AS (
  SELECT doc_id, hex,
         list_transform(range({MM.PHASH_BANDS}), b ->
           list_sum(list_transform(range(16), k ->
             (CASE WHEN {MM.PHASH_PIXELS} * p[CAST(16 * b + k AS INTEGER) + 1]
                        >= list_sum(p) THEN 1 ELSE 0 END)
             * (1 << CAST(k AS INTEGER))))) AS bands
  FROM pix
)"""

_PHASH_HAMMING = " + ".join(
    f"bit_count(xor(sa.bands[{k + 1}], sb.bands[{k + 1}]))"
    for k in range(MM.PHASH_BANDS)
)

_PHASH_SQL = f"""
WITH {_PHASH_SIG_CTES},
bl AS (
  SELECT doc_id, CAST(t.b AS INTEGER) AS band_idx,
         bands[CAST(t.b AS INTEGER) + 1] AS val
  FROM sig, unnest(range({MM.PHASH_BANDS})) AS t(b)
),
ok AS (
  SELECT band_idx, val FROM bl GROUP BY band_idx, val
  HAVING count(*) <= {MM.PHASH_BUCKET_CAP}
),
blc AS (SELECT bl.* FROM bl JOIN ok USING (band_idx, val)),
cand AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM blc a JOIN blc b
    ON a.band_idx = b.band_idx AND a.val = b.val AND a.doc_id < b.doc_id
)
SELECT c.da AS doc_a, c.db AS doc_b,
       CAST({_PHASH_HAMMING} AS BIGINT) AS hamming,
       (sa.hex = sb.hex) AS digest_equal
FROM cand c
JOIN sig sa ON c.da = sa.doc_id
JOIN sig sb ON c.db = sb.doc_id
WHERE {_PHASH_HAMMING} <= {MM.PHASH_MAX_HAMMING}
"""


def _capped_bands(bands: DataFrame) -> DataFrame:
    """Hot-bucket cap (the POSTING_CAP discipline, mirrored in both
    perceptual oracles): drop any (band, value) bucket holding more
    docs than PHASH_BUCKET_CAP from candidate generation — the bucket
    occupancy k drives a sum C(k,2) pair blowup, the measured round-8
    saturation cliff. Occupancy counting is one hash-agg with map-side
    partials; the keep-join is keyed on (band_idx, val) and AQE
    broadcasts the (small) survivor set at fixture scale."""
    ok = (
        bands.groupBy("band_idx", "val")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") <= MM.PHASH_BUCKET_CAP)
        .drop("n")
    )
    return bands.join(ok, ["band_idx", "val"])


@register("dedup_perceptual_ahash", oracle=_PHASH_SQL, tags=("multimodal", "dedup"))
def dedup_perceptual_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup for the image corpus (round-5 verdict #5) —
    the multimodal analogue of dedup_simhash_banded, closing the gap
    the curation pipeline's digest dedup leaves: a re-encoded image
    (same pixels, different bytes) never digest-matches, so only a
    hash over DECODED features can pair it with its original. The
    corpus manufactures that exact condition (with_reencoded_variants:
    every 5th doc gains a low-nibble-noise twin with a fresh digest),
    and this query catches every twin at Hamming 0 while digest_equal
    is false — the rows the digest path provably misses.

    Shape: Arrow mapInPandas decode->aHash (the only Python pass;
    32x32 stub decode + exact 4x4 block sums, decoded_block_sums),
    4 x 16-bit band signature, pigeonhole candidate join (a pair
    within Hamming <= 3 of 64 bits MUST share one of 4 bands — the
    banded join is lossless for the reported radius unless every band
    a pair shares is over the PHASH_BUCKET_CAP hot-bucket drop, the
    documented lossy guard mirrored in the oracle), then exact Hamming
    verify via bit_count(xor) on candidates only. At 100 TB:
    signatures are one partition-parallel Python pass + checkpoint;
    candidates are a keyed equi-join on (band, value) with bucket
    occupancy capped — never all-pairs; verify is JVM-side bit math on
    the candidate set. The oracle recomputes decode, block sums, bits,
    bands, the cap, candidates, and Hamming from the md5 hex, so the
    whole chain is hash-verified."""
    d = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    corpus = MM.with_reencoded_variants(MM.attach_payload(d))
    sig = spill_checkpoint(MM.ahash_signatures(corpus))  # per-image: data-sized
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(k).alias("band_idx"), F.col(f"b{k}").alias("val")
                )
                for k in range(MM.PHASH_BANDS)
            ])
        ).alias("bv"),
    ).select("doc_id", "bv.band_idx", "bv.val")
    bands = _capped_bands(bands)
    cand = (
        bands.alias("ba")
        .join(bands.alias("bb"), ["band_idx", "val"])
        .filter(F.col("ba.doc_id") < F.col("bb.doc_id"))
        .select(
            F.col("ba.doc_id").alias("da"), F.col("bb.doc_id").alias("db")
        )
        .distinct()
    )
    sa = sig.select(
        F.col("doc_id").alias("da"),
        F.col("digest").alias("dga"),
        *[F.col(f"b{k}").alias(f"a{k}") for k in range(MM.PHASH_BANDS)],
    )
    sb = sig.select(
        F.col("doc_id").alias("db"),
        F.col("digest").alias("dgb"),
        *[F.col(f"b{k}").alias(f"bb{k}") for k in range(MM.PHASH_BANDS)],
    )
    ham = sum(
        F.bit_count(F.col(f"a{k}").bitwiseXOR(F.col(f"bb{k}")))
        for k in range(MM.PHASH_BANDS)
    )
    return (
        cand.join(sa, "da")
        .join(sb, "db")
        .withColumn("hamming", ham.cast("bigint"))
        .filter(F.col("hamming") <= MM.PHASH_MAX_HAMMING)
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            "hamming",
            (F.col("dga") == F.col("dgb")).alias("digest_equal"),
        )
    )


# ---------------------------------------------------------------------------
# cross-modal retrieval (round-6 verdict #6): CLIP-shaped text->image
# retrieval over the fake-but-hashable two-tower encoders, through the
# RAG-style hyperplane-LSH bucket machinery (own plane family — see
# _xm_plane), OR-amplified over three bands.
# ---------------------------------------------------------------------------

XMODAL_DIM = 8           # shared embedding space (both towers)
XMODAL_PLANES = 6        # hyperplane bits per band -> 64 buckets
XMODAL_BANDS = 3         # OR-amplification: candidate if ANY band matches
XMODAL_QUERY_DOCS = 20   # doc_id < this play the caption queries
XMODAL_TOP_K = 3
XMODAL_NOISE_MOD = 401   # text-tower modality noise in [-200, 200] milli


def _xm_img_dim_sql(d: int) -> str:
    """Image-tower dim d from the payload digest hex (4 hex chars per
    dim; payload = unhex(md5(text)), so the oracle reads md5(text))."""
    return (
        f"((CAST(concat('0x', substr(md5(text), {4 * d + 1}, 4)) AS BIGINT)"
        f" % 2001) - 1000) / 1000.0"
    )


def _xm_txt_dim_sql(d: int) -> str:
    """Text-tower dim d: the content vector plus deterministic modality
    noise — the two towers agree on content but are not byte-equal,
    exactly the CLIP condition retrieval needs."""
    from k8s_log_etl_spark.functions.xengine import md5_long_sql

    h = md5_long_sql(f"text || '|xm{d}'")
    pert = f"(({h} % {XMODAL_NOISE_MOD}) - 200)"
    return f"({_xm_img_dim_sql(d)} + {pert} / 1000.0)"


def _xm_plane(j: int, i: int) -> int:
    """Deterministic integer hyperplane weights in [-14, 14] for the
    cross-modal index — its own family rather than _rag_plane because
    that formula has period 15 in j: with 3 bands x 6 planes the 18th
    plane would duplicate the 3rd, correlating band 2 with band 0 and
    weakening the OR-amplification. Period-29 here keeps all 18 rows
    distinct."""
    return ((j * 37 + i * 17) % 29) - 14


def _xm_bucket_sql(e: str, band: int) -> str:
    from k8s_log_etl_spark.functions.xengine import dot_sql

    terms = []
    for j in range(XMODAL_PLANES):
        w = "[" + ", ".join(
            f"{float(_xm_plane(band * XMODAL_PLANES + j, i))}"
            for i in range(XMODAL_DIM)
        ) + "]"
        terms.append(f"(CASE WHEN {dot_sql(e, w)} > 0 THEN {1 << j} ELSE 0 END)")
    return " + ".join(terms)


def _xmodal_sql() -> str:
    from k8s_log_etl_spark.functions.xengine import cosine_sql

    img_dims = ", ".join(_xm_img_dim_sql(d) for d in range(XMODAL_DIM))
    txt_dims = ", ".join(_xm_txt_dim_sql(d) for d in range(XMODAL_DIM))
    band_joins = "\n  UNION\n".join(
        f"""  SELECT q.query_doc, c.doc_id FROM qidx q
  JOIN cidx c ON q.qb{b} = c.b{b}"""
        for b in range(XMODAL_BANDS)
    )
    qb_cols = ", ".join(
        f"{_xm_bucket_sql('e', b)} AS qb{b}" for b in range(XMODAL_BANDS)
    )
    cb_cols = ", ".join(
        f"{_xm_bucket_sql('e', b)} AS b{b}" for b in range(XMODAL_BANDS)
    )
    return f"""
WITH cemb AS (SELECT doc_id, [{img_dims}] AS e FROM documents
              WHERE text IS NOT NULL),
cidx AS (SELECT doc_id, e, {cb_cols} FROM cemb),
qemb AS (SELECT doc_id AS query_doc, [{txt_dims}] AS e FROM documents
         WHERE doc_id < {XMODAL_QUERY_DOCS} AND text IS NOT NULL),
qidx AS (SELECT query_doc, e, {qb_cols} FROM qemb),
cand AS (
{band_joins}
)
SELECT query_doc, doc_id, cos_sim, rnk FROM (
  SELECT p.query_doc, p.doc_id,
         round({cosine_sql('q.e', 'c.e')}, 6) AS cos_sim,
         row_number() OVER (
           PARTITION BY p.query_doc
           ORDER BY {cosine_sql('q.e', 'c.e')} DESC, p.doc_id
         ) AS rnk
  FROM cand p
  JOIN qidx q ON p.query_doc = q.query_doc
  JOIN cidx c ON p.doc_id = c.doc_id
) WHERE rnk <= {XMODAL_TOP_K}
"""


def _xm_img_vec(hexcol: F.Column) -> F.Column:
    """Image tower (Spark): dims off the payload hex digest."""
    return F.array(
        *[
            (
                F.conv(F.substring(hexcol, 4 * d + 1, 4), 16, 10).cast(
                    "bigint"
                )
                % 2001
                - 1000
            )
            / F.lit(1000.0)
            for d in range(XMODAL_DIM)
        ]
    )


def _xm_txt_vec(text: F.Column) -> F.Column:
    """Text tower (Spark): content dims + modality noise."""
    from k8s_log_etl_spark.functions import xengine as X

    base = F.md5(text)
    return F.array(
        *[
            (
                F.conv(F.substring(base, 4 * d + 1, 4), 16, 10).cast("bigint")
                % 2001
                - 1000
            )
            / F.lit(1000.0)
            + (
                X.md5_long(F.concat(text, F.lit(f"|xm{d}")))
                % XMODAL_NOISE_MOD
                - 200
            )
            / F.lit(1000.0)
            for d in range(XMODAL_DIM)
        ]
    )


def _xm_bucket(e: str, band: int) -> F.Column:
    from k8s_log_etl_spark.functions import xengine as X

    # round-13: unrolled SQL-string hyperplane signs (guide §4.1) — the
    # zip_with/aggregate dot evaluated interpreted per row; the unrolled
    # chain performs the identical double ops in the same order inside
    # codegen. `e` is the embedding column NAME.
    terms = []
    for j in range(XMODAL_PLANES):
        prods = " + ".join(
            f"(CAST(try_element_at({e}, {i + 1}) AS DOUBLE)"
            f" * CAST({float(_xm_plane(band * XMODAL_PLANES + j, i))!r} AS DOUBLE))"
            for i in range(XMODAL_DIM)
        )
        terms.append(
            f"(CASE WHEN (CAST(0.0 AS DOUBLE) + {prods}) > 0"
            f" THEN {1 << j} ELSE 0 END)"
        )
    return F.expr("(" + " + ".join(terms) + ")")


@register(
    "crossmodal_retrieval",
    oracle=_xmodal_sql(),
    tags=("multimodal", "similarity"),
)
def crossmodal_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIP-shaped cross-modal retrieval: caption (text-tower) queries
    against the image-tower index, through the hyperplane-LSH bucket
    machinery of rag_retrieval_pipeline with its own plane family
    (_xm_plane — period-29, so all 18 rows are distinct), OR-amplified
    over three 6-plane bands (candidate if ANY band's bucket matches —
    the MinHash banding trick applied to hyperplane LSH). Completes the multimodal story
    (round-6 verdict #6): the encoders are the established
    fake-but-hashable stubs (the image tower reads dims off the payload
    digest hex — payload is attach_payload's unhex(md5(text)); the text
    tower produces the same content vector plus deterministic
    md5-derived modality noise, so the towers agree on content without
    being byte-equal — swap both bodies for real CLIP towers outside
    this environment), while the retrieval plumbing is the real thing:
    per-band bucket equi-joins, candidate-only cosine verification,
    deterministic top-k.

    Recall vs the exact cross-modal scan is pinned in
    tests/test_crossmodal.py; self-retrieval (each caption's own image
    in the top-k) is the standard CLIP eval and is asserted there.

    Scale shape: both towers are map-side array literals off one
    md5 per row; candidates come from two keyed equi-joins on 64-value
    bucket keys (never all-pairs), UNION-deduped BEFORE the cosine so
    verification touches each candidate pair once; top-k is a
    per-query window over candidate rows only. The query side is tiny
    (broadcast); the image index is never shuffled at serve time on a
    bucketed layout."""
    d = MM.attach_payload(
        ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    ).filter(F.col("payload").isNotNull())  # decode gate's NULL policy
    img = d.select(
        "doc_id", _xm_img_vec(F.lower(F.hex(F.col("payload")))).alias("e")
    )
    cidx = img.select(
        "doc_id",
        "e",
        *[_xm_bucket("e", b).alias(f"b{b}") for b in range(XMODAL_BANDS)],
    )
    txt = d.filter(F.col("doc_id") < XMODAL_QUERY_DOCS).select(
        F.col("doc_id").alias("query_doc"), _xm_txt_vec(F.col("text")).alias("qe")
    )
    qidx = txt.select(
        "query_doc",
        "qe",
        *[
            _xm_bucket("qe", b).alias(f"qb{b}")
            for b in range(XMODAL_BANDS)
        ],
    ).localCheckpoint(eager=True)

    cand = None
    for b in range(XMODAL_BANDS):
        part = (
            F.broadcast(qidx.select("query_doc", f"qb{b}"))
            .join(
                cidx.select("doc_id", f"b{b}"),
                F.col(f"qb{b}") == F.col(f"b{b}"),
            )
            .select("query_doc", "doc_id")
        )
        cand = part if cand is None else cand.unionByName(part)
    cand = cand.distinct()

    from k8s_log_etl_spark.functions import xengine as X

    scored = (
        cand.join(F.broadcast(qidx.select("query_doc", "qe")), "query_doc")
        .join(cidx.select("doc_id", "e"), "doc_id")
        .select(
            "query_doc",
            "doc_id",
            X.cosine_fixed("qe", "e", XMODAL_DIM).alias("cos_raw"),
        )
    )
    wspec = Window.partitionBy("query_doc").orderBy(
        F.desc("cos_raw"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(wspec))
        .filter(F.col("rnk") <= XMODAL_TOP_K)
        .select(
            "query_doc",
            "doc_id",
            F.round(F.col("cos_raw"), 6).alias("cos_sim"),
            "rnk",
        )
    )


# ---------------------------------------------------------------------------
# DCT perceptual hash (pHash) — the robust member of the perceptual
# family beside dedup_perceptual_ahash
# ---------------------------------------------------------------------------

_DCT_W_SQL = "[" + ", ".join(str(w) for w in MM.DCT_W_FLAT) + "]"

_DCT_SIG_CTES = f"""{_PHASH_PIX_CTES},
wm AS (SELECT {_DCT_W_SQL} AS w),
co AS (
  SELECT doc_id, hex,
         list_transform(range(64), i ->
           list_sum(list_transform(range(64), j ->
             w[CAST(i * 64 + j AS INTEGER) + 1]
             * p[CAST(j AS INTEGER) + 1]))) AS f
  FROM pix, wm
),
md AS (
  SELECT doc_id, hex, f, list_sort(f[2:])[32] AS med FROM co
),
sig AS (
  SELECT doc_id, hex,
         list_transform(range({MM.PHASH_BANDS}), b ->
           list_sum(list_transform(range(16), k ->
             (CASE WHEN f[CAST(16 * b + k AS INTEGER) + 1] > med
                   THEN 1 ELSE 0 END)
             * (1 << CAST(k AS INTEGER))))) AS bands
  FROM md
)"""

_DCT_PHASH_SQL = f"""
WITH {_DCT_SIG_CTES},
bl AS (
  SELECT doc_id, CAST(t.b AS INTEGER) AS band_idx,
         bands[CAST(t.b AS INTEGER) + 1] AS val
  FROM sig, unnest(range({MM.PHASH_BANDS})) AS t(b)
),
ok AS (
  SELECT band_idx, val FROM bl GROUP BY band_idx, val
  HAVING count(*) <= {MM.PHASH_BUCKET_CAP}
),
blc AS (SELECT bl.* FROM bl JOIN ok USING (band_idx, val)),
cand AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM blc a JOIN blc b
    ON a.band_idx = b.band_idx AND a.val = b.val AND a.doc_id < b.doc_id
)
SELECT c.da AS doc_a, c.db AS doc_b,
       CAST({_PHASH_HAMMING} AS BIGINT) AS hamming,
       (sa.hex = sb.hex) AS digest_equal
FROM cand c
JOIN sig sa ON c.da = sa.doc_id
JOIN sig sb ON c.db = sb.doc_id
WHERE {_PHASH_HAMMING} <= {MM.PHASH_MAX_HAMMING}
"""


@register("dedup_perceptual_phash_dct", oracle=_DCT_PHASH_SQL, tags=("multimodal", "dedup"))
def dedup_perceptual_phash_dct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DCT perceptual near-dup (pHash, Zauner 2010) — the frequency-
    domain sibling of dedup_perceptual_ahash: bits come from
    thresholding the 8x8 integer DCT-II coefficient block against its
    AC median instead of thresholding pixels against their mean, so
    the signature encodes low-frequency STRUCTURE (what survives
    re-encoding, scaling, mild blur) rather than raw luminance. The
    1/1024-quantized basis is hardcoded in both engines
    (MM.DCT_BASIS_Q / the oracle's literal Kronecker weight table), so
    every coefficient, the median, and every bit are exact int64
    cross-engine — the whole chain from md5 payload to Hamming
    distance is hash-verified.

    Shape: identical to the aHash query — one Arrow mapInPandas
    signature pass (32x32 stub decode -> 4x4 block sums -> numpy
    B.P.Bt per image, batch-columnar), 4 x 16-bit bands, pigeonhole
    candidate join for Hamming <= 3 (lossless up to the documented
    PHASH_BUCKET_CAP hot-bucket drop, mirrored in the oracle),
    bit_count(xor) verify on candidates only. The re-encoded twins
    (low-nibble noise, pixels unchanged) hash identically and surface
    at Hamming 0 with digest_equal false.

    Round-9 rework closing SCALE.md cliff #7: the old 16-nibble mixed
    channel confined the DCT coefficients to a 16-dim subspace — band
    values skewed and the candidate join went 18.2x super-linear on
    the second decade. The full-entropy decode decorrelates the bits
    (band values ~uniform over 2^16, expected bucket occupancy n/65536
    per band) and the cap bounds any residual hot bucket; decade
    ratios re-measured after the rework (see SCALE.md)."""
    d = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    corpus = MM.with_reencoded_variants(MM.attach_payload(d))
    sig = spill_checkpoint(MM.dct_phash_signatures(corpus))
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(k).alias("band_idx"), F.col(f"b{k}").alias("val")
                )
                for k in range(MM.PHASH_BANDS)
            ])
        ).alias("bv"),
    ).select("doc_id", "bv.band_idx", "bv.val")
    bands = _capped_bands(bands)
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .distinct()
    )
    sa = sig.select(
        F.col("doc_id").alias("da"),
        F.col("digest").alias("ha"),
        *[F.col(f"b{k}").alias(f"a{k}") for k in range(MM.PHASH_BANDS)],
    )
    sb = sig.select(
        F.col("doc_id").alias("db"),
        F.col("digest").alias("hb"),
        *[F.col(f"b{k}").alias(f"bb{k}") for k in range(MM.PHASH_BANDS)],
    )
    hamming = sum(
        F.bit_count(F.expr(f"a{k} ^ bb{k}"))
        for k in range(MM.PHASH_BANDS)
    )
    return (
        cand.join(sa, "da")
        .join(sb, "db")
        .withColumn("hamming", hamming.cast("bigint"))
        .filter(F.col("hamming") <= MM.PHASH_MAX_HAMMING)
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            "hamming",
            (F.col("ha") == F.col("hb")).alias("digest_equal"),
        )
    )
