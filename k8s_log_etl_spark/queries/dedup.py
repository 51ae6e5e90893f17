"""Deduplication operators over the documents/embeddings tables
(§2c charter: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup).

Cross-engine determinism: every hash bottoms out in
functions.xengine.md5_long (md5 hex → 60-bit int, identical in Spark
and DuckDB), universal-hash permutations stay in exact integer
arithmetic, and similarity scores are either exact rationals rounded
identically or integer Hamming distances.

Scale notes (100 TB):
* shingle/posting-list joins cap posting frequency (a shingle shared by
  more than POSTING_CAP docs is dropped on BOTH sides) — the standard
  guard against quadratic hot-key blowup in inverted-index joins;
* MinHash+LSH is the sub-quadratic path: candidates only from equal
  band signatures (one shuffle per band, no cross join);
* SimHash/embedding queries use an all-pairs comparison that is fine at
  fixture scale but documented as the brute baseline — the banded
  variants are the scale path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from k8s_log_etl_spark.functions import xengine as X
from k8s_log_etl_spark.functions.textops import bind, ngram_indices
from k8s_log_etl_spark.plans.registry import register
from k8s_log_etl_spark.tables import (
    ensure_min_parallelism,
    load_table,
    spill_checkpoint,
)

POSTING_CAP = 100          # drop shingles appearing in more docs than this
JACCARD_THRESHOLD = 0.5
NUM_HASHES = 16
BANDS = 4                  # 4 bands x 4 rows
MINHASH_EST_THRESHOLD = 0.5
SIMHASH_BITS = 32
SIMHASH_MAX_HAMMING = 8
COSINE_DUP_THRESHOLD = 0.3  # synthetic embeddings are near-random; real dups would sit >0.9

# Deterministic universal-hash seeds (i-th permutation).
SEEDS = [(2 * i + 3, 7 * i + 1) for i in range(NUM_HASHES)]

# ---------------------------------------------------------------------------
# shared shingle/token CTEs (SQL) and frames (Spark)
# ---------------------------------------------------------------------------

_SHINGLES_CTE = """
words AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
sh AS (SELECT DISTINCT doc_id, (w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]) AS s
       FROM words, unnest(range(greatest(len(w) - 2, 0))) AS t(i))
"""


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct word-trigram shingles per document, exploded to a
    posting list. The tiny-doc scan is repartitioned first: the driver
    parquet is one row-group (one task) and the explode below is the
    expensive part — a no-op at scale."""
    d = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    return d.select("doc_id", F.explode(_shingle_array()).alias("s"))


def _shingle_array(col: str = "text") -> F.Column:
    """Distinct word-trigram shingles as a per-row array — the
    un-exploded form for signature builds that never need a posting
    list (minhash), keeping them entirely map-side."""
    # bind() the split so the per-gram accesses don't re-split the doc
    # (O(words²) otherwise — the round-8 textops.bind finding)
    return bind(
        F.split(F.trim(F.col(col)), r"\s+"),
        lambda w: F.array_distinct(
            F.transform(
                ngram_indices(w, 3),
                lambda i: F.concat_ws(" ", w[i], w[i + 1], w[i + 2]),
            )
        ),
    )


def posting_pairs(sh: DataFrame, cap: int = POSTING_CAP):
    """Grouped-postings candidate generation shared by the inverted-index
    near-dup operators (jaccard / containment / capstone): from an
    exploded (doc_id, s) posting stream, return

      sizes — (doc_id, sz): surviving-shingle count per doc
      pairs — (da, db, c):  candidate pairs (da < db) with co-occurrence
              counts, generated IN-ROW from each shingle's ≤cap doc list

    ONE shuffle of the posting stream does everything: the window count
    over s (spill-safe — hot-key groups go through Spark's external row
    buffer, never an unbounded agg state) drops over-cap shingles, and
    the collect_list reuses the window's hash partitioning (no second
    exchange; every list is provably ≤ cap BEFORE collection). Pair
    candidates then come from a map-side combination expansion of each
    posting list — replacing the former a.s = b.s self-join, which
    re-shuffled and re-sorted the full posting stream twice. The
    per-shingle pair count stays bounded by cap²/2 exactly as before.
    The grouped postings frame is checkpointed once for its two
    consumers (sizes + pair expansion).

    Round-14 (guide §2.3, round-13 verdict #7): the shingle key is
    hashed to an 8-byte md5_long BEFORE the exchange — the one shuffle
    of the posting stream carries (long, long) rows instead of
    (~20-byte string, long), and the window/agg compare longs instead
    of strings (the round-8 prefix_jaccard k-space treatment; at
    synth-sf10 the string sorts there were the spill driver). No
    consumer ever reads the key back out (postings drops it after
    grouping), so the rewrite is output-transparent UNLESS two distinct
    shingles collide in 60 bits — the same probabilistic contract
    prefix_jaccard documents (P ~ n_distinct² · 2⁻⁶⁰ per doc pair;
    expected-nonzero only around ~10¹² distinct shingles), witnessed
    collision-free by the DuckDB hash-match at every tested SF. The
    POSTING_CAP df-filter counts hash groups rather than string groups
    — identical absent collisions, and the cap path is lossy by
    contract anyway."""
    wcap = Window.partitionBy("s")
    postings = (
        sh.select("doc_id", X.md5_long(F.col("s")).alias("s"))
        .withColumn("df_", F.count(F.lit(1)).over(wcap))
        .filter(F.col("df_") <= cap)
        .groupBy("s")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ds"))
        .select("ds")
        .transform(spill_checkpoint)  # data-sized: serialized+spillable
    )
    # sizes is consumed TWICE by every scoring caller (the sa/sb join
    # aliases) and Catalyst re-executes the explode + two-level agg per
    # alias — the r13 operator-metrics block shows the subtree verbatim
    # twice. A LAZY checkpoint computes it once (doc-count-sized — one
    # (doc_id, sz) row per doc, spillable); callers that ignore sizes
    # (edit-distance) never materialize it.
    sizes = (
        postings.select(F.explode("ds").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("sz"))
        .transform(lambda df: spill_checkpoint(df, eager=False))
    )
    ds = F.col("ds")
    pair_structs = F.flatten(
        F.transform(
            ds,
            lambda x, i: F.transform(
                F.slice(ds, i + F.lit(2), F.size(ds)),
                lambda y: F.struct(x.alias("da"), y.alias("db")),
            ),
        )
    )
    pairs = (
        postings.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.da").alias("da"), F.col("p.db").alias("db"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return sizes, pairs


def _scored_pairs(sizes: DataFrame, pairs: DataFrame, score: F.Column):
    """Join per-doc sizes onto candidate pairs (NOT hint-broadcast:
    sizes is one row per document — AQE broadcasts it at small scale,
    shuffles it at 100 TB) and attach the similarity score column."""
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        pairs.join(sa, F.col("da") == F.col("sa.doc_id"))
        .join(sb, F.col("db") == F.col("sb.doc_id"))
        .withColumn("_score", score)
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

_EXACT_SQL = """
SELECT md5(array_to_string(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> ''), ' ')) AS text_hash,
       min(doc_id) AS keeper_id,
       count(*) AS n_copies
FROM documents
GROUP BY 1
"""


@register("dedup_exact", oracle=_EXACT_SQL, tags=("dedup",))
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on canonicalized text (lowercase, whitespace
    collapsed): one hash-aggregate keyed on md5(text) — the grouping key
    is the 32-byte digest, not the document, so shuffle width stays
    constant no matter how large documents get."""
    d = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    canon = F.concat_ws(
        " ", F.filter(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda x: x != "")
    )
    return (
        d.select(F.md5(canon).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keeper_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------

_JACCARD_SQL = f"""
WITH {_SHINGLES_CTE},
capped AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= {POSTING_CAP}),
shc AS (SELECT sh.doc_id, sh.s FROM sh JOIN capped USING (s)),
sizes AS (SELECT doc_id, count(*) AS sz FROM shc GROUP BY doc_id),
common AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
           FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
SELECT da AS doc_a, db AS doc_b,
       round(c * 1.0 / (sa.sz + sb.sz - c), 6) AS jaccard
FROM common
JOIN sizes sa ON da = sa.doc_id
JOIN sizes sb ON db = sb.doc_id
WHERE c * 1.0 / (sa.sz + sb.sz - c) >= {JACCARD_THRESHOLD}
"""


@register("dedup_ngram_jaccard", oracle=_JACCARD_SQL, tags=("dedup",))
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-trigram Jaccard near-dup pairs via grouped postings —
    candidates only where shingles collide, never an all-pairs product.
    Posting lists over POSTING_CAP docs are dropped entirely (hot-key
    guard); candidate pairs expand map-side from each shingle's ≤cap
    doc list (see posting_pairs — one shuffle of the posting stream,
    versus the former cap-agg + rejoin + self-join chain)."""
    sizes, pairs = posting_pairs(_shingles(spark, sf_dir))
    jac = F.col("c") / (F.col("sa.sz") + F.col("sb.sz") - F.col("c"))
    return (
        _scored_pairs(sizes, pairs, jac)
        .filter(F.col("_score") >= JACCARD_THRESHOLD)
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            F.round(F.col("_score"), 6).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _mh_sig_frame_sql(sh):
    """(doc_id, mh) MinHash signature frame from an exploded (doc_id, s)
    shingle stream — the 16 min-permutation aggregates emitted as ONE
    parameterized SQL parse (round-14, guide §7.3, the _wp_train
    discipline) instead of ~200 py4j Column builds per call site
    (cProfile: dedup_minhash_lsh paid 3.4k py4j round trips at
    plan-build time). Identical integer expressions — md5_long,
    (h % M31) * a % M31 + b, min() — so signatures are bit-identical;
    codegen CSE still computes the md5 once per row exactly as in the
    Column form."""
    spark = sh.sparkSession
    spark_h = "CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)"
    perm_aggs = ", ".join(
        f"min(({spark_h} % {X.MERSENNE31}) * {a} % {X.MERSENNE31} + {b}) AS mh{i}"
        for i, (a, b) in enumerate(SEEDS)
    )
    arr = ", ".join(f"mh{i}" for i in range(NUM_HASHES))
    return spark.sql(
        f"""
SELECT doc_id, array({arr}) AS mh
FROM (SELECT doc_id, {perm_aggs} FROM {{sh}} GROUP BY doc_id)
""",
        sh=sh,
    )


def _perm_sql(i: int) -> str:
    a, b = SEEDS[i]
    return f"min({X.minhash_perm_sql(X.md5_long_sql('s'), a, b)})"


_SIG_COLS_SQL = ", ".join(f"{_perm_sql(i)} AS mh{i}" for i in range(NUM_HASHES))
_BAND_CASES = " ".join(
    f"WHEN {b} THEN concat_ws('_', {', '.join(f'mh{b * 4 + r}' for r in range(4))})"
    for b in range(BANDS)
)
_EQ_SUM = " + ".join(
    f"(CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END)" for i in range(NUM_HASHES)
)

_MINHASH_SQL = f"""
WITH {_SHINGLES_CTE},
sig AS (SELECT doc_id, {_SIG_COLS_SQL} FROM sh GROUP BY doc_id),
bands AS (SELECT doc_id, b AS band, CASE b {_BAND_CASES} END AS bsig
          FROM sig, unnest(range({BANDS})) AS t(b)),
cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id)
SELECT da AS doc_a, db AS doc_b, est_sim FROM (
  SELECT da, db, round(({_EQ_SUM}) / {NUM_HASHES}.0, 6) AS est_sim
  FROM cand JOIN sig sa ON da = sa.doc_id JOIN sig sb ON db = sb.doc_id
) WHERE est_sim >= {MINHASH_EST_THRESHOLD}
"""


@register("dedup_minhash_lsh", oracle=_MINHASH_SQL, tags=("dedup",), bench=True)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (16 permutations) + LSH banding (4 bands × 4 rows):
    candidate pairs share at least one full band signature, verified by
    the minhash similarity estimate. Sub-quadratic: signatures are one
    groupBy over shingles; candidates one self-join on (band, bsig).
    shingle→minhash→band→bucket-join, cf. SURVEY.md §2c."""
    # Signature build: explode shingles → 16 partial-min aggregates.
    # md5 + the permutation arithmetic run in whole-stage codegen over
    # exploded rows, and the min agg combines MAP-SIDE, so the shuffle
    # carries one 16-long row per doc — scale-safe. (A per-row
    # array_min(transform(...)) variant avoids even that shuffle but
    # measured 5.5x SLOWER at sf0.1: higher-order lambdas evaluate
    # interpreted, outside codegen — md5-per-element in a lambda is the
    # slow path. Keep the hash work in exploded codegen'd rows.)
    sh = _shingles(spark, sf_dir)
    sig = _mh_sig_frame_sql(sh)
    # Materialize the (tiny: one row per doc) signature frame once —
    # the band self-join below would otherwise re-run the whole
    # shingle→minhash pipeline for EACH side. On a cluster this is the
    # deliberate persist of a reused intermediate; measured 4× here.
    sig = sig.transform(spill_checkpoint)
    # Each band row carries the full signature so the candidate join
    # needs no join-back to sig (which would recompute the whole
    # shingle→minhash pipeline two more times — plan reuse, not caching).
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws("_", *[F.col("mh")[b * 4 + r] for r in range(4)]).alias("bsig"),
            )
            for b in range(BANDS)
        ]
    )
    bands = sig.select("doc_id", "mh", F.explode(band_structs).alias("bs")).select(
        "doc_id", "mh", F.col("bs.band").alias("band"), F.col("bs.bsig").alias("bsig")
    )
    a = bands.alias("a")
    b = bands.alias("b")
    # Estimate + threshold BEFORE the pair-dedup distinct (the
    # simhash_banded discipline, guide §2.3): est_sim is a pure
    # function of the pair's signatures, so filter/distinct commute
    # row-wise — the distinct then shuffles only true matches carrying
    # 3 narrow columns instead of every band collision dragging both
    # full 16-long signatures through the exchange.
    # round-13: the signature-match count is unrolled over the fixed
    # NUM_HASHES width (guide §4.1) — zip_with/filter lambdas evaluate
    # interpreted per candidate row; the unrolled integer CASE-sum is
    # the same count inside codegen.
    eq_count = sum(
        F.when(F.get(F.col("a.mh"), i) == F.get(F.col("b.mh"), i), 1).otherwise(0)
        for i in range(NUM_HASHES)
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(eq_count / F.lit(float(NUM_HASHES)), 6).alias("est_sim"),
        )
        .filter(F.col("est_sim") >= MINHASH_EST_THRESHOLD)
        .distinct()
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_BITSUM_SQL = ", ".join(
    f"sum(tf * (CASE WHEN (h >> {bit}) & 1 = 1 THEN 1 ELSE -1 END)) AS b{bit}"
    for bit in range(SIMHASH_BITS)
)
_BITS_TO_INT_SQL = " + ".join(
    f"(CASE WHEN b{bit} > 0 THEN {1 << bit} ELSE 0 END)" for bit in range(SIMHASH_BITS)
)

_SIMHASH_SQL = f"""
WITH toks AS (
  SELECT doc_id, tok, count(*) AS tf FROM (
    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents
  ) GROUP BY doc_id, tok
),
hashed AS (SELECT doc_id, tf, {X.md5_long_sql('tok')} AS h FROM toks),
bitsums AS (SELECT doc_id, {_BITSUM_SQL} FROM hashed GROUP BY doc_id),
sigs AS (SELECT doc_id, {_BITS_TO_INT_SQL} AS simhash FROM bitsums)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
"""


def _simhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 32-bit SimHash signatures in ONE shuffle: explode
    tokens, hash each once in whole-stage codegen, and sum the per-
    OCCURRENCE ±1 bit contributions straight into a 32-column
    groupBy(doc_id) — identical to the oracle's tf-weighted sum over
    distinct tokens (tf × sign ≡ sign summed per occurrence), in
    integers, so no shuffle-order concern. The partial aggregation
    combines map-side, so the exchange carries one 32-long row per doc.
    Round 2 shuffled twice (a needless tf pre-aggregation); a
    zero-shuffle per-row `aggregate` over a hash array was also tried
    and measured 2.6x slower — higher-order lambdas evaluate
    interpreted, outside codegen."""
    d = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    # Round-14 (guide §7.3, the _wp_train discipline): the 32 per-bit
    # sum(CASE...) aggregates and the 32-term bits-to-int chain are ONE
    # parameterized SQL parse instead of ~700 py4j Column builds per
    # call (cProfile: dedup_simhash_banded paid 4.6k py4j round trips,
    # mostly here). Expressions mirror the DataFrame form exactly —
    # integer sums and CASE chains in the same left-associated order —
    # so signatures are bit-identical.
    bitsum_cols = ", ".join(
        f"sum(CASE WHEN (shiftright(h, {bit}) & 1) = 1 THEN 1 ELSE -1 END) AS b{bit}"
        for bit in range(SIMHASH_BITS)
    )
    bits_to_int = " + ".join(
        f"(CASE WHEN b{bit} > 0 THEN {1 << bit} ELSE 0 END)"
        for bit in range(SIMHASH_BITS)
    )
    return spark.sql(
        f"""
SELECT doc_id, {bits_to_int} AS simhash
FROM (
  SELECT doc_id, {bitsum_cols}
  FROM (
    SELECT doc_id,
           CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT) AS h
    FROM (SELECT doc_id, explode(split(trim(text), '\\\\s+')) AS tok FROM {{d}})
  )
  GROUP BY doc_id
)
""",
        d=d,
    )


#: Fail-fast gate for the two brute all-pairs BASELINES kept as
#: oracle-checked references (round-12 verdict: their docstrings label
#: them honestly, but nothing MECHANICALLY stopped a 100x caller from
#: pointing the O(n²) theta-join at a corpus it can't survive — the
#: POSTING_CAP discipline applied to the all-pairs pair). 100k rows ≈
#: 5e9 candidate pairs, already far beyond any sane baseline run; the
#: banded/LSH scale paths have no such cap because they never
#: enumerate all pairs.
BRUTE_BASELINE_MAX_ROWS = 100_000


def _refuse_brute_scale(df: DataFrame, name: str, scale_path: str) -> DataFrame:
    """Count the input and refuse the brute baseline above the cap,
    pointing at the sub-quadratic sibling. One extra count job per
    invocation — noise for a baseline, and the fail-fast is the whole
    point."""
    n = df.count()
    if n > BRUTE_BASELINE_MAX_ROWS:
        raise ValueError(
            f"{name} is the brute O(n^2) all-pairs BASELINE and refuses "
            f"{n} input rows (> {BRUTE_BASELINE_MAX_ROWS}): ~{n*(n-1)//2} "
            f"candidate pairs. Use {scale_path} at this scale — it is "
            f"the sub-quadratic path with equivalent semantics."
        )
    return df


@register("dedup_simhash", oracle=_SIMHASH_SQL, tags=("dedup", "brute_baseline"))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (32-bit, tf-weighted token hashes): near-dup pairs with
    Hamming distance ≤ 8. The signature build is map-side only (see
    _simhash_sigs); the pair scan here is the brute O(n²) baseline kept
    as an oracle-checked reference only — dedup_simhash_banded is the
    sub-quadratic scale path and the one bench.py times. Refuses
    corpora above BRUTE_BASELINE_MAX_ROWS (fail-fast misuse guard)."""
    sigs = _refuse_brute_scale(
        _simhash_sigs(spark, sf_dir).transform(spill_checkpoint),
        "dedup_simhash",
        "dedup_simhash_banded",
    )
    a = sigs.alias("a")
    b = sigs.alias("b")
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(hamming <= SIMHASH_MAX_HAMMING)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

_COS_DUP_SQL = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({X.cosine_sql('a.embedding', 'b.embedding')}, 6) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {X.cosine_sql('a.embedding', 'b.embedding')} >= {COSINE_DUP_THRESHOLD}
"""


@register(
    "dedup_embedding_cosine",
    oracle=_COS_DUP_SQL,
    tags=("dedup", "brute_baseline"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (brute all-pairs baseline; the
    hyperplane-LSH bucketing in queries/similarity.py is the scale
    path — see dedup_embedding_lsh). Dot products are sequential double
    sums — bit-identical to the oracle's list_reduce. Refuses corpora
    above BRUTE_BASELINE_MAX_ROWS (fail-fast misuse guard)."""
    from k8s_log_etl_spark.queries.similarity import load_vectors
    e = _refuse_brute_scale(
        load_vectors(spark, sf_dir),
        "dedup_embedding_cosine",
        "dedup_embedding_lsh",
    )
    a = e.alias("a")
    b = e.alias("b")
    cos = X.cosine_fixed("a.embedding", "b.embedding", EMB_DIM)
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .filter(cos >= COSINE_DUP_THRESHOLD)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cos, 6).alias("cos_sim"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash with exact chunk banding (the sub-quadratic scale path)
# ---------------------------------------------------------------------------

SIMHASH_BANDED_MAX_HAMMING = 3
SIMHASH_CHUNKS = 4  # 4 chunks x 8 bits over the 32-bit signature

_SIMHASH_SIGS_CTE = _SIMHASH_SQL.split("SELECT a.doc_id")[0]

_SIMHASH_BANDED_SQL = f"""{_SIMHASH_SIGS_CTE}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_BANDED_MAX_HAMMING}
"""


@register("dedup_simhash_banded", oracle=_SIMHASH_BANDED_SQL, tags=("dedup",), bench=True)
def dedup_simhash_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-quadratic SimHash: the 32-bit signature splits into 4 8-bit
    chunks; by pigeonhole any pair within Hamming distance 3 (< chunk
    count) shares at least one EXACT chunk, so an equi-join on
    (chunk_idx, chunk_value) generates a complete candidate set — the
    verify step then filters to distance <= 3. Provably identical
    results to the brute all-pairs oracle, but the join is keyed, not a
    cross product. (The brute variant `dedup_simhash` keeps the looser
    distance-8 threshold banding cannot serve exactly.) Signature build
    is map-side only (_simhash_sigs); the chunk equi-join is the one
    shuffle."""
    sigs = _simhash_sigs(spark, sf_dir).transform(spill_checkpoint)
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftright("simhash", 8 * i).bitwiseAND(0xFF).alias("cv"),
                    )
                    for i in range(SIMHASH_CHUNKS)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "simhash", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))
    a = chunks.alias("a")
    b = chunks.alias("b")
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        # Round-13 (guide §2.3): verify BEFORE the dedup exchange. A
        # candidate pair sharing an 8-bit chunk usually fails the
        # Hamming gate, and the filter is deterministic per row, so
        # filter→distinct ≡ distinct→filter — the distinct then
        # shuffles only true matches (3 narrow columns) instead of
        # every candidate with both raw signatures.
        .filter(hamming <= SIMHASH_BANDED_MAX_HAMMING)
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# embedding near-dup via hyperplane-LSH buckets (the scale path)
# ---------------------------------------------------------------------------

from k8s_log_etl_spark.queries.similarity import (  # noqa: E402
    DIM as EMB_DIM,
    _bucket_spark,
    _bucket_sql,
)

_COS_LSH_SQL = f"""
WITH buck AS (
  SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({X.cosine_sql('a.embedding', 'b.embedding')}, 6) AS cos_sim
FROM buck a JOIN buck b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {X.cosine_sql('a.embedding', 'b.embedding')} >= {COSINE_DUP_THRESHOLD}
"""


@register("dedup_embedding_lsh", oracle=_COS_LSH_SQL, tags=("dedup",))
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup through random-hyperplane LSH buckets: the
    candidate pair join is keyed on the 8-plane sign bucket instead of
    the brute all-pairs cross product (`dedup_embedding_cosine`, kept as
    the oracle-checkable baseline). Same 256-bucket quantizer as
    knn_lsh_hyperplane; recall for true near-dups is high because
    near-identical vectors land in the same bucket unless a plane
    splits them. Sub-quadratic: |pairs| bounded per bucket."""
    from k8s_log_etl_spark.queries.similarity import load_vectors
    e = load_vectors(spark, sf_dir)
    buck = e.select("vec_id", "embedding", _bucket_spark("embedding").alias("bucket"))
    a = buck.alias("a")
    b = buck.alias("b")
    cos = X.cosine_fixed("a.embedding", "b.embedding", EMB_DIM)
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= COSINE_DUP_THRESHOLD)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cos, 6).alias("cos_sim"),
        )
    )


# ---------------------------------------------------------------------------
# minhash estimator quality (est vs exact Jaccard on LSH candidates)
# ---------------------------------------------------------------------------

_MH_QUALITY_SQL = f"""
WITH {_SHINGLES_CTE},
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
sig AS (SELECT doc_id, {_SIG_COLS_SQL} FROM sh GROUP BY doc_id),
bands AS (SELECT doc_id, b AS band, CASE b {_BAND_CASES} END AS bsig
          FROM sig, unnest(range({BANDS})) AS t(b)),
cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
common AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
SELECT doc_a, doc_b, est_sim, exact_jaccard,
       round(abs(est_sim_raw - exact_raw), 6) AS abs_err
FROM (
  SELECT cand.da AS doc_a, cand.db AS doc_b,
         round(({_EQ_SUM}) / {NUM_HASHES}.0, 6) AS est_sim,
         ({_EQ_SUM}) / {NUM_HASHES}.0 AS est_sim_raw,
         round(coalesce(c, 0) * 1.0 / (sza.sz + szb.sz - coalesce(c, 0)), 6)
           AS exact_jaccard,
         coalesce(c, 0) * 1.0 / (sza.sz + szb.sz - coalesce(c, 0)) AS exact_raw
  FROM cand
  JOIN sig sa ON cand.da = sa.doc_id
  JOIN sig sb ON cand.db = sb.doc_id
  JOIN sizes sza ON cand.da = sza.doc_id
  JOIN sizes szb ON cand.db = szb.doc_id
  LEFT JOIN common ON cand.da = common.da AND cand.db = common.db
)
"""


@register("minhash_estimate_quality", oracle=_MH_QUALITY_SQL, tags=("dedup", "eval"))
def minhash_estimate_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator-quality evaluation for the minhash sketch — the dedup
    analogue of ann_recall_eval: for every banded-LSH candidate pair,
    the 16-permutation minhash similarity estimate next to the EXACT
    trigram Jaccard and the absolute error. This is the number that
    justifies (or indicts) trusting the sketch at 100 TB, where the
    exact answer is unaffordable corpus-wide but affordable on the
    sketch's own candidate set.

    Scale shape: signatures and shingle sets are both one map-side
    pass + one keyed agg; candidates come from the (band, bsig)
    equi-join exactly as dedup_minhash_lsh; the exact Jaccard is then
    computed ONLY for candidate pairs via per-doc shingle-set arrays
    (array_intersect on two ≤doc-length arrays, map-side after two
    keyed joins) — never a corpus-wide posting self-join. est and
    exact are integer-ratio doubles, bit-identical across engines."""
    d = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    sh = _shingles(spark, sf_dir)
    sig = _mh_sig_frame_sql(sh)
    sig = sig.transform(spill_checkpoint)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "_", *[F.col("mh")[b * (NUM_HASHES // BANDS) + r].cast("string")
                           for r in range(NUM_HASHES // BANDS)]
                ).alias("bsig"),
            )
            for b in range(BANDS)
        ]
    )
    bands = sig.select("doc_id", "mh", F.explode(band_structs).alias("bs")).select(
        "doc_id", "mh", F.col("bs.band").alias("band"), F.col("bs.bsig").alias("bsig")
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.mh").alias("mh_a"),
            F.col("b.mh").alias("mh_b"),
        )
        .distinct()
    )
    sets = d.select("doc_id", _shingle_array().alias("sset"))
    sa, sb = sets.alias("sa"), sets.alias("sb")
    # unrolled fixed-width match count (see dedup_minhash_lsh) — same
    # integer sum, codegen instead of an interpreted fold
    est_raw = sum(
        F.when(F.get(F.col("mh_a"), i) == F.get(F.col("mh_b"), i), 1).otherwise(0)
        for i in range(NUM_HASHES)
    ) / F.lit(float(NUM_HASHES))
    inter = F.size(F.array_intersect("sa.sset", "sb.sset"))
    union = F.size("sa.sset") + F.size("sb.sset") - inter
    exact_raw = inter * F.lit(1.0) / union
    return (
        cand.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(est_raw, 6).alias("est_sim"),
            F.round(exact_raw, 6).alias("exact_jaccard"),
            F.round(F.abs(est_raw - exact_raw), 6).alias("abs_err"),
        )
    )


# ---------------------------------------------------------------------------
# semantic dedup via trained coarse cells (SemDeDup architecture)
# ---------------------------------------------------------------------------

SEMANTIC_DUP_THRESHOLD = 0.25


def _semantic_cells_sql() -> str:
    from k8s_log_etl_spark.queries.similarity import KMEANS_ITERS, _kmeans_sql_parts

    final = f"a{KMEANS_ITERS}"
    return f"""
WITH {', '.join(_kmeans_sql_parts())}
SELECT a.k AS cell, a.vec_id AS keep_id, b.vec_id AS dup_id,
       round({X.cosine_sql('a.embedding', 'b.embedding')}, 6) AS cos_sim
FROM {final} a JOIN {final} b ON a.k = b.k AND a.vec_id < b.vec_id
WHERE {X.cosine_sql('a.embedding', 'b.embedding')} >= {SEMANTIC_DUP_THRESHOLD}
"""


@register("dedup_semantic_cells", oracle=_semantic_cells_sql(), tags=("dedup", "similarity"), refuses_empty=True)
def dedup_semantic_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic deduplication, SemDeDup-style (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings with the trained k-means
    coarse quantizer (the same deterministic Lloyd's loop as
    kmeans_ivf_train, so the cells are the hash-verified ones), then
    compare pairs ONLY within a cell and flag pairs above the cosine
    threshold — near-semantic duplicates a lexical dedup (minhash /
    simhash) cannot see. Keeps the lower vec_id per pair (the paper
    keeps the point farthest from the centroid; the choice is policy,
    the architecture is the cells).

    Scale shape: the within-cell self-join shuffles once on cell id and
    is quadratic only WITHIN a cell — the whole point of SemDeDup is
    that K grows with N (K ≈ N/1000 in the paper) so per-cell cost is
    bounded and constant while cross-cell pairs (the overwhelming
    majority) are never formed. Here K=4 over the test table; the
    trainer's K·dim-per-round driver sync is the only non-map-side
    cost. Cosines are sequential double folds, bit-identical to the
    oracle's unrolled-Lloyd's CTE chain."""
    from k8s_log_etl_spark.queries.similarity import _kmeans_train

    from k8s_log_etl_spark.queries.similarity import load_vectors
    e = load_vectors(spark, sf_dir)
    _, assigned = _kmeans_train(e)
    cells = assigned.select("vec_id", "embedding", "k")
    a = cells.alias("a")
    b = cells.alias("b")
    cos = X.cosine_fixed("a.embedding", "b.embedding", EMB_DIM)
    return (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k")) & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= SEMANTIC_DUP_THRESHOLD)
        .select(
            F.col("a.k").alias("cell"),
            F.col("a.vec_id").alias("keep_id"),
            F.col("b.vec_id").alias("dup_id"),
            F.round(cos, 6).alias("cos_sim"),
        )
    )


# ---------------------------------------------------------------------------
# connected components over near-dup pairs (cluster resolution)
# ---------------------------------------------------------------------------

_CC_SQL = f"""
WITH RECURSIVE
pairs AS (
  SELECT doc_a, doc_b FROM ({_SIMHASH_BANDED_SQL.strip()})
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(node, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
)
SELECT cluster, CAST(count(*) AS BIGINT) AS n_docs,
       min(node) AS keeper_id, max(node) AS max_doc
FROM (SELECT node, min(lbl) AS cluster FROM reach GROUP BY node)
GROUP BY cluster
"""


def cc_min_label_propagation(pairs: DataFrame) -> DataFrame:
    """Connected components by iterative min-label propagation over a
    (doc_a, doc_b) pair frame — each round every node adopts the
    smallest label among itself and its neighbors; fixpoint in
    O(component DIAMETER) rounds. Kept as the reference implementation
    the star algorithm is equivalence-tested against. Returns
    (node, lbl)."""
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).toDF("src", "dst").transform(spill_checkpoint)

    labels = (
        edges.select(F.col("src").alias("node")).distinct()
        .withColumn("lbl", F.col("node"))
        .transform(spill_checkpoint)
    )
    while True:
        neighbor_min = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node2"))
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.node2, "left")
            .select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))
                ).alias("lbl"),
            )
            .transform(spill_checkpoint)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def cc_star(pairs: DataFrame) -> DataFrame:
    """Connected components by alternating large-star / small-star
    rounds (Kiveris et al., "Connected Components in MapReduce and
    Beyond", public algorithm): every round each node re-links its
    larger neighbors (large-star) / smaller neighbors (small-star)
    directly to the minimum of its neighborhood, collapsing chains to
    stars — convergence in O(log n) rounds independent of component
    DIAMETER, where plain label propagation needs diameter rounds.
    Per-round cost: two keyed min-aggregates + broadcast-or-shuffle
    joins, each checkpointed to truncate lineage. Returns (node, lbl)
    with lbl = component minimum — verified equivalent to
    cc_min_label_propagation (tests/test_scale_patterns.py)."""
    # Checkpoint the raw pair frame FIRST so the (potentially
    # expensive) pair-generating pipeline runs exactly once; nodes
    # derive from it BEFORE the self-loop filter, so a node appearing
    # only in self-pairs (doc_a == doc_b) still gets a (node, node)
    # label via the roots union below — no reliance on generators
    # emitting doc_a < doc_b. The working edge set is the cheap
    # narrow filter over the materialized frame. Round 3's layout
    # checkpointed nodes and e independently off `pairs`, executing
    # the whole upstream near-dup pipeline twice.
    e0 = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .distinct()
        .transform(spill_checkpoint)
    )
    # nodes has exactly ONE consumer (the roots anti-join after the
    # loop) and derives from the already-checkpointed e0 — round-13
    # optimization drops its former eager checkpoint (one job + one
    # materialization per call for a frame read once).
    nodes = (
        e0.select(F.col("u").alias("node"))
        .union(e0.select(F.col("v").alias("node")))
        .distinct()
    )
    e = e0.filter(F.col("u") != F.col("v"))

    # Round-13 convergence rework (guide §1/§2 — the head was
    # fixed-overhead-bound at sf0.1: 86 tiny jobs, driver gap ~44% of
    # wall). The old loop detected the FIXPOINT (small == e via count
    # compare + exceptAll), which inherently costs one extra full
    # no-change round plus per-round count jobs. This loop instead
    # tests the converged STATE directly: after any round every edge
    # has u > v strictly (small-star emits (x, m) with m = min of a
    # set of values all below x), so
    #   e is the limit  ⇔  e is a min-rooted star forest
    #                   ⇔  u > v on every edge AND no v-side node
    #                      appears on the u-side.
    # (⇐: in such a forest each star's center is its component min;
    # large-star and small-star are both the identity on it — checked
    # per neighborhood: the center's min is itself, a leaf's min is
    # its center — so the state is the fixpoint the old loop returned.
    # ⇒: a u>v chain x > y = u' > v' makes large-star rewire x toward
    # min(Γ(y)) < y, changing the set.) One semi-join action per
    # round replaces count + exceptAll AND fires one round earlier
    # (on the round that PRODUCES the forest, not the one that
    # re-proves it); its job doubles as the lazy checkpoint's
    # materializer. The u <= v branch exists for the FIRST test only:
    # e0 arrives oriented u < v, which is star-shaped but wrongly
    # oriented for labels — it must never short-circuit the loop.
    def _is_min_star_forest(edges: DataFrame) -> bool:
        # Round-14 (guide §2.3): the former u<=v filter ∪ self
        # SEMI-JOIN (sa.v == sb.u) exchanged the edge set TWICE per
        # test; this single flag aggregation exchanges once, and
        # map-side partial max shrinks the 2|E| node stream to ~|V|
        # rows before the wire. Same predicate exactly: a violation is
        # an edge with u <= v, or a node on BOTH sides.
        flags = edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("u").alias("node"),
                        F.lit(1).alias("us"),
                        F.lit(0).alias("vs"),
                        (F.col("u") <= F.col("v")).cast("int").alias("bad"),
                    ),
                    F.struct(
                        F.col("v").alias("node"),
                        F.lit(0).alias("us"),
                        F.lit(1).alias("vs"),
                        F.lit(0).alias("bad"),
                    ),
                )
            ).alias("f")
        ).select("f.*")
        viol = (
            flags.groupBy("node")
            .agg(
                F.max("us").alias("us"),
                F.max("vs").alias("vs"),
                F.max("bad").alias("bad"),
            )
            .filter((F.col("bad") == 1) | ((F.col("us") == 1) & (F.col("vs") == 1)))
        )
        return viol.isEmpty()

    # Round-13 (guide §2.4): each star round used to compute the
    # per-neighborhood min as a groupBy + join-back — one agg shuffle
    # plus a join whose build side is NODE-sized (broadcastable only at
    # toy scale; at 100 TB that join is a second full shuffle). A
    # window min over the SAME partition key folds both into the one
    # exchange the round already pays, and the join disappears — per
    # round this removes 2 aggregate shuffles and 2 join builds
    # (66 → ~40 jobs at sf0.1). Duplicate (u, m) emits from the
    # per-row small-star rewrite are collapsed by the round's existing
    # distinct, so the edge SET per round is unchanged.
    wlu = Window.partitionBy("u")
    # Round-13: the FIRST state test can never pass on a nonempty
    # generator pair set (pairs arrive oriented u < v, the exact
    # opposite of the forest invariant u > v), so run round 1
    # unconditionally — one action saved per call. On the two inputs
    # where the old first test could pass (empty e; an adversarial
    # already-converged u > v forest) the extra round is the identity
    # (large-star and small-star are both identity on a min-star
    # forest, and a round over an empty frame is empty), so the
    # returned labels are unchanged.
    first_round = True
    while first_round or not _is_min_star_forest(e):
        first_round = False
        # LARGE-STAR: for each node u over its full neighborhood Γ(u),
        # m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u), v > u.
        # Duplicate emits are harmless mid-round (min is duplicate-
        # insensitive) and the small-star distinct below re-establishes
        # the deduplicated invariant.
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        lbase = sym.withColumn(
            "m", F.least(F.min("v").over(wlu), F.col("u"))
        )
        large = (
            lbase.filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        # SMALL-STAR: orient each edge (larger, smaller); per larger
        # node u with smaller neighbors N, m = min(N); emit (v, m) for
        # v ∈ N \ {m} plus (u, m) — the latter once per row here, the
        # duplicates vanish in the distinct.
        oriented = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        sbase = oriented.withColumn("m", F.min("v").over(wlu))
        # Round-14 (guide §2.3): the (u, m) center edge used to be
        # emitted once PER ROW of sbase (k copies for a k-neighborhood,
        # all collapsed by the distinct); m = min(N) is attained by
        # some row (v == m), so emitting it from exactly that row
        # yields the identical pre-distinct SET with ~half the rows
        # entering the distinct exchange.
        small = (
            sbase.filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(
                sbase.filter(F.col("v") == F.col("m")).select(
                    "u", F.col("m").alias("v")
                )
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .transform(lambda df: spill_checkpoint(df, eager=False))
        )
        e = small
    # e is now a star forest: (node, component-min) for every non-root;
    # roots (component minima, and isolated nodes if any) label themselves.
    roots = nodes.join(e.select(F.col("u").alias("node")), "node", "left_anti")
    return e.select(F.col("u").alias("node"), F.col("v").alias("lbl")).union(
        roots.select("node", F.col("node").alias("lbl"))
    )


@register("dedup_cluster_components", oracle=_CC_SQL, tags=("dedup",))
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster resolution over the banded-SimHash near-dup pairs:
    connected components via alternating large-star/small-star rounds
    (O(log n) rounds — component depth, not diameter, bounds the
    iteration count; see cc_star). Per cluster: size, keeper (min
    doc_id), max doc.

    This is the engine's iterative-algorithm surface: a driver loop
    over DataFrame joins with a localCheckpoint per round (truncating
    lineage — without it the plan doubles every iteration) and a
    scalar convergence check per round (the unavoidable sync point of
    any fixpoint algorithm). The simpler min-label-propagation variant
    is kept as cc_min_label_propagation and equivalence-tested. Oracle:
    recursive-CTE transitive closure (UNION-dedup guarantees
    termination)."""
    pairs = dedup_simhash_banded(spark, sf_dir).select("doc_a", "doc_b")
    labels = cc_star(pairs)
    return labels.groupBy(F.col("lbl").alias("cluster")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("node").alias("keeper_id"),
        F.max("node").alias("max_doc"),
    )


_KEEP_BEST_SQL = f"""
WITH RECURSIVE
pairs AS (
  SELECT doc_a, doc_b FROM ({_SIMHASH_BANDED_SQL.strip()})
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(node, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
),
lbl AS (SELECT node, min(lbl) AS cluster FROM reach GROUP BY node),
scored AS (
  SELECT l.cluster, l.node, d.n_chars,
         row_number() OVER (
           PARTITION BY l.cluster ORDER BY d.n_chars DESC, l.node
         ) AS rn
  FROM lbl l JOIN documents d ON d.doc_id = l.node
)
SELECT s.cluster, c.n_docs, s.node AS keeper_id, s.n_chars AS keeper_n_chars
FROM scored s
JOIN (SELECT cluster, count(*) AS n_docs FROM lbl GROUP BY cluster) c
  ON s.cluster = c.cluster
WHERE s.rn = 1
"""


@register("dedup_keep_best", oracle=_KEEP_BEST_SQL, tags=("dedup", "llmprep"))
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware duplicate resolution — the curation POLICY layer
    on top of cluster detection: within each near-dup cluster
    (banded-SimHash pairs → large-star/small-star components, the
    dedup_cluster_components lineage), keep the LONGEST member
    (n_chars, ties to the lowest doc_id) rather than the arbitrary
    min-id — the 'keep the most complete version' rule real corpus
    pipelines apply, since near-dups are usually truncations or
    boilerplate-wrapped copies of one underlying text. One row per
    cluster: size, keeper, keeper length.

    Scale shape: inherits the component algorithm's O(log n) rounds;
    the policy itself adds one keyed join onto the (node, cluster)
    label frame (narrow — two longs per doc in any cluster) and a
    per-cluster WindowGroupLimit (rn = 1 prunes to one row per cluster
    per partition before the shuffle). Swapping the policy column
    (model-based quality, recency, source priority) changes only the
    ORDER BY."""
    d = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    pairs = dedup_simhash_banded(spark, sf_dir).select("doc_a", "doc_b")
    labels = cc_star(pairs)
    sizes = labels.groupBy(F.col("lbl").alias("cluster")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = Window.partitionBy("cluster").orderBy(F.desc("n_chars"), F.asc("node"))
    best = (
        labels.join(d.select(F.col("doc_id").alias("node"), "n_chars"), "node")
        .select(F.col("lbl").alias("cluster"), "node", "n_chars")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return best.join(sizes, "cluster").select(
        "cluster",
        "n_docs",
        F.col("node").alias("keeper_id"),
        F.col("n_chars").alias("keeper_n_chars"),
    )


# ---------------------------------------------------------------------------
# n-gram containment (asymmetric near-dup: sub-document duplication)
# ---------------------------------------------------------------------------

CONTAINMENT_THRESHOLD = 0.8

_CONTAINMENT_SQL = f"""
WITH {_SHINGLES_CTE},
capped AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= {POSTING_CAP}),
shc AS (SELECT sh.doc_id, sh.s FROM sh JOIN capped USING (s)),
sizes AS (SELECT doc_id, count(*) AS sz FROM shc GROUP BY doc_id),
common AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
           FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
SELECT da AS doc_a, db AS doc_b,
       round(c * 1.0 / least(sa.sz, sb.sz), 6) AS containment
FROM common
JOIN sizes sa ON da = sa.doc_id
JOIN sizes sb ON db = sb.doc_id
WHERE c * 1.0 / least(sa.sz, sb.sz) >= {CONTAINMENT_THRESHOLD}
"""


@register("dedup_containment", oracle=_CONTAINMENT_SQL, tags=("dedup",))
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric n-gram containment C(A,B) = |A∩B| / min(|A|,|B|):
    catches sub-document duplication (a short doc wholly embedded in a
    longer one) that symmetric Jaccard misses, because the union in
    Jaccard's denominator dilutes the score when sizes differ. Same
    grouped-postings candidate generation + POSTING_CAP hot-shingle
    guard as dedup_ngram_jaccard (posting_pairs) — candidates only
    where shingles collide, pair count per shingle provably bounded —
    only the scoring denominator changes, so the scale story is
    identical."""
    sizes, pairs = posting_pairs(_shingles(spark, sf_dir))
    cont = F.col("c") / F.least(F.col("sa.sz"), F.col("sb.sz"))
    return (
        _scored_pairs(sizes, pairs, cont)
        .filter(F.col("_score") >= CONTAINMENT_THRESHOLD)
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            F.round(F.col("_score"), 6).alias("containment"),
        )
    )


# ---------------------------------------------------------------------------
# edit-distance verification of near-dup candidates (fuzzy dedup)
# ---------------------------------------------------------------------------

EDIT_MIN_COMMON = 10   # candidate gate: >= this many shared trigrams
EDIT_MAX_DIST = 20     # verified near-dup: Levenshtein <= this

_EDIT_SQL = f"""
WITH {_SHINGLES_CTE},
capped AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= {POSTING_CAP}),
shc AS (SELECT sh.doc_id, sh.s FROM sh JOIN capped USING (s)),
common AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
           FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2 HAVING count(*) >= {EDIT_MIN_COMMON})
SELECT da AS doc_a, db AS doc_b,
       levenshtein(x.text, y.text) AS edit_dist
FROM common
JOIN documents x ON da = x.doc_id
JOIN documents y ON db = y.doc_id
WHERE levenshtein(x.text, y.text) <= {EDIT_MAX_DIST}
"""


@register("dedup_edit_distance", oracle=_EDIT_SQL, tags=("dedup",))
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-dedup verification: exact Levenshtein distance over the
    inverted-index CANDIDATE pairs only (≥ EDIT_MIN_COMMON shared
    trigrams via posting_pairs), confirming near-dups at ≤
    EDIT_MAX_DIST edits. The O(len²)-per-pair distance never touches
    the full corpus cross product — the candidate gate bounds it to the
    pairs the cheap index already flagged, which is the only way an
    edit-distance verify survives 100 TB. Distances are exact integers
    (unit-cost Levenshtein, identical in Spark and DuckDB)."""
    d = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    _, pairs = posting_pairs(_shingles(spark, sf_dir))
    cand = pairs.filter(F.col("c") >= EDIT_MIN_COMMON)
    x = d.select(F.col("doc_id").alias("da"), F.col("text").alias("ta"))
    y = d.select(F.col("doc_id").alias("db"), F.col("text").alias("tb"))
    dist = F.levenshtein(F.col("ta"), F.col("tb"))
    return (
        cand.join(x, "da")
        .join(y, "db")
        .filter(dist <= EDIT_MAX_DIST)
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            dist.alias("edit_dist"),
        )
    )


# ---------------------------------------------------------------------------
# cross-document duplicated passages (suffix-style substring dedup)
# ---------------------------------------------------------------------------

SPAN_NGRAM = 5   # passage granularity: a duplicated run of 5-word grams

_SPAN_GRAM_SQL = (
    "(w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5])"
)

_SUBSTRING_SPANS_SQL = f"""
WITH words AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
),
occ AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos, {_SPAN_GRAM_SQL} AS g
  FROM words, unnest(range(greatest(len(w) - {SPAN_NGRAM - 1}, 0))) AS t(i)
),
dup AS (
  SELECT g FROM occ GROUP BY g HAVING min(doc_id) <> max(doc_id)
),
pos AS (
  SELECT doc_id, pos FROM occ WHERE g IN (SELECT g FROM dup)
),
isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM pos
)
SELECT doc_id,
       min(pos) AS span_start,
       max(pos) + {SPAN_NGRAM - 1} AS span_end_word,
       count(*) AS n_grams
FROM isl GROUP BY doc_id, grp
"""


@register(
    "dedup_substring_spans",
    oracle=_SUBSTRING_SPANS_SQL,
    tags=("dedup", "llmprep"),
    bench=True,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated PASSAGES — the substring-level dedup of
    Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
    Better"), re-expressed relationally: a word 5-gram occurring in two
    or more DISTINCT documents marks its positions duplicated, and
    consecutive duplicated positions within a document merge into one
    maximal span (first gram position, last covered word index, gram
    count). Where the paper builds a suffix array, the same verbatim
    cross-doc repeats fall out of an exact gram-identity group-by —
    every repeated substring of >= SPAN_NGRAM words is a run of
    repeated 5-grams. Complements dedup_ngram_jaccard (whole-doc
    near-dup) and contamination_spans (corpus-vs-benchmark): this one
    finds WHERE the corpus repeats itself, the span-excision shape
    production pipelines apply to boilerplate and mirrored text.

    Scale shape: (doc_id, pos, gram) explode is linear map-side work.
    Duplicated grams come from a hash-agg on the gram string with
    partial map-side combine (min/max doc_id — a gram spans >= 2 docs
    iff min <> max; no countDistinct expand, and hot boilerplate grams
    partial-aggregate instead of skewing a window sort). The
    occurrence stream then equi-joins the dup set on the gram string —
    no broadcast HINT (the dup side is unbounded at scale; Catalyst's
    size stats pick broadcast at fixture scale and a shuffle join with
    AQE skew-split at 100 TB). Grams join by full STRING, not a 64-bit
    hash: a hash
    collision would silently fuse two spans and diverge from the
    oracle (same exactness call as training_mix_pipeline, documented
    in PLANS.md). Islands then run per doc over duplicated positions
    only (bounded by hits, not doc length)."""
    d = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    grams = bind(
        F.split(F.trim(F.col("text")), r"\s+"),
        lambda w: F.transform(
            ngram_indices(w, SPAN_NGRAM),
            lambda i: F.concat_ws(" ", *[w[i + j] for j in range(SPAN_NGRAM)]),
        ),
    )
    # The occurrence stream feeds TWO consumers (the dup-gram agg and
    # the probe side of the semi-join); without a checkpoint Catalyst
    # re-derives the split+5-gram explode — the dominant map cost —
    # once per consumer (same multi-consumer pathology fixed in
    # corpus_clean_pipeline / training_mix_pipeline; measured 13.8 s →
    # 8.0 s at synthetic sf1). On a cluster this materialization is a
    # persisted/staged intermediate instead.
    occ = (
        d.select("doc_id", F.posexplode(grams).alias("pos", "g"))
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "g")
        .transform(lambda _d: spill_checkpoint(_d, eager=False))
    )
    dup = (
        occ.groupBy("g")
        .agg(F.min("doc_id").alias("d_min"), F.max("doc_id").alias("d_max"))
        .filter(F.col("d_min") != F.col("d_max"))
        .select("g")
    )
    pos = occ.join(dup, "g", "leftsemi").select("doc_id", "pos")
    grp = F.col("pos") - F.row_number().over(
        Window.partitionBy("doc_id").orderBy("pos")
    )
    return (
        pos.withColumn("grp", grp)
        .groupBy("doc_id", "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(SPAN_NGRAM - 1)).alias("span_end_word"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .drop("grp")
    )


# ---------------------------------------------------------------------------
# span excision: APPLY the detected duplicate passages (cut them out)
# ---------------------------------------------------------------------------

_EXCISE_SQL = f"""
WITH spans_q AS ({_SUBSTRING_SPANS_SQL}),
aw AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
  WHERE doc_id IN (SELECT DISTINCT doc_id FROM spans_q)
),
wpos AS (
  SELECT aw.doc_id, CAST(t.i AS BIGINT) AS idx, w[t.i + 1] AS word
  FROM aw, unnest(range(len(w))) AS t(i)
),
marked AS (
  SELECT p.doc_id, p.idx, p.word,
         EXISTS (SELECT 1 FROM spans_q s
                 WHERE s.doc_id = p.doc_id
                   AND p.idx BETWEEN s.span_start AND s.span_end_word) AS covered
  FROM wpos p
)
SELECT m.doc_id,
       md5(coalesce(string_agg(CASE WHEN NOT covered THEN word END, ' ' ORDER BY idx), '')) AS clean_hash,
       CAST(sum(CASE WHEN covered THEN 1 ELSE 0 END) AS BIGINT) AS n_words_removed,
       ns.n_spans
FROM marked m
JOIN (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans
      FROM spans_q GROUP BY doc_id) ns USING (doc_id)
GROUP BY m.doc_id, ns.n_spans
"""


@register("dedup_excise_spans", oracle=_EXCISE_SQL, tags=("dedup", "llmprep"))
def dedup_excise_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY step for substring-level dedup (round-4 verdict #3):
    cut the duplicated passages dedup_substring_spans detects out of
    each affected document — keep everything outside the spans, the
    way Lee et al. 2021's pipeline rewrites rather than drops
    documents (and the detect->apply pair redact_documents already
    models for PII). Output per affected doc: md5 of the cleaned text
    (proves byte-identical rewrites without hauling bodies through the
    compare), words removed, span count.

    Scale shape: operators.spans.excise_spans — spans grouped per doc
    (hit-bounded, small), ONE keyed join onto documents, then a
    map-side indexed-filter rewrite (O(words x spans_in_doc) per doc
    inside a JVM higher-order function, no shuffle after the join).
    The oracle re-derives removal word-by-word with a correlated
    EXISTS over the span table, so span semantics (inclusive ends,
    overlap union) and the reassembled byte stream are both under the
    hash check."""
    from k8s_log_etl_spark.operators.spans import excise_spans

    d = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    spans = dedup_substring_spans(spark, sf_dir)
    out = excise_spans(d, spans)
    return out.select(
        "doc_id",
        F.md5("clean_text").alias("clean_hash"),
        "n_words_removed",
        "n_spans",
    )


# ---------------------------------------------------------------------------
# PPJoin-style prefix filtering: EXACT jaccard join, sub-quadratic
# ---------------------------------------------------------------------------

_PREFIX_JACCARD_SQL = f"""
WITH {_SHINGLES_CTE},
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
common AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
SELECT da AS doc_a, db AS doc_b,
       round(c * 1.0 / (sa.sz + sb.sz - c), 6) AS jaccard
FROM common
JOIN sizes sa ON da = sa.doc_id
JOIN sizes sb ON db = sb.doc_id
WHERE c * 1.0 / (sa.sz + sb.sz - c) >= {JACCARD_THRESHOLD}
"""


@register(
    "dedup_prefix_filter_jaccard",
    oracle=_PREFIX_JACCARD_SQL,
    tags=("dedup",),
    bench=True,
)
def dedup_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT threshold-Jaccard join via prefix filtering (the
    PPJoin/AllPairs family, Xiao et al. 2008 / Bayardo et al. 2007 —
    public literature): order every document's shingles by GLOBAL
    document frequency (rarest first, ties on the shingle string) and
    index only each document's first |x| - ceil(t*|x|) + 1 shingles —
    any pair with J >= t provably shares a token inside BOTH prefixes,
    so the prefix-posting self-join generates a complete candidate set
    and the exact verification loses nothing. Unlike
    dedup_ngram_jaccard's POSTING_CAP (which DROPS hot shingles —
    lossy by contract), prefix filtering is the LOSSLESS sub-quadratic
    path: hot boilerplate shingles sort to the ends of documents and
    fall out of the prefixes naturally, so the oracle is the full
    uncapped self-join and the result is the exact answer.

    Round 6 adds the two remaining LOSSLESS candidate reducers from
    the same literature (round-5 verdict #1), both cheap predicates on
    the posting self-join:
      - LENGTH filter (Arasu et al. 2006 / Bayardo et al. 2007):
        J(x,y) >= t forces t*|y| <= |x| (|x|<=|y|), so any pair with
        min(sz) < t*max(sz) cannot qualify — prune before distinct.
      - POSITIONAL filter (Xiao et al. 2008): both docs order shingles
        by the SAME global rank, so shared tokens appear in the same
        relative order; at a prefix match in positions (i, j) the
        overlap is provably <= min(i,j) + min(|x|-i, |y|-j) (shared-
        before <= min(i-1,j-1), the match, shared-after <= remaining).
        J >= t needs overlap >= ceil(t/(1+t)*(|x|+|y|)) — prune any
        match row whose bound falls short. The bound holds at EVERY
        match, so any-row-passes keeps strictly all true pairs:
        lossless, oracle unchanged (the full uncapped self-join).
    Float guards subtract 1e-9 before ceil/compare — the safe
    direction (can only weaken the filter, never drop a true pair).
    Carrying (rn, sz) into the prefix postings is free (both already
    computed by the ranking window), and keeping (sza, szb) on the
    surviving candidates removes the two post-verify size joins the
    round-5 form paid.

    Scale shape: one shuffle computes global shingle frequencies, one
    window per doc ranks shingles (partitioned on doc_id — per-doc
    state only), the candidate join touches PREFIX postings only
    ((1-t)|x|+1 per doc — at t=0.5, half the posting volume, and the
    hottest tokens excluded) with length+positional pruning applied
    before the distinct, and verification joins full shingle sets for
    CANDIDATE pairs only, keyed on doc id. The candidate ordering
    lives entirely Spark-side — only completeness matters, so no
    cross-engine ordering contract is needed."""
    t = JACCARD_THRESHOLD
    # Round-8 second-decade change: hash shingles to 8-byte md5_long
    # tokens ONCE at the source and run the ENTIRE pipeline in k-space
    # — the round-7 form still shuffled the string shingles through
    # the dfreq join and sorted strings in the ranking window, and at
    # synth-sf10 those string sorts were the spill driver (decade
    # ratio 11.6 vs the ~10 of data growth). Losslessness is
    # unaffected: prefix filtering is complete under ANY consistent
    # global token order (rarest-first is only the candidate-count
    # heuristic), and the verify already counted md5_long matches, so
    # k-space Jaccard is what was returned before. The checkpoint now
    # stores longs instead of ~24-byte strings. Collision contract
    # unchanged (see the verify note below): the DuckDB hash-match at
    # every tested SF witnesses the dataset is collision-free.
    shk = spill_checkpoint(
        _shingles(spark, sf_dir).select(
            "doc_id", X.md5_long(F.col("s")).alias("k")
        )
    )
    dfreq = shk.groupBy("k").agg(F.count(F.lit(1)).alias("df_"))
    wdoc = Window.partitionBy("doc_id").orderBy(F.asc("df_"), F.asc("k"))
    ranked = (
        shk.join(dfreq, "k")
        .withColumn("rn", F.row_number().over(wdoc))
        .withColumn("sz", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
    )
    plen = F.col("sz") - F.ceil(F.lit(t) * F.col("sz")) + 1
    prefix = ranked.filter(F.col("rn") <= plen).select("doc_id", "k", "rn", "sz")
    sza, szb = F.col("pa.sz"), F.col("pb.sz")
    rna, rnb = F.col("pa.rn"), F.col("pb.rn")
    length_ok = F.least(sza, szb) >= F.lit(t) * F.greatest(sza, szb) - F.lit(1e-9)
    alpha = F.ceil(F.lit(t / (1.0 + t)) * (sza + szb) - F.lit(1e-9))
    overlap_ub = F.least(rna, rnb) + F.least(sza - rna, szb - rnb)
    cand = (
        prefix.alias("pa")
        .join(prefix.alias("pb"), "k")
        .filter(F.col("pa.doc_id") < F.col("pb.doc_id"))
        .filter(length_ok & (overlap_ub >= alpha))
        .select(
            F.col("pa.doc_id").alias("da"),
            F.col("pb.doc_id").alias("db"),
            sza.alias("sza"),
            szb.alias("szb"),
        )
        .distinct()
    )
    # Verify via per-doc shingle ARRAYS + map-side array_intersect
    # (round-6 same-session A/B): the exploded verify (join candidates
    # back onto both shingle streams, then a (da, db) hash-agg) pays a
    # candidate-x-shingles blow-up and a counting shuffle; grouping
    # each doc's (already distinct) shingles once and intersecting
    # arrays per candidate pair does the same exact count inside
    # codegen with NO post-join shuffle. Measured (matched, one
    # session): synth-sf1 21.2 -> 11.6 s (1.8x), scaling on 10x data
    # 5.2x -> ~2.3x. Building arrays only for candidate docs
    # (semi-join + checkpoint) measured WORSE at both scales (negative
    # result, PLANS.md). Round 7 (verdict #7) shrinks the arrays to
    # 8-byte md5_long tokens (the dedup_lines_corpus trick) — the
    # collect_list shuffle carries longs instead of ~20-byte strings
    # and array_intersect compares longs: same-session matched A/B
    # sf0.1 5.07 -> 3.49 s (1.45x), synth-sf1 11.36 -> 8.74 s (1.30x),
    # output identical at sf0.01/sf0.1 — this closed the round-6
    # "collect_list is the new dominant term" concern at BOTH scales.
    # Exactness contract after the hashing (round-8 ADVICE note): the
    # verify counts 60-bit md5_long token matches, so it is exact
    # UNLESS two DISTINCT shingles of the same candidate pair collide
    # in 60 bits — P ~ |sA|*|sB| * 2^-60 per pair, i.e. the contract
    # is probabilistic at scale (expected-nonzero only around ~10^12
    # distinct shingles / 100 TB; a collision can inflate the
    # intersection and admit a false pair vs a string-exact oracle).
    # At every tested SF the DuckDB hash-match is the witness that the
    # dataset is collision-free.
    arrs = shk.groupBy("doc_id").agg(F.collect_list("k").alias("arr"))
    aa = arrs.select(F.col("doc_id").alias("da"), F.col("arr").alias("arr_a"))
    bb = arrs.select(F.col("doc_id").alias("db"), F.col("arr").alias("arr_b"))
    common = (
        cand.join(aa, "da")
        .join(bb, "db")
        .withColumn("c", F.size(F.array_intersect("arr_a", "arr_b")))
    )
    jac = F.col("c") / (F.col("sza") + F.col("szb") - F.col("c"))
    return (
        common.filter(jac >= JACCARD_THRESHOLD)
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            F.round(jac, 6).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# incremental near-dup: new batch vs a persisted MinHash band index
# ---------------------------------------------------------------------------

# Same corpus/batch split as the exact-digest delta shape
# (dedup_incremental_batch) so the two deltas describe one ingest.
# Import is safe: llmprep pulls only from similarity, never from here.
from k8s_log_etl_spark.queries.llmprep import (  # noqa: E402
    CORPUS_MAX_ID,
    TRAIN_PCT,
    VAL_PCT,
)

_INCR_MH_SQL = f"""
WITH {_SHINGLES_CTE},
sig AS (SELECT doc_id, {_SIG_COLS_SQL} FROM sh GROUP BY doc_id),
bands AS (SELECT doc_id, b AS band, CASE b {_BAND_CASES} END AS bsig
          FROM sig, unnest(range({BANDS})) AS t(b)),
corpusb AS (SELECT * FROM bands WHERE doc_id < {CORPUS_MAX_ID}),
batchb AS (SELECT * FROM bands WHERE doc_id >= {CORPUS_MAX_ID}),
cand_c AS (
  SELECT DISTINCT b.doc_id AS bd, c.doc_id AS cd
  FROM batchb b JOIN corpusb c ON b.band = c.band AND b.bsig = c.bsig
),
ver_c AS (
  SELECT DISTINCT bd FROM cand_c
  JOIN sig sa ON bd = sa.doc_id JOIN sig sb ON cd = sb.doc_id
  WHERE ({_EQ_SUM}) / {NUM_HASHES}.0 >= {MINHASH_EST_THRESHOLD}
),
cand_b AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM batchb a JOIN batchb b
    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
),
ver_b AS (
  SELECT DISTINCT db AS bd FROM cand_b
  JOIN sig sa ON da = sa.doc_id JOIN sig sb ON db = sb.doc_id
  WHERE ({_EQ_SUM}) / {NUM_HASHES}.0 >= {MINHASH_EST_THRESHOLD}
),
flagged AS (
  SELECT d.doc_id, d.source,
         CASE WHEN vc.bd IS NOT NULL THEN 1 ELSE 0 END AS dup_corpus,
         CASE WHEN vb.bd IS NOT NULL THEN 1 ELSE 0 END AS dup_batch
  FROM (SELECT doc_id, source FROM documents WHERE doc_id >= {CORPUS_MAX_ID}) d
  LEFT JOIN ver_c vc ON d.doc_id = vc.bd
  LEFT JOIN ver_b vb ON d.doc_id = vb.bd
)
SELECT source,
       count(*) AS n_new,
       CAST(sum(dup_corpus) AS BIGINT) AS n_neardup_vs_corpus,
       CAST(sum(CASE WHEN dup_corpus = 0 THEN dup_batch ELSE 0 END) AS BIGINT)
         AS n_neardup_within_batch,
       CAST(sum(CASE WHEN dup_corpus = 0 AND dup_batch = 0 THEN 1 ELSE 0 END)
         AS BIGINT) AS n_unique
FROM flagged GROUP BY source
"""


@register(
    "dedup_minhash_incremental",
    oracle=_INCR_MH_SQL,
    tags=("dedup", "llmprep"),
)
def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup dedup — the delta shape a continuously-fed
    corpus runs for fuzzy duplicates, completing the pair started by
    dedup_incremental_batch (exact digests): MinHash-sign the NEW
    batch only, probe a persisted LSH band index of the corpus, verify
    candidates by signature estimate, and dedup the batch against
    itself the same way. Per-source counts: new / near-dup-vs-corpus /
    near-dup-within-batch / unique (a batch doc is within-batch dup if
    it verifies against an EARLIER batch doc — the min-id-keeps
    convention).

    Scale shape — why this beats re-running dedup_minhash_lsh on
    corpus+batch per drop: per-delta work is batch-sized signature
    build (one shingle scan of the BATCH) plus two keyed equi-joins of
    batch band rows against (1) the corpus band INDEX — persisted,
    bucketed by (band, bsig) on a cluster, corpus never re-scanned —
    and (2) the batch's own bands. Verification touches candidate
    pairs only, joined back to the signature frames by doc id. Here
    the index is derived then checkpointed (the driver tables are
    static), same modeling discipline as dedup_incremental_batch's
    "the corpus hash column lives as its own index table".
    tests/test_incremental_minhash.py pins index-probe equivalence:
    batch-vs-index verdicts == the full-recompute pair set restricted
    to (batch, corpus) pairs."""
    sh = _shingles(spark, sf_dir)
    sig = _mh_sig_frame_sql(sh).transform(spill_checkpoint)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "_", *[F.col("mh")[b * 4 + r] for r in range(4)]
                ).alias("bsig"),
            )
            for b in range(BANDS)
        ]
    )
    bands = sig.select(
        "doc_id", "mh", F.explode(band_structs).alias("bs")
    ).select("doc_id", "mh", "bs.band", "bs.bsig")
    # the persisted corpus index (band rows carry the signature so the
    # verify needs no join-back — same plan-reuse discipline as
    # dedup_minhash_lsh)
    index = bands.filter(F.col("doc_id") < CORPUS_MAX_ID).transform(spill_checkpoint)
    batchb = bands.filter(F.col("doc_id") >= CORPUS_MAX_ID)

    est = (
        sum(
            F.when(
                F.col("a.mh")[i] == F.col("b.mh")[i], 1
            ).otherwise(0)
            for i in range(NUM_HASHES)
        )
        / float(NUM_HASHES)
    )
    ver_c = (
        batchb.alias("a")
        .join(
            index.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig")),
        )
        .filter(est >= MINHASH_EST_THRESHOLD)
        .select(F.col("a.doc_id").alias("bd"))
        .distinct()
        .withColumn("dup_corpus", F.lit(1))
    )
    ver_b = (
        batchb.alias("a")
        .join(
            batchb.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(est >= MINHASH_EST_THRESHOLD)
        .select(F.col("b.doc_id").alias("bd"))
        .distinct()
        .withColumn("dup_batch", F.lit(1))
    )
    d = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    batch_docs = d.filter(F.col("doc_id") >= CORPUS_MAX_ID).select(
        F.col("doc_id").alias("bd"), "source"
    )
    flagged = (
        batch_docs.join(ver_c, "bd", "left")
        .join(ver_b, "bd", "left")
        .select(
            "source",
            F.coalesce("dup_corpus", F.lit(0)).alias("dup_corpus"),
            F.coalesce("dup_batch", F.lit(0)).alias("dup_batch"),
        )
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_new"),
        F.sum("dup_corpus").alias("n_neardup_vs_corpus"),
        F.sum(
            F.when(F.col("dup_corpus") == 0, F.col("dup_batch")).otherwise(0)
        ).alias("n_neardup_within_batch"),
        F.sum(
            F.when(
                (F.col("dup_corpus") == 0) & (F.col("dup_batch") == 0), 1
            ).otherwise(0)
        ).alias("n_unique"),
    )


# ---------------------------------------------------------------------------
# persisted-index SERVING variant of incremental near-dup (round-6
# verdict #4): dedup_minhash_incremental re-derives the corpus band
# index every run (the driver tables are static), so its registered
# cost profile measures index BUILD, not the delta probe the operator
# exists for. This variant persists the index to parquet ONCE per SF
# (input prep, like the JSONL materialization) and each run does only
# batch-sized work: sign a FIXED 100-doc delta, broadcast its band
# rows against a single columnar scan of the index, verify, count.
# ---------------------------------------------------------------------------

SERVE_LO = CORPUS_MAX_ID          # fixed serve delta: doc_ids [400, 500)
SERVE_HI = CORPUS_MAX_ID + 100

_SERVE_MH_SQL = f"""
WITH {_SHINGLES_CTE},
sig AS (SELECT doc_id, {_SIG_COLS_SQL} FROM sh GROUP BY doc_id),
bands AS (SELECT doc_id, b AS band, CASE b {_BAND_CASES} END AS bsig
          FROM sig, unnest(range({BANDS})) AS t(b)),
corpusb AS (SELECT * FROM bands
            WHERE doc_id < {SERVE_LO} OR doc_id >= {SERVE_HI}),
batchb AS (SELECT * FROM bands
           WHERE doc_id >= {SERVE_LO} AND doc_id < {SERVE_HI}),
cand_c AS (
  SELECT DISTINCT b.doc_id AS bd, c.doc_id AS cd
  FROM batchb b JOIN corpusb c ON b.band = c.band AND b.bsig = c.bsig
),
ver_c AS (
  SELECT DISTINCT bd FROM cand_c
  JOIN sig sa ON bd = sa.doc_id JOIN sig sb ON cd = sb.doc_id
  WHERE ({_EQ_SUM}) / {NUM_HASHES}.0 >= {MINHASH_EST_THRESHOLD}
),
cand_b AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM batchb a JOIN batchb b
    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
),
ver_b AS (
  SELECT DISTINCT db AS bd FROM cand_b
  JOIN sig sa ON da = sa.doc_id JOIN sig sb ON db = sb.doc_id
  WHERE ({_EQ_SUM}) / {NUM_HASHES}.0 >= {MINHASH_EST_THRESHOLD}
),
flagged AS (
  SELECT d.doc_id, d.source,
         CASE WHEN vc.bd IS NOT NULL THEN 1 ELSE 0 END AS dup_corpus,
         CASE WHEN vb.bd IS NOT NULL THEN 1 ELSE 0 END AS dup_batch
  FROM (SELECT doc_id, source FROM documents
        WHERE doc_id >= {SERVE_LO} AND doc_id < {SERVE_HI}) d
  LEFT JOIN ver_c vc ON d.doc_id = vc.bd
  LEFT JOIN ver_b vb ON d.doc_id = vb.bd
)
SELECT source,
       count(*) AS n_new,
       CAST(sum(dup_corpus) AS BIGINT) AS n_neardup_vs_corpus,
       CAST(sum(CASE WHEN dup_corpus = 0 THEN dup_batch ELSE 0 END) AS BIGINT)
         AS n_neardup_within_batch,
       CAST(sum(CASE WHEN dup_corpus = 0 AND dup_batch = 0 THEN 1 ELSE 0 END)
         AS BIGINT) AS n_unique
FROM flagged GROUP BY source
"""


def _mh_band_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, mh, band, bsig) band rows for a documents frame — the
    signature build shared by the serve index and its probe. Entirely
    map-side until the per-doc min hash-agg; band rows carry the full
    signature so verification never joins back."""
    sh = docs.select("doc_id", F.explode(_shingle_array()).alias("s"))
    sig = _mh_sig_frame_sql(sh)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "_", *[F.col("mh")[b * 4 + r] for r in range(4)]
                ).alias("bsig"),
            )
            for b in range(BANDS)
        ]
    )
    return sig.select(
        "doc_id", "mh", F.explode(band_structs).alias("bs")
    ).select("doc_id", "mh", "bs.band", "bs.bsig")


def mh_corpus_index_path(spark: SparkSession, sf_dir: str) -> str:
    """Build-once path of the persisted corpus band index for `sf_dir`
    (everything OUTSIDE the fixed serve window). Input prep, not query
    work — the same amortization contract as the JSONL
    materialization: the first call pays one corpus scan; every serve
    run after reads the parquet. The path is content-fingerprinted on
    the source documents table (round-8 ADVICE fix): regenerating the
    dataset invalidates the cache, same-basename dirs don't collide,
    and the root is user-owned, not a fixed /tmp name."""
    from k8s_log_etl_spark.tables import dataset_cache_path

    path = dataset_cache_path(sf_dir, "mhindex_v1", "documents")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        d = ensure_min_parallelism(
            load_table(spark, sf_dir, "documents"), spark, "doc_id"
        )
        corpus = d.filter(
            (F.col("doc_id") < SERVE_LO) | (F.col("doc_id") >= SERVE_HI)
        )
        _mh_band_frame(corpus).write.mode("overwrite").parquet(path)
    return path


@register(
    "dedup_minhash_index_serve",
    oracle=_SERVE_MH_SQL,
    tags=("dedup", "llmprep"),
)
def dedup_minhash_index_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup SERVING probe against a persisted LSH band index — the
    steady-state face of dedup_minhash_incremental (round-6 verdict
    #4: that query's registered cost measures index BUILD because the
    static driver tables force a re-derive; this one measures the
    PROBE, which is what a continuously-fed corpus pays per drop).

    Semantics: identical to dedup_minhash_incremental but over a FIXED
    100-doc delta (doc_ids [SERVE_LO, SERVE_HI)) probed against the
    index of everything else — per-source new / near-dup-vs-corpus /
    near-dup-within-batch / unique counts, min-id-keeps within the
    batch. The oracle recomputes the whole thing from text, so the
    hash-green row IS the index-probe == full-recompute equivalence
    (kept pinned independently in tests/test_incremental_minhash.py).

    Scale shape — the plan a 1000-executor serving tier wants: per-run
    work is (a) shingle+sign 100 docs (fixed, map-side), (b) ONE
    columnar scan of the persisted index with the batch's ~1.6k band
    rows BROADCAST into a map-side hash join — the corpus-sized side
    is never shuffled, never sorted, and only (doc_id, mh, band, bsig)
    columns are read; (c) candidate-only verification off the carried
    signatures. Index growth costs the serve path one linear columnar
    scan (on a real cluster the index table is bucketed by (band,
    bsig), making the probe partition-pruned instead); batch-vs-batch
    is a self-join of the tiny broadcast frame. The index parquet is
    built once per SF by mh_corpus_index_path (input prep, amortized
    across serves — the streaming twin ingest_batch_neardup maintains
    the same index continuously)."""
    idx = spark.read.parquet(mh_corpus_index_path(spark, sf_dir))
    d = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    batch_docs = d.filter(
        (F.col("doc_id") >= SERVE_LO) & (F.col("doc_id") < SERVE_HI)
    )
    batchb = _mh_band_frame(batch_docs).transform(spill_checkpoint)

    est = (
        sum(
            F.when(F.col("a.mh")[i] == F.col("b.mh")[i], 1).otherwise(0)
            for i in range(NUM_HASHES)
        )
        / float(NUM_HASHES)
    )
    ver_c = (
        F.broadcast(batchb.alias("a"))
        .join(
            idx.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig")),
        )
        .filter(est >= MINHASH_EST_THRESHOLD)
        .select(F.col("a.doc_id").alias("bd"))
        .distinct()
        .withColumn("dup_corpus", F.lit(1))
    )
    ver_b = (
        batchb.alias("a")
        .join(
            batchb.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(est >= MINHASH_EST_THRESHOLD)
        .select(F.col("b.doc_id").alias("bd"))
        .distinct()
        .withColumn("dup_batch", F.lit(1))
    )
    flagged = (
        batch_docs.select(F.col("doc_id").alias("bd"), "source")
        .join(ver_c, "bd", "left")
        .join(ver_b, "bd", "left")
        .select(
            "source",
            F.coalesce("dup_corpus", F.lit(0)).alias("dup_corpus"),
            F.coalesce("dup_batch", F.lit(0)).alias("dup_batch"),
        )
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_new"),
        F.sum("dup_corpus").alias("n_neardup_vs_corpus"),
        F.sum(
            F.when(F.col("dup_corpus") == 0, F.col("dup_batch")).otherwise(0)
        ).alias("n_neardup_within_batch"),
        F.sum(
            F.when(
                (F.col("dup_corpus") == 0) & (F.col("dup_batch") == 0), 1
            ).otherwise(0)
        ).alias("n_unique"),
    )


# ---------------------------------------------------------------------------
# eval-set leakage guard: holdout minus near-dups of train
# ---------------------------------------------------------------------------

_SPLIT_CASE_SQL = (
    f"CASE WHEN {X.md5_long_sql('CAST(doc_id AS VARCHAR)')} % 100 < "
    f"{TRAIN_PCT} THEN 'train' WHEN "
    f"{X.md5_long_sql('CAST(doc_id AS VARCHAR)')} % 100 < "
    f"{VAL_PCT} THEN 'val' ELSE 'test' END"
)

_HOLDOUT_SQL = f"""
WITH pairs AS ({_MINHASH_SQL}),
splits AS (
  SELECT doc_id, lang, {_SPLIT_CASE_SQL} AS split FROM documents
),
leaked AS (
  SELECT DISTINCT h.doc_id
  FROM splits h
  JOIN (
    SELECT doc_a AS h_id, doc_b AS t_id FROM pairs
    UNION ALL
    SELECT doc_b AS h_id, doc_a AS t_id FROM pairs
  ) p ON p.h_id = h.doc_id
  JOIN splits t ON t.doc_id = p.t_id
  WHERE h.split <> 'train' AND t.split = 'train'
)
SELECT s.split, s.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_leaked,
       CAST(sum(CASE WHEN l.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clean
FROM splits s LEFT JOIN leaked l ON s.doc_id = l.doc_id
WHERE s.split <> 'train'
GROUP BY s.split, s.lang
"""


@register(
    "eval_holdout_decontaminated",
    oracle=_HOLDOUT_SQL,
    tags=("dedup", "llmprep"),
)
def eval_holdout_decontaminated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set leakage guard — the step between splitting and
    evaluating that keeps the holdout honest: a val/test document that
    NEAR-duplicates any train document leaks training signal into the
    metric (Lee et al. 2021 measure exactly this inflation), and exact
    dedup can't see it. Composes the deterministic md5 split
    (split_train_holdout's assignment) with the MinHash-verified
    near-dup pair set (dedup_minhash_lsh's machinery): a holdout doc
    is LEAKED if any verified pair connects it to a train doc, in
    either pair orientation. Reports per-(split, lang) doc / leaked /
    clean counts — the clean set is what an honest eval runs on.

    Scale shape: the pair set is the sub-quadratic banded join (built
    once, here reused via the registered query); split assignment is a
    pure map-side hash predicate; leak detection is two keyed joins of
    the (small) pair list against the split frame and one hash-agg.
    Nothing new shuffles at corpus scale beyond what the pair build
    already paid."""
    pairs = dedup_minhash_lsh(spark, sf_dir).transform(spill_checkpoint)
    d = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    bucket = X.md5_long(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < VAL_PCT, "val")
        .otherwise("test")
    )
    splits = d.select("doc_id", "lang", split.alias("split"))
    sym = pairs.select(
        F.col("doc_a").alias("h_id"), F.col("doc_b").alias("t_id")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("h_id"), F.col("doc_a").alias("t_id"))
    )
    train_ids = splits.filter(F.col("split") == "train").select(
        F.col("doc_id").alias("t_id")
    )
    leaked = (
        sym.join(train_ids, "t_id", "leftsemi")
        .select(F.col("h_id").alias("doc_id"))
        .distinct()
        .withColumn("is_leaked", F.lit(1))
    )
    holdout = splits.filter(F.col("split") != "train")
    return (
        holdout.join(leaked, "doc_id", "left")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce("is_leaked", F.lit(0))).alias("n_leaked"),
            F.sum(
                F.when(F.col("is_leaked").isNull(), 1).otherwise(0)
            ).alias("n_clean"),
        )
    )



# ---------------------------------------------------------------------------
# keeper remap table (the rewrite artifact downstream joins consume)
# ---------------------------------------------------------------------------

_REMAP_SQL = f"""
WITH RECURSIVE
pairs AS (
  SELECT doc_a, doc_b FROM ({_SIMHASH_BANDED_SQL.strip()})
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(node, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
),
lbl AS (SELECT node, min(lbl) AS cluster FROM reach GROUP BY node),
scored AS (
  SELECT l.cluster, l.node,
         row_number() OVER (
           PARTITION BY l.cluster ORDER BY d.n_chars DESC, l.node
         ) AS rn
  FROM lbl l JOIN documents d ON d.doc_id = l.node
),
keeper AS (SELECT cluster, node AS keeper_id FROM scored WHERE rn = 1)
SELECT l.node AS doc_id, k.keeper_id, (l.node = k.keeper_id) AS is_keeper
FROM lbl l JOIN keeper k ON l.cluster = k.cluster
"""


@register("dedup_keeper_remap", oracle=_REMAP_SQL, tags=("dedup", "llmprep"))
def dedup_keeper_remap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REMAP table — what downstream actually consumes after
    cluster dedup (dedup_keep_best names the keepers; this maps every
    clustered document to its keeper so references, citations, and
    derived tables can be rewritten with one join): (doc_id,
    keeper_id, is_keeper) for every doc in any near-dup cluster, the
    keeper chosen by the same longest-then-lowest-id policy.

    Deliberately SPARSE: unclustered documents are absent (they are
    trivially their own keeper), so the table is |clustered docs|
    rows — at 100 TB a remap that enumerated every doc would itself
    be a corpus-sized artifact, while the sparse form is
    delta-sized and broadcastable into the rewrite joins that use it
    (left join + coalesce(keeper_id, doc_id)).

    Scale shape: inherits cc_star's O(log n) rounds off the banded
    pair set; adds one keyed join for the policy column, one
    per-cluster WindowGroupLimit, and one keyed join mapping members
    to keepers."""
    d = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    pairs = dedup_simhash_banded(spark, sf_dir).select("doc_a", "doc_b")
    labels = cc_star(pairs)
    w = Window.partitionBy("cluster").orderBy(F.desc("n_chars"), F.asc("node"))
    keeper = (
        labels.join(d.select(F.col("doc_id").alias("node"), "n_chars"), "node")
        .select(F.col("lbl").alias("cluster"), "node", "n_chars")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cluster", F.col("node").alias("keeper_id"))
    )
    return (
        labels.select(F.col("lbl").alias("cluster"), F.col("node").alias("doc_id"))
        .join(keeper, "cluster")
        .select(
            "doc_id",
            "keeper_id",
            (F.col("doc_id") == F.col("keeper_id")).alias("is_keeper"),
        )
    )


# ---------------------------------------------------------------------------
# cross-document line dedup (C4 / RefinedWeb-style boilerplate removal)
# ---------------------------------------------------------------------------

LINE_WORDS = 10        # fixed segmentation width (the corpus has no newlines)
LINE_DUP_MIN_DOCS = 2  # a line present in this many distinct docs is boilerplate

_LINES_SQL = rf"""
WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS wa
           FROM documents),
l AS (SELECT doc_id, t.i AS ln,
             array_to_string(
               wa[(t.i*{LINE_WORDS}+1):(t.i*{LINE_WORDS}+{LINE_WORDS})],
               ' ') AS line
      FROM w, unnest(range((len(wa) - 1) // {LINE_WORDS} + 1)) AS t(i)),
dup AS (SELECT line FROM l
        GROUP BY line HAVING count(DISTINCT doc_id) >= {LINE_DUP_MIN_DOCS}),
m AS (SELECT l.*, (d.line IS NOT NULL) AS is_dup
      FROM l LEFT JOIN dup d USING (line))
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_lines,
  CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS removed_lines,
  md5(coalesce(
    string_agg(CASE WHEN NOT is_dup THEN line END, ' ' ORDER BY ln),
    '')) AS cleaned_hash
FROM m GROUP BY doc_id
"""


@register("dedup_lines_corpus", oracle=_LINES_SQL, tags=("dedup", "llmprep"))
def dedup_lines_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 / RefinedWeb-style CROSS-DOCUMENT line dedup — detect and
    apply in one pass: segment every document into fixed 10-word
    lines (the corpus has no newlines, so segmentation is positional
    and deterministic), mark any line that appears in >= 2 distinct
    documents as corpus boilerplate, and emit the per-document rewrite
    receipt: total/removed line counts plus md5 of the text rebuilt
    from the surviving lines in order (the byte-stream-hash oracle
    discipline of dedup_excise_spans).

    Distinct from dedup_substring_spans: spans find per-PAIR shared
    substrings; this finds corpus-FREQUENT segments (headers, footers,
    navigation chrome — the thing C4's "three-sentence span" rule and
    RefinedWeb's line-dedup target) with one frequency aggregate, no
    pair join at all.

    Scale shape (100 TB): the segmentation is a map-side JVM HOF
    (sequence + slice + array_join — no explode needed to build
    lines); the frequency count is ONE hash-aggregate keyed on the
    60-bit md5_long of the line, NOT the ~60-byte line string itself —
    the frequency shuffle and the marker join carry 8-byte keys
    (measured A/B in PLANS.md: 0.77x at the data-linear point, output
    identical; the ORACLE still groups on the raw line, so a hash
    collision — P ~ n²/2^61 — would surface as a driver hash mismatch,
    the snapshot-fingerprint discipline); the dup set is
    boilerplate-sized (<< corpus), so AQE turns the marker join into a
    broadcast at runtime; the rebuild is one groupBy(doc_id) whose
    per-group state is the document itself. Two data-sized shuffles
    total (line-hash, doc-key), both with map-side partial
    aggregation."""
    d = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    lines = bind(
        F.split(F.trim(F.col("text")), r"\s+"),
        lambda w: F.transform(
            F.sequence(
                F.lit(0), F.floor((F.size(w) - F.lit(1)) / LINE_WORDS).cast("int")
            ),
            lambda i: F.array_join(
                F.slice(w, i * LINE_WORDS + 1, LINE_WORDS), " "
            ),
        ),
    )
    ex = d.select("doc_id", F.posexplode(lines).alias("ln", "line")).withColumn(
        "lh", X.md5_long(F.col("line"))
    )
    dup = (
        ex.groupBy("lh")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= LINE_DUP_MIN_DOCS)
        .select("lh", F.lit(True).alias("is_dup"))
    )
    kept_struct = F.when(F.col("is_dup").isNull(), F.struct("ln", "line"))
    return (
        ex.join(dup, "lh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).alias("removed_lines"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(kept_struct)),
                        lambda s: s["line"],
                    ),
                    " ",
                )
            ).alias("cleaned_hash"),
        )
    )


# ---------------------------------------------------------------------------
# group-aware split: near-dup clusters never straddle train/val/test
# ---------------------------------------------------------------------------

_GROUP_SPLIT_SQL = f"""
WITH RECURSIVE
pairs AS (
  SELECT doc_a, doc_b FROM ({_SIMHASH_BANDED_SQL.strip()})
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(node, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
),
lbl AS (SELECT node, min(lbl) AS cluster FROM reach GROUP BY node),
g AS (
  SELECT d.doc_id, coalesce(l.cluster, d.doc_id) AS gk, l.cluster
  FROM documents d LEFT JOIN lbl l ON l.node = d.doc_id
),
a AS (
  SELECT CASE WHEN {X.md5_long_sql("CAST(gk AS VARCHAR)")} % 100 < {TRAIN_PCT}
                THEN 'train'
              WHEN {X.md5_long_sql("CAST(gk AS VARCHAR)")} % 100 < {VAL_PCT}
                THEN 'val'
              ELSE 'test' END AS split,
         gk, cluster
  FROM g
)
SELECT split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT gk) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN cluster IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clustered_docs
FROM a GROUP BY split
"""


def group_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document split assignment keyed on the near-dup GROUP, not
    the doc: every document's group key is its connected-component
    label under the banded-SimHash near-dup graph (its own doc_id if
    unclustered), and the md5 split bucket is computed on that key —
    so two near-duplicates CANNOT land in different splits; the
    leakage eval_holdout_decontaminated detects is structurally
    impossible here. Returns (doc_id, gk, cluster, split)."""
    d = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    pairs = dedup_simhash_banded(spark, sf_dir).select("doc_a", "doc_b")
    labels = cc_star(pairs).withColumnRenamed("node", "doc_id")
    g = d.select("doc_id").join(labels, "doc_id", "left")
    gk = F.coalesce(F.col("lbl"), F.col("doc_id"))
    bucket = X.md5_long(gk.cast("string")) % 100
    split = (
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < VAL_PCT, "val")
        .otherwise("test")
    )
    return g.select(
        "doc_id",
        gk.alias("gk"),
        F.col("lbl").alias("cluster"),
        split.alias("split"),
    )


@register(
    "split_group_aware",
    oracle=_GROUP_SPLIT_SQL,
    tags=("dedup", "llmprep"),
    # heaviest round-6 addition at sf0.1 (~8 s: banded pairs + cc_star
    # fixpoint) — promoted so regressions in the clustering path stay
    # visible to BENCH_r{N} comparisons (round-5 verdict #3 principle)
    bench=True,
)
def split_group_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-PREVENTING train/val/test split — the structural
    complement of eval_holdout_decontaminated (which DETECTS leakage
    under the naive per-doc split after the fact): hash the near-dup
    cluster label instead of the doc_id, so a cluster moves between
    splits as a unit and no near-duplicate pair ever straddles the
    train/holdout boundary (the contamination mechanism of Lee et al.
    2021). Unclustered docs hash their own id — identical to
    split_train_holdout for them, so the 90/5/5 proportions hold.
    Reports per-split doc / group / clustered-doc counts.

    Scale shape: inherits cc_star's O(log n) rounds over the
    banded pair set (delta-sized, not corpus-sized); the split is then
    a pure map-side hash of the group key after ONE left join of the
    sparse label frame (broadcastable at 100 TB, same shape as
    dedup_keeper_remap's rewrite join); final agg keys on 3 splits."""
    return group_splits(spark, sf_dir).groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("gk").alias("n_groups"),
        F.sum(
            F.when(F.col("cluster").isNotNull(), 1).otherwise(0)
        ).alias("n_clustered_docs"),
    )


# ---------------------------------------------------------------------------
# content-defined chunking (CDC) dedup — storage-class chunk dedup
# ---------------------------------------------------------------------------

CDC_G = 8   # boundary iff md5_long(word) % CDC_G == 0 -> mean chunk ~8 words

_CDC_WORDS_SQL = "list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')"


def _cdc_sql() -> str:
    wb = X.md5_long_sql("w[i]")
    return f"""
WITH words AS (SELECT doc_id, source, {_CDC_WORDS_SQL} AS w
               FROM documents WHERE text IS NOT NULL),
bounds AS (
  SELECT doc_id, source, w,
         list_filter(range(1, len(w) + 1), i -> {wb} % {CDC_G} = 0) AS b
  FROM words
),
ends AS (
  SELECT doc_id, source, w,
         CASE WHEN len(w) = 0 THEN []
              WHEN len(b) >= 1 AND b[len(b)] = len(w) THEN b
              ELSE list_concat(b, [len(w)]) END AS e
  FROM bounds
),
chunks AS (
  SELECT doc_id, source,
         array_to_string(
           w[(CASE WHEN k = 1 THEN 1 ELSE e[k - 1] + 1 END):(e[k])], ' '
         ) AS chunk
  FROM ends, unnest(range(1, len(e) + 1)) AS t(k)
),
hashed AS (
  SELECT doc_id, source, {X.md5_long_sql('chunk')} AS ch,
         length(chunk) AS clen
  FROM chunks
),
tot AS (
  SELECT source, count(*) AS n_chunks, sum(clen) AS chunk_bytes
  FROM hashed GROUP BY source
),
firsts AS (
  SELECT ch, arg_min(source, doc_id) AS source,
         arg_min(clen, doc_id) AS fclen
  FROM hashed GROUP BY ch
),
fsrc AS (
  SELECT source, count(*) AS first_chunks, sum(fclen) AS first_bytes
  FROM firsts GROUP BY source
),
docs AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source)
SELECT d.source,
       CAST(d.n_docs AS BIGINT) AS n_docs,
       CAST(coalesce(t.n_chunks, 0) AS BIGINT) AS n_chunks,
       CAST(coalesce(t.chunk_bytes, 0) AS BIGINT) AS chunk_bytes,
       CAST(coalesce(f.first_chunks, 0) AS BIGINT) AS first_chunks,
       CAST(coalesce(f.first_bytes, 0) AS BIGINT) AS first_bytes
FROM docs d
LEFT JOIN tot t USING (source)
LEFT JOIN fsrc f USING (source)
"""


def _cdc_chunks_col() -> F.Column:
    """Array of content-defined chunks of `text`, word-granular: a word
    whose md5_long is divisible by CDC_G closes the current chunk (the
    Rabin-style boundary test of LBFS/FastCDC applied at token
    granularity — one md5 per WORD, the cost class of every other
    text operator here, instead of one rolling hash per CHARACTER).
    Boundary decisions are position-independent, so chunking is
    embarrassingly parallel — the property that makes CDC usable in a
    distributed engine at all (cf. Muthitacharoen et al., LBFS,
    SOSP'01). Every level (words, boundary ends) is bind()-bound
    before the next lambda indexes it: an inline reference would
    re-run the boundary filter per chunk — the O(n^2) class the
    round-8 textops.bind finding eliminated repo-wide."""
    def chunk_arr(w: F.Column, e: F.Column) -> F.Column:
        idx = F.when(
            F.size(e) >= 1, F.sequence(F.lit(1), F.size(e))
        ).otherwise(F.array().cast("array<int>"))
        def one(k: F.Column) -> F.Column:
            start = F.when(k == 1, F.lit(1)).otherwise(
                F.element_at(e, k - 1) + 1
            )
            return F.concat_ws(
                " ", F.slice(w, start, F.element_at(e, k) - start + 1)
            )
        return F.transform(idx, one)

    def ends(w: F.Column) -> F.Column:
        n = F.size(w)
        b = F.when(
            n >= 1,
            F.filter(
                F.sequence(F.lit(1), n),
                lambda i: X.md5_long(F.element_at(w, i)) % CDC_G == 0,
            ),
        ).otherwise(F.array().cast("array<int>"))
        return bind(
            b,
            lambda bb: F.when(n == 0, F.array().cast("array<int>")).otherwise(
                F.when(
                    (F.size(bb) >= 1)
                    & (F.element_at(bb, F.size(bb)) == n),
                    bb,
                ).otherwise(F.concat(bb, F.array(n)))
            ),
        )

    words = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
    return bind(words, lambda w: bind(ends(w), lambda e: chunk_arr(w, e)))


@register("dedup_cdc_chunks", oracle=_cdc_sql(), tags=("dedup",))
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-class dedup via content-defined chunking: cut every
    document into variable-size chunks at content-determined boundaries
    (hash-divisible words, mean chunk ~CDC_G words), hash each chunk,
    and report per source how many chunk occurrences / bytes the corpus
    holds vs how many chunks FIRST occur there (attribution by min
    doc_id — deterministic because doc ids are unique). first_bytes /
    chunk_bytes is the storage-dedup ratio; unlike document-level
    exact dedup (dedup_exact) and near-dup excision (substring spans),
    CDC finds REUSED SPANS across otherwise-different documents —
    boilerplate headers, quoted replies, license blocks — the dedup
    granularity storage systems (LBFS, venti, borg/restic) and
    recent training-data pipelines use between "whole doc" and
    "every n-gram". Content-defined (not fixed-width) boundaries make
    the chunking insertion-robust: an edit reflows only the chunk it
    touches, neighbors re-align at the next content boundary.

    Scale shape: chunking is map-side (one md5 per word + one per
    chunk, bind()-bound, no quadratic re-evaluation); the only
    shuffles are the chunk-hash agg (8-byte keys, map-side partials
    — the dedup_lines_corpus class) and two tiny per-source rollups.
    min(struct(doc_id, source, clen)) == DuckDB arg_min(·, doc_id)
    because doc_id is the first struct field and unique; 60-bit chunk
    hashes carry the documented 2^-60-per-pair collision bound (see
    dedup_prefix_filter_jaccard)."""
    d = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    # NULL text -> zero chunks (doc still counted in n_docs): without
    # the gate Spark's concat_ws would coerce the NULL span to one ""
    # chunk while DuckDB's NULL list yields none (the round-7 NULL-text
    # sweep policy: make the gate explicit in BOTH engines).
    hashed = d.filter(F.col("text").isNotNull()).select(
        "doc_id", "source", F.explode(_cdc_chunks_col()).alias("chunk")
    ).select(
        "doc_id",
        "source",
        X.md5_long(F.col("chunk")).alias("ch"),
        F.length("chunk").alias("clen"),
    )
    tot = hashed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("clen").alias("chunk_bytes"),
    )
    firsts = hashed.groupBy("ch").agg(
        F.min(F.struct("doc_id", "source", "clen")).alias("f")
    )
    fsrc = firsts.groupBy(F.col("f.source").alias("source")).agg(
        F.count(F.lit(1)).alias("first_chunks"),
        F.sum("f.clen").alias("first_bytes"),
    )
    docs = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        docs.join(tot, "source", "left")
        .join(fsrc, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_chunks", F.lit(0)).alias("n_chunks"),
            F.coalesce("chunk_bytes", F.lit(0)).alias("chunk_bytes"),
            F.coalesce("first_chunks", F.lit(0)).alias("first_chunks"),
            F.coalesce("first_bytes", F.lit(0)).alias("first_bytes"),
        )
    )


# ---------------------------------------------------------------------------
# cross-source exact-overlap matrix — the provenance audit a data team
# runs before paying for a new source
# ---------------------------------------------------------------------------

_SRC_OVERLAP_SQL = """
WITH hashed AS (
  SELECT DISTINCT source,
         md5(array_to_string(list_filter(string_split_regex(lower(trim(text)),
             '\\s+'), x -> x <> ''), ' ')) AS h
  FROM documents
  WHERE text IS NOT NULL
),
stot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_hashes FROM hashed GROUP BY source),
shared AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS n_shared
  FROM hashed a JOIN hashed b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2
)
SELECT s.source_a, s.source_b, s.n_shared,
       ta.n_hashes AS n_hashes_a, tb.n_hashes AS n_hashes_b,
       CAST((s.n_shared * 1000000) // least(ta.n_hashes, tb.n_hashes)
            AS BIGINT) AS containment_ppm
FROM shared s
JOIN stot ta ON s.source_a = ta.source
JOIN stot tb ON s.source_b = tb.source
"""


@register("corpus_source_overlap", oracle=_SRC_OVERLAP_SQL, tags=("dedup", "llmprep"))
def corpus_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source exact-duplication matrix: for every source pair,
    how many canonical text hashes they SHARE, and that count as ppm
    of the smaller source's distinct corpus (containment of the
    smaller in the larger) — the audit that tells a sourcing team a
    candidate dataset is already 40% inside what they own before they
    pay for it. Dedup_exact's canonicalization (lowercase, whitespace
    collapsed, md5).

    Scale shape: the per-(source, hash) distinct collapses the corpus
    once (hash-agg, 32 B keys); pairs then expand MAP-SIDE from the
    per-hash sorted source set — bounded by |sources| per hash, never
    a doc-level self-join (the parts_copurchased grouped-expansion
    discipline; the oracle keeps the literal self-join to pin the
    equivalence). Source totals are a |sources|-row broadcast."""
    d = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    canon = F.concat_ws(
        " ", F.filter(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda x: x != "")
    )
    # NULL text must not form a group: Spark's groupBy keeps a NULL
    # hash key while the oracle's equi-self-join drops it — two NULL
    # docs in different sources would diverge cross-engine (repo
    # convention: every md5(text) query filters NULLs first).
    hashed = (
        d.filter(F.col("text").isNotNull())
        .select("source", F.md5(canon).alias("h"))
        .distinct()
    )
    stot = hashed.groupBy("source").agg(F.count(F.lit(1)).alias("n_hashes"))
    srcs = hashed.groupBy("h").agg(
        F.sort_array(F.collect_set("source")).alias("ss")
    )
    ss = F.col("ss")
    pair_list = F.flatten(
        F.transform(
            ss,
            lambda x, i: F.transform(
                F.slice(ss, i + 2, F.size(ss)),
                lambda y: F.struct(x.alias("sa"), y.alias("sb")),
            ),
        )
    )
    shared = (
        srcs.select(F.explode(pair_list).alias("p"))
        .groupBy(F.col("p.sa").alias("source_a"), F.col("p.sb").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    ta = stot.select(F.col("source").alias("source_a"), F.col("n_hashes").alias("n_hashes_a"))
    tb = stot.select(F.col("source").alias("source_b"), F.col("n_hashes").alias("n_hashes_b"))
    return (
        shared.join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_hashes_a",
            "n_hashes_b",
            F.expr(
                "(n_shared * 1000000) div least(n_hashes_a, n_hashes_b)"
            ).alias("containment_ppm"),
        )
    )


_SRC_NEARDUP_SQL = f"""
WITH mh AS ({_MINHASH_SQL}),
ds AS (SELECT doc_id, source FROM documents)
SELECT least(a.source, b.source) AS source_a,
       greatest(a.source, b.source) AS source_b,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT CASE WHEN a.source < b.source
                                THEN mh.doc_a ELSE mh.doc_b END) AS BIGINT)
         AS n_docs_a,
       CAST(count(DISTINCT CASE WHEN a.source < b.source
                                THEN mh.doc_b ELSE mh.doc_a END) AS BIGINT)
         AS n_docs_b
FROM mh
JOIN ds a ON mh.doc_a = a.doc_id
JOIN ds b ON mh.doc_b = b.doc_id
WHERE a.source <> b.source
GROUP BY 1, 2
"""


@register("corpus_source_overlap_neardup", oracle=_SRC_NEARDUP_SQL, tags=("dedup", "llmprep"))
def corpus_source_overlap_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-dup companion of corpus_source_overlap: the cross-source
    matrix of MinHash-LSH-verified near-duplicate pairs — which
    sources are rehosting lightly-edited copies of each other, the
    question exact hashing cannot answer (and the one that produces
    rows on real crawl data, where cross-source copies are edited, not
    byte-identical). Rides dedup_minhash_lsh's banded pair stream
    unchanged (shingle→minhash→band→bucket-join, sub-quadratic by
    banding); this query adds only two keyed joins of the doc→source
    projection onto the pair endpoints and a |source-pairs|-key
    hash-agg reporting pair counts and the distinct docs involved per
    side (pair ordered by source name, so each unordered source pair
    appears once).

    Determinism: inherits the minhash estimate's exactness (integer
    signature equality counts divided once, round 6); counts are
    integers. Scale shape: the LSH stage is the established one; the
    source joins are 8-byte doc-id equi-joins on the (small) verified
    pair stream."""
    pairs = dedup_minhash_lsh(spark, sf_dir)
    ds = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    a = ds.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa"))
    b = ds.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb"))
    j = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .filter(F.col("sa") != F.col("sb"))
    )
    doc_lo = F.when(F.col("sa") < F.col("sb"), F.col("doc_a")).otherwise(F.col("doc_b"))
    doc_hi = F.when(F.col("sa") < F.col("sb"), F.col("doc_b")).otherwise(F.col("doc_a"))
    return (
        j.select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
            doc_lo.alias("doc_lo"),
            doc_hi.alias("doc_hi"),
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("doc_lo").alias("n_docs_a"),
            F.countDistinct("doc_hi").alias("n_docs_b"),
        )
    )
