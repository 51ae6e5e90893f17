"""Training-data preparation operators (§2c charter extension):
deterministic corpus sampling, TF-IDF term weighting, context-window
sequence packing, and ANN recall evaluation.

These are the ops a large-scale LLM data pipeline runs between cleaning
(queries/text.py, queries/dedup.py) and training: sample a corpus
reproducibly, weight vocabulary, pack documents into fixed token
budgets, and measure how much recall the approximate similarity index
gives up versus the exact baseline.

Determinism: sampling orders/filters on md5 of the doc id (identical
hex in both engines); tf-idf uses natural log on exact integer counts;
packing is integer window arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from k8s_log_etl_spark.functions import xengine as X
from k8s_log_etl_spark.functions.textops import ngram_indices
from k8s_log_etl_spark.plans.registry import register
from k8s_log_etl_spark.queries import similarity as S
from k8s_log_etl_spark.tables import ensure_min_parallelism, load_table

SAMPLE_PCT = 20          # Bernoulli keep-rate, percent
STRATUM_CAP = 50         # per-language cap for the stratified sample
TFIDF_TOP = 20
PACK_BUDGET = 2048       # tokens per packed context window

_WORDS_SQL = "list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')"


def _words() -> F.Column:
    return F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")


# ---------------------------------------------------------------------------
# deterministic sampling
# ---------------------------------------------------------------------------

_BERNOULLI_SQL = f"""
SELECT doc_id, lang FROM documents
WHERE {X.md5_long_sql("CAST(doc_id AS VARCHAR)")} % 100 < {SAMPLE_PCT}
"""


@register("sample_bernoulli_seeded", oracle=_BERNOULLI_SQL, tags=("llmprep",))
def sample_bernoulli_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~20% Bernoulli sample: keep a doc iff
    md5(doc_id) mod 100 falls under the rate. Pure map-side predicate —
    no shuffle, no state, reproducible across engines and runs; the
    sampling decision moves with the row, so at 100 TB this is a free
    filter pushed against the scan."""
    d = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark)
    keep = X.md5_long(F.col("doc_id").cast("string")) % 100 < SAMPLE_PCT
    return d.filter(keep).select("doc_id", "lang")


_STRATIFIED_SQL = f"""
SELECT doc_id, lang, rn FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rn
  FROM documents
) WHERE rn <= {STRATUM_CAP}
"""


@register("sample_stratified_topk", oracle=_STRATIFIED_SQL, tags=("llmprep",))
def sample_stratified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language cap: rank docs inside each language by a
    deterministic hash (md5 hex ordering — a seeded shuffle) and keep
    the first STRATUM_CAP. One shuffle on lang; WindowGroupLimit prunes
    to cap rows per partition before the final sort. For very hot
    strata at 100 TB the Bernoulli variant (rate = cap/count, no
    total-order window) is the first pass; this exact-cap window is the
    trim step that follows."""
    d = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark)
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= STRATUM_CAP)
    )


# ---------------------------------------------------------------------------
# tf-idf vocabulary weighting
# ---------------------------------------------------------------------------

_TFIDF_SQL = f"""
WITH toks AS (
  SELECT doc_id, lower(unnest({_WORDS_SQL})) AS term FROM documents
),
stats AS (
  SELECT term, count(*) AS tf_total, count(DISTINCT doc_id) AS df
  FROM toks GROUP BY term
),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
SELECT term, tf_total, df,
       round(tf_total * ln((n_docs + 1.0) / (df + 1.0)), 6) AS tfidf
FROM stats, n
ORDER BY tfidf DESC, term
LIMIT {TFIDF_TOP}
"""


@register("tfidf_top_terms", oracle=_TFIDF_SQL, tags=("llmprep", "text"), bench=True)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level TF-IDF: one explode → hash-aggregate per term
    (count + distinct-doc count, both map-side partial), the corpus
    size joined in as a broadcast scalar, then a global top-20
    (TakeOrderedAndProject — no full sort). Smoothed idf
    ln((N+1)/(df+1)) on exact integer counts."""
    d = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark)
    toks = d.select("doc_id", F.explode(_words()).alias("raw")).select(
        "doc_id", F.lower(F.col("raw")).alias("term")
    )
    stats = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf_total"),
        F.countDistinct("doc_id").alias("df"),
    )
    n = d.agg(F.countDistinct("doc_id").alias("n_docs"))
    tfidf = F.round(
        F.col("tf_total") * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))),
        6,
    )
    return (
        stats.crossJoin(F.broadcast(n))
        .select("term", "tf_total", "df", tfidf.alias("tfidf"))
        .orderBy(F.desc("tfidf"), F.asc("term"))
        .limit(TFIDF_TOP)
    )


# ---------------------------------------------------------------------------
# context-window packing
# ---------------------------------------------------------------------------

_PACK_SQL = f"""
WITH sized AS (
  SELECT doc_id, lang, len({_WORDS_SQL}) AS n_tokens FROM documents
),
offsets AS (
  SELECT lang, n_tokens,
         COALESCE(sum(n_tokens) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS off
  FROM sized
)
SELECT lang, CAST(floor(off / {PACK_BUDGET}.0) AS BIGINT) AS chunk_id,
       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
FROM offsets
GROUP BY 1, 2
"""


# Contiguous doc_id ranges per language for distributed packing: the
# prefix sum runs per (lang, range) instead of per lang, so parallelism
# is |langs| x PACK_RANGES rather than a single sorted partition per
# language. Raise with cluster width; correctness is range-count
# independent (equivalence-tested against the single-window form).
PACK_RANGES = 16


def pack_chunks_single_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference single-window packing (one sorted partition per lang) —
    kept as the equivalence oracle for the distributed form below; not
    registered."""
    d = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark)
    sized = d.select("doc_id", "lang", F.size(_words()).alias("n_tokens"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        sized.withColumn("chunk_id", F.floor(off / PACK_BUDGET))
        .groupBy("lang", "chunk_id")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("n_tokens"))
    )


@register("pack_chunks_budget", oracle=_PACK_SQL, tags=("llmprep",))
def pack_chunks_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing (the standard pretraining
    layout): stream each language's docs in doc_id order, assign every
    doc the context window its running token offset lands in
    (chunk = floor(exclusive_prefix_sum / budget)), and report per-chunk
    doc/token counts.

    Distributed prefix sum, not one sorted partition per language:
    doc_ids are cut into PACK_RANGES contiguous ranges (floor-div on a
    broadcast [min,max] span — monotone, so range order == doc_id
    order), each (lang, range) computes its LOCAL exclusive prefix sum
    in parallel, and a tiny per-range token-total frame (|langs| x
    PACK_RANGES rows) supplies each range's global starting offset via
    its own prefix sum + broadcast join back. global_offset =
    range_start + local_offset — the associative fix-up — then
    chunk = floor(global_offset / budget). Identical output to the
    single-window form (equivalence-tested); the heavy window now runs
    |langs| x PACK_RANGES tasks instead of |langs|."""
    d = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark)
    sized = d.select("doc_id", "lang", F.size(_words()).alias("n_tokens"))

    span = sized.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
    width = F.greatest(
        F.ceil((F.col("hi") - F.col("lo") + 1) / F.lit(PACK_RANGES)), F.lit(1)
    )
    ranged = sized.crossJoin(F.broadcast(span)).select(
        "doc_id",
        "lang",
        "n_tokens",
        F.floor((F.col("doc_id") - F.col("lo")) / width).alias("rb"),
    )

    # Per-(lang, range) token totals -> exclusive prefix over rb gives
    # each range's global starting offset. |langs| x PACK_RANGES rows:
    # the window over this frame is negligible at any scale.
    rb_w = (
        Window.partitionBy("lang")
        .orderBy("rb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    range_starts = (
        ranged.groupBy("lang", "rb")
        .agg(F.sum("n_tokens").alias("rb_tokens"))
        .select(
            "lang",
            "rb",
            F.coalesce(F.sum("rb_tokens").over(rb_w), F.lit(0)).alias("range_start"),
        )
    )

    local_w = (
        Window.partitionBy("lang", "rb")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_off = F.coalesce(F.sum("n_tokens").over(local_w), F.lit(0))
    return (
        ranged.join(F.broadcast(range_starts), ["lang", "rb"])
        .withColumn("chunk_id", F.floor((F.col("range_start") + local_off) / PACK_BUDGET))
        .groupBy("lang", "chunk_id")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("n_tokens"))
    )


# ---------------------------------------------------------------------------
# ANN recall evaluation
# ---------------------------------------------------------------------------

_RECALL_SQL = f"""
WITH brute AS ({S._BRUTE_SQL}),
lsh AS ({S._LSH_SQL})
SELECT b.query_id,
       round(count(l.vec_id) * 1.0 / {S.TOP_K}, 6) AS recall
FROM brute b LEFT JOIN lsh l ON b.query_id = l.query_id AND b.vec_id = l.vec_id
GROUP BY b.query_id
"""


@register("ann_recall_eval", oracle=_RECALL_SQL, tags=("llmprep", "similarity"))
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the hyperplane-LSH index against the exact cosine
    baseline, per query: |approx ∩ exact| / k. The evaluation every ANN
    deployment runs before trading recall for the sub-quadratic path.
    Reuses both knn operators' lineages; the join is on (query_id,
    vec_id) — k·|queries| rows per side, negligible at any scale."""
    brute = S.knn_brute_cosine(spark, sf_dir).select("query_id", "vec_id")
    lsh = (
        S.knn_lsh_hyperplane(spark, sf_dir)
        .select("query_id", "vec_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        brute.join(lsh, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(F.round(F.count("hit") / F.lit(float(S.TOP_K)), 6).alias("recall"))
    )


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

BENCH_DOCS = 10          # doc_id < 10 plays the held-out benchmark set
CONTAM_NGRAM = 5

_CONTAM_GRAM_SQL = (
    "(w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5])"
)

_CONTAM_SQL = f"""
WITH words AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents),
bench AS (
  SELECT DISTINCT doc_id, {_CONTAM_GRAM_SQL} AS g
  FROM words, unnest(range(greatest(len(w) - {CONTAM_NGRAM - 1}, 0))) AS t(i)
  WHERE doc_id < {BENCH_DOCS}
),
corpus AS (
  SELECT DISTINCT {_CONTAM_GRAM_SQL} AS g
  FROM words, unnest(range(greatest(len(w) - {CONTAM_NGRAM - 1}, 0))) AS t(i)
  WHERE doc_id >= {BENCH_DOCS}
)
SELECT b.doc_id, count(*) AS n_grams,
       CAST(sum(CASE WHEN c.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       round(sum(CASE WHEN c.g IS NOT NULL THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
         AS contamination
FROM bench b LEFT JOIN corpus c ON b.g = c.g
GROUP BY b.doc_id
"""


@register("benchmark_contamination", oracle=_CONTAM_SQL, tags=("llmprep", "text"))
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination check: for each held-out 'benchmark' document
    (doc_id < BENCH_DOCS), the fraction of its distinct 5-gram shingles
    that occur anywhere in the training corpus. The benchmark shingle
    set is tiny and broadcast; the corpus side is one explode + distinct
    — the join stays an equi-join on the shingle, so at 100 TB the cost
    is the corpus dedup shuffle, not a cross product."""
    d = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark)
    w = _words()
    grams = F.transform(
        ngram_indices(w, CONTAM_NGRAM),
        lambda i: F.concat_ws(" ", *[w[i + j] for j in range(CONTAM_NGRAM)]),
    )
    exploded = d.select("doc_id", F.explode(F.array_distinct(grams)).alias("g"))
    bench = exploded.filter(F.col("doc_id") < BENCH_DOCS)
    # Scale shape: the corpus gram set is unbounded, so never broadcast
    # or even materialize it distinct — semi-join the corpus against the
    # (tiny, broadcast) benchmark gram set first. What survives is at
    # most |bench grams| rows; THAT is small enough to broadcast into
    # the final left join.
    bench_grams = bench.select("g").distinct()
    hit = (
        exploded.filter(F.col("doc_id") >= BENCH_DOCS)
        .join(F.broadcast(bench_grams), "g", "leftsemi")
        .select("g")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        bench.join(F.broadcast(hit), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"),
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.count(F.lit(1)), 6
            ).alias("contamination"),
        )
    )


# ---------------------------------------------------------------------------
# domain mix weighting
# ---------------------------------------------------------------------------

_MIX_SQL = """
WITH by_source AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total, count(*) AS n_sources FROM by_source)
SELECT source, n_docs,
       round(n_docs * 1.0 / total, 6) AS share,
       round((1.0 / n_sources) / (n_docs * 1.0 / total), 6) AS weight
FROM by_source, tot
"""


@register("domain_mix_weights", oracle=_MIX_SQL, tags=("llmprep",))
def domain_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source resampling weights that would equalize the domain mix
    (target share = 1/n_sources): weight = target/actual. The numbers a
    weighted sampler (sample_bernoulli_seeded with per-source rates)
    consumes. One tally + a broadcast scalar join."""
    d = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark)
    by_source = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = by_source.agg(
        F.sum("n_docs").alias("total"), F.count(F.lit(1)).alias("n_sources")
    )
    share = F.col("n_docs") / F.col("total")
    return by_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.round(share, 6).alias("share"),
        F.round((F.lit(1.0) / F.col("n_sources")) / share, 6).alias("weight"),
    )


# ---------------------------------------------------------------------------
# table profiling
# ---------------------------------------------------------------------------

_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")

_PROFILE_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column_name,
       count(*) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       count(DISTINCT {c}) AS n_distinct
FROM documents"""
    for c in _PROFILE_COLS
)


@register("profile_documents", oracle=_PROFILE_SQL, tags=("llmprep",))
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the documents table — row count, null count,
    exact distinct count per column, long-form output. The profiling
    pass every ingest job runs before trusting a new data drop. One scan
    feeding per-column aggregates; at 100 TB swap count(DISTINCT) for
    approx_count_distinct (HLL sketch, one pass, mergeable) — kept exact
    here so the oracle can hash-match."""
    d = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark)
    frames = [
        d.agg(
            F.lit(c).alias("column_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias("n_nulls"),
            F.countDistinct(c).alias("n_distinct"),
        )
        for c in _PROFILE_COLS
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out


# ---------------------------------------------------------------------------
# weighted domain-balanced sampling (mix weights applied as keep-rates)
# ---------------------------------------------------------------------------

_BALANCED_SQL = f"""
WITH by_source AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total, count(*) AS n_sources FROM by_source),
rates AS (
  SELECT source,
         least((1.0 / n_sources) / (n_docs * 1.0 / total), 1.0) AS keep_rate
  FROM by_source, tot
)
SELECT d.source, CAST(count(*) AS BIGINT) AS n_kept
FROM documents d JOIN rates r ON d.source = r.source
WHERE {X.md5_long_sql("CAST(d.doc_id AS VARCHAR)")} % 1000000 < CAST(r.keep_rate * 1000000 AS BIGINT)
GROUP BY d.source
"""


@register("sample_domain_balanced", oracle=_BALANCED_SQL, tags=("llmprep",))
def sample_domain_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """domain_mix_weights applied: each source's equalizing weight
    (capped at 1 — undersampled domains keep everything) becomes a
    deterministic hash-threshold keep-rate, yielding an approximately
    uniform domain mix in one pass. The rates frame is |sources| rows,
    broadcast; the keep decision is a pure map-side predicate — the
    two-job shape (tiny tally, then filtered scan) any weighted
    downsampler has at 100 TB."""
    d = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark)
    by_source = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = by_source.agg(
        F.sum("n_docs").alias("total"), F.count(F.lit(1)).alias("n_sources")
    )
    rates = by_source.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            (F.lit(1.0) / F.col("n_sources")) / (F.col("n_docs") / F.col("total")),
            F.lit(1.0),
        ).alias("keep_rate"),
    )
    keep = X.md5_long(F.col("doc_id").cast("string")) % 1_000_000 < (
        F.col("keep_rate") * 1_000_000
    ).cast("bigint")
    return (
        d.join(F.broadcast(rates), "source")
        .filter(keep)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
