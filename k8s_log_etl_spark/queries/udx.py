"""Custom-function surface beyond built-ins (§2b "UDF/UDAF/UDTF"):
the reference's only extension point is the row→row Transform plugin
(O8); Spark's full taxonomy is demonstrated here with one operator per
kind, each on the slow-path-by-necessity rule — the surrounding plan
stays JVM-side and only the custom kernel crosses into Python over
Arrow.

* scalar / map kind  → Arrow mapInPandas decode (operators/multimodal.py)
* grouped aggregate  → pandas_udf GROUPED_AGG (`udaf_embedding_norm`)
* table function     → @udtf row expander (`udtf_sentence_split`)
* grouped map        → applyInPandas centroids (queries/similarity.py)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from k8s_log_etl_spark.plans.registry import register
from k8s_log_etl_spark.tables import ensure_min_parallelism, load_table

# ---------------------------------------------------------------------------
# grouped-aggregate pandas UDF (UDAF)
# ---------------------------------------------------------------------------

_NORM_SQL = """
SELECT label,
       count(*) AS n_vecs,
       round(avg(sqrt(list_reduce(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b))), 6)
         AS avg_l2_norm
FROM embeddings
GROUP BY label
"""


@register("udaf_embedding_norm", oracle=_NORM_SQL, tags=("udx", "similarity"))
def udaf_embedding_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average embedding L2 norm per label through a GROUPED_AGG
    pandas_udf — the custom-aggregate (UDAF) extension surface. The
    group-by shuffle and count stay JVM-side; only the norm kernel runs
    in Python, one Arrow batch per group. (A production build would use
    the built-in `aggregate` expression — this op exists to keep the
    UDAF path exercised and tested.)"""
    import numpy as np
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # functionType given explicitly: `from __future__ import annotations`
    # stringifies the (emb: pd.Series) -> float hints pandas_udf would
    # otherwise infer GROUPED_AGG from.
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def avg_l2(emb):
        mat = np.vstack(emb.to_numpy()).astype("float64")
        return float(np.sqrt((mat * mat).sum(axis=1)).mean())

    from k8s_log_etl_spark.queries.similarity import load_vectors
    e = load_vectors(spark, sf_dir)
    # Spark disallows mixing a GROUPED_AGG pandas UDF with JVM aggregates
    # in one agg() — the scalar count comes from its own (tiny) tally,
    # broadcast back onto the per-label result.
    norms = e.groupBy("label").agg(F.round(avg_l2("embedding"), 6).alias("avg_l2_norm"))
    counts = e.groupBy("label").agg(F.count(F.lit(1)).alias("n_vecs"))
    return norms.join(F.broadcast(counts), "label").select(
        "label", "n_vecs", "avg_l2_norm"
    )


# ---------------------------------------------------------------------------
# Python UDTF (table function)
# ---------------------------------------------------------------------------

_SENT_SQL = """
WITH sp AS (
  SELECT doc_id, string_split(text, '.') AS parts FROM documents WHERE doc_id < 5
),
parts AS (
  SELECT doc_id, trim(unnest(parts)) AS sentence,
         CAST(generate_subscripts(parts, 1) - 1 AS INTEGER) AS pos
  FROM sp
)
SELECT doc_id, pos, sentence, CAST(len(sentence) AS INTEGER) AS n_chars
FROM parts WHERE sentence <> ''
"""


@register("udtf_sentence_split", oracle=_SENT_SQL, tags=("udx", "text"))
def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence expansion through a Python UDTF (one input row → N
    output rows with position) — the table-function extension surface,
    applied per-row via LATERAL JOIN so it partitions like any
    projection. Restricted to 5 docs: the op demonstrates the surface;
    bulk splitting belongs in `split`+`posexplode` (built-in, JVM-side),
    which the oracle mirrors."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, sentence string, n_chars int")
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return
            for pos, raw in enumerate(text.split(".")):
                # strip(' ') not strip(): DuckDB trim() removes spaces
                # only, Python's bare strip() also removes tabs/newlines
                # — both engines must trim the same character set.
                s = raw.strip(" ")
                if s:
                    yield pos, s, len(s)

    # Positions must match the oracle's ordinality over ALL splits —
    # enumerate counts every '.'-delimited part, emit only non-empty.
    # (pos is the part index, not the emitted-row index: re-number
    # before comparing if the semantics ever change.)
    d = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    docs = d.filter(F.col("doc_id") < 5).select("doc_id", "text")
    docs.createOrReplaceTempView("udtf_docs_in")
    spark.udtf.register("sentence_split", SentenceSplit)
    return spark.sql(
        "SELECT doc_id, pos, sentence, n_chars "
        "FROM udtf_docs_in, LATERAL sentence_split(text)"
    )
