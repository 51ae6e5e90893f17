"""Fixed-dim unroll contract (round-13 verdict #1/#2, round-13 ADVICE).

The round-13 optimization unrolled the zip_with/aggregate dot products
into `try_element_at` SQL chains (xengine.dot_fixed_sql and the
hyperplane/bucket twins). Two properties must hold and stay pinned:

1. A vector that VIOLATES the fixed-dim ingest contract (shorter than
   the pinned dim) must yield a NULL score — the old lambda fold's
   behavior — not an ANSI out-of-bounds job failure, and
   ``load_vectors``'s sq_norm > 0 ingest guard must then drop the row.
2. The codegen JVM flags must be mirrored to the EXECUTOR JVMs: in
   local mode driver == executor so the driver flags suffice, but on a
   cluster the generated code runs on executors — without the mirror
   every >8000-bytecode codegen'd method (exactly these unrolled
   chains) would run interpreted where the data is.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from k8s_log_etl_spark.functions import xengine as X


def test_dot_fixed_sql_nulls_not_throws_on_short_array(spark):
    """A contract-violating (short) vector scores NULL — bit-compatible
    with the pre-r13 zip_with/aggregate fold, which null-padded the
    shorter side — instead of throwing under ANSI mode."""
    df = spark.createDataFrame(
        [(1, [1.0] * 4), (2, [1.0, 2.0])],  # row 2 violates dim=4
        "id INT, v ARRAY<DOUBLE>",
    )
    out = (
        df.select("id", F.expr(X.dot_fixed_sql("v", "v", 4)).alias("d"))
        .orderBy("id")
        .collect()
    )
    assert out[0]["d"] == pytest.approx(4.0)
    assert out[1]["d"] is None  # NULL propagation, no exception


def test_load_vectors_drops_contract_violating_rows(spark, tmp_path):
    """load_vectors' ingest guard (NULL / zero-norm / short embedding):
    malformed rows are dropped at ingest, conforming rows survive —
    the 'silently dropped row' semantics the round-13 verdict asked to
    pin, with no job failure."""
    from k8s_log_etl_spark.queries.similarity import DIM, load_vectors

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    rows = [
        (0, [1.0] * DIM, 1),          # conforming
        (1, [0.0] * DIM, 1),          # zero norm -> dropped
        (2, None, 1),                 # NULL embedding -> dropped
        (3, [1.0] * (DIM - 5), 1),    # SHORT: violates dim contract -> dropped
        (4, [2.0] * DIM, 0),          # conforming
    ]
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "embeddings.parquet")
    )
    kept = sorted(
        r["vec_id"] for r in load_vectors(spark, str(tmp_path)).collect()
    )
    assert kept == [0, 4]


def test_codegen_jvm_flags_mirrored_to_executors(spark):
    """The huge-method/code-cache JVM flags are set for BOTH driver and
    executor JVMs (round-13 verdict #1): visible in the live session
    conf; local-mode-neutral by construction, cluster-real by intent."""
    for key in ("spark.driver.extraJavaOptions", "spark.executor.extraJavaOptions"):
        opts = spark.sparkContext.getConf().get(key, "")
        assert "-XX:-DontCompileHugeMethods" in opts, key
        assert "-XX:ReservedCodeCacheSize=512m" in opts, key
