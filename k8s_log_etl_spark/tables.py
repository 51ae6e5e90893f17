"""Loaders for the driver-provisioned parquet tables.

Tables (TPC-H-ish star schema + events/documents/embeddings) live at
``{sf_dir}/{name}.parquet``. Reading through ``spark.read.parquet`` keeps
predicate pushdown / column pruning / partition-size splitting — at
100 TB these scans split by ``spark.sql.files.maxPartitionBytes`` across
executors for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.ts arrives as parquet TIMESTAMP(NANOS) in some data drops
        # (Spark rejects it without the legacy flag) and TIMESTAMP(MICROS)
        # in others (read as TIMESTAMP_NTZ). Normalize either to a
        # session-tz TimestampType; session tz is UTC so the NTZ cast is
        # value-preserving and matches what DuckDB reads.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif not isinstance(ts_type, T.TimestampType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def ensure_min_parallelism(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Repartition a scan whose split count is below the session's core
    count. The driver's test parquet is one row-group per table, so every
    scan is otherwise a single task and the whole (shuffle-free) pipeline
    runs on one core. At production scale input splits far exceed
    parallelism and this is a no-op — the policy costs one cheap narrow
    check (`getNumPartitions`, no job)."""
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so operators can be written in
    Spark SQL where that is clearer than the DataFrame API."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
