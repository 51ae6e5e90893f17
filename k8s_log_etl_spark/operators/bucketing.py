"""Bucketed tables: shuffle-free co-located joins (charter:
"co-locate joins via bucketing or pre-partitioning").

`ensure_bucketed` materializes a table bucketed by the join key into a
local Spark warehouse once per (table, key, buckets); repeated joins on
that key then read both sides pre-partitioned and the SortMergeJoin
plans with ZERO Exchange operators — the cluster pattern where a fact
table is written bucketed once and joined many times. The
materialization is the amortized one-time cost, exactly as on a real
warehouse.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from k8s_log_etl_spark.tables import load_table


def ensure_bucketed(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    key: str,
    buckets: int = 8,
) -> DataFrame:
    """Return `table` as a bucketed saved table (created on first use)."""
    name = f"b_{table}_{key}_{buckets}"
    if not spark.catalog.tableExists(name):
        # A fresh in-memory catalog may not know a table whose files a
        # previous session left in the warehouse — clear the stale
        # location (it is derived data) before re-creating.
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        stale = os.path.join(warehouse.removeprefix("file:"), name.lower())
        if os.path.exists(stale):
            shutil.rmtree(stale)
        (
            load_table(spark, sf_dir, table)
            .write.bucketBy(buckets, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(name)
        )
    return spark.table(name)


def bucketed_join(
    spark: SparkSession, sf_dir: str, left: str, right: str, key_left: str, key_right: str,
    buckets: int = 8,
) -> DataFrame:
    """Join two tables bucketed on their join keys — no shuffle on
    either side (verify: the physical plan has no Exchange)."""
    l = ensure_bucketed(spark, sf_dir, left, key_left, buckets)
    r = ensure_bucketed(spark, sf_dir, right, key_right, buckets)
    return l.join(r, l[key_left] == r[key_right])
