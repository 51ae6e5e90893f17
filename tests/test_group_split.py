"""split_group_aware: the structural no-leakage guarantee — every
near-dup pair lands in ONE split, and unclustered docs get exactly the
same assignment as the naive per-doc split."""

from __future__ import annotations

from pyspark.sql import functions as F

from k8s_log_etl_spark.functions import xengine as X
from k8s_log_etl_spark.queries.dedup import dedup_simhash_banded, group_splits
from k8s_log_etl_spark.queries.llmprep import TRAIN_PCT, VAL_PCT


def test_no_near_dup_pair_straddles_splits(spark, sf_dir):
    splits = group_splits(spark, sf_dir).select("doc_id", "split")
    pairs = dedup_simhash_banded(spark, sf_dir).select("doc_a", "doc_b")
    assert pairs.count() > 0  # fixture must actually exercise the guard
    straddlers = (
        pairs.join(
            splits.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa")),
            "doc_a",
        )
        .join(
            splits.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb")),
            "doc_b",
        )
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert straddlers == 0


def test_unclustered_docs_keep_the_naive_assignment(spark, sf_dir):
    g = group_splits(spark, sf_dir)
    bucket = X.md5_long(F.col("doc_id").cast("string")) % 100
    naive = (
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < VAL_PCT, "val")
        .otherwise("test")
    )
    diverged = (
        g.filter(F.col("cluster").isNull())
        .filter(F.col("split") != naive)
        .count()
    )
    assert diverged == 0
