"""Keyed delete propagation ("right to be forgotten") over partitioned
parquet stores.

A 100 TB corpus must honor deletion requests (GDPR erasure, DMCA
takedowns, opt-outs) without rewriting the world: given a frame of
keys to forget, rewrite ONLY the partitions that actually contain
them, through the same crash-safe tmp/old rename swap compaction uses
(operators/compaction.py — identical sidecar names, so an interrupted
forget is repaired by the very same `recover_compaction` pass, roll-
forward when the rewrite proved complete, roll-back otherwise).

Scale shape: the planning scan is ONE keyed semi-join of the store
against the (small) forget-key frame, aggregated to distinct partition
values — the store shuffles nothing (the key frame broadcasts in the
common case); the rewrite then touches affected partitions only, each
an independent job. The deletion itself is a keyed anti-join per
affected partition — never a full-table rewrite, never a row-at-a-time
update.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from k8s_log_etl_spark.operators.compaction import recover_compaction, swap_rewrite
from k8s_log_etl_spark.tables import spill_checkpoint

# Characters Hive/Spark URL-escape in partition directory names
# (Hive FileUtils.escapePathName, mirrored by Spark's
# ExternalCatalogUtils.escapePathName — public source): all control
# chars plus this printable set. Everything else (including space)
# passes through literally; escapes are uppercase %XX.
_HIVE_ESCAPE_CHARS = set('"#%\'*/:=?\\{[]^\x7f') | {chr(c) for c in range(0x20)}


def escape_partition_value(value: object) -> str:
    """Render a partition value the way Spark names the directory:
    NULL becomes __HIVE_DEFAULT_PARTITION__, special characters are
    %XX-escaped (round-5 ADVICE — a raw f-string breaks on values
    containing '/', '%', '=', ... because the computed entry never
    matches the on-disk directory and the swap fails mid-pass)."""
    if value is None:
        return "__HIVE_DEFAULT_PARTITION__"
    s = str(value)
    return "".join(
        f"%{ord(ch):02X}" if ch in _HIVE_ESCAPE_CHARS else ch for ch in s
    )


def plan_forget(
    spark: SparkSession,
    path: str,
    partition_col: str,
    keys: DataFrame,
    key_col: str,
) -> list[str]:
    """Partition directories (``col=value`` names) containing at least
    one to-be-forgotten key — the metadata step that bounds the
    rewrite. One pruned-column scan + keyed semi-join + tiny distinct
    aggregate."""
    store = spark.read.parquet(path).select(partition_col, key_col)
    vals = (
        store.join(F.broadcast(keys.select(key_col).distinct()), key_col, "leftsemi")
        .select(partition_col)
        .distinct()
        .collect()
    )
    entries = sorted(
        f"{partition_col}={escape_partition_value(r[partition_col])}" for r in vals
    )
    # Fail the whole plan up front if any computed entry doesn't name a
    # real directory — a mid-pass FileNotFoundError inside swap_rewrite
    # would strand a tmp dir (round-5 ADVICE).
    missing = [e for e in entries if not os.path.isdir(os.path.join(path, e))]
    if missing:
        raise FileNotFoundError(
            f"planned partition entries not found under {path}: {missing}"
        )
    return entries


def apply_forget(
    spark: SparkSession,
    path: str,
    partition_col: str,
    keys: DataFrame,
    key_col: str,
) -> dict[str, int]:
    """Delete all rows carrying a forget key, rewriting only the
    partitions `plan_forget` names via the crash-safe swap. Returns
    {"partitions": rewritten, "rows_deleted": n}. Idempotent: a second
    pass plans zero partitions. Untouched partitions keep their files
    byte-identical (pinned in tests/test_forget.py)."""
    recover_compaction(path)
    kd = spill_checkpoint(keys.select(key_col).distinct())
    todo = plan_forget(spark, path, partition_col, kd, key_col)
    deleted = 0
    for entry in todo:
        pdir = os.path.join(path, entry)
        before = spark.read.parquet(pdir)
        kept = spill_checkpoint(
            before.join(F.broadcast(kd), key_col, "left_anti")
        )  # full surviving partition: data-sized
        deleted += before.count() - kept.count()
        swap_rewrite(kept, path, entry)
    return {"partitions": len(todo), "rows_deleted": deleted}
