"""Streaming MERGE-upsert sink: the continuous face of
operators.merge.merge_upsert.

A foreachBatch sink that folds each micro-batch of change rows
(upserts + delete markers) into a versioned parquet store — the
pattern Delta's streaming MERGE INTO implements with a table format,
rebuilt here on plain directories with the same replay discipline the
other streaming stores use (streaming/ingest.py, streaming/rollup.py):

* the store is a chain of immutable version directories ``v=<batch_id>``;
* batch ``b`` reads the newest version STRICTLY OLDER than ``b`` (so a
  replayed batch never reads its own partial output), applies the
  deterministic merge, and overwrites ``v=b`` whole — a crash anywhere
  before the checkpoint commit replays into a byte-identical rewrite;
* versions older than the direct parent are pruned after a successful
  write (two-version retention bounds storage without breaking replay).

Scale shape: each micro-batch costs ONE keyed full-outer join of the
delta against the current version (AQE broadcasts the delta side) and
one store rewrite. A table format would replace the whole-store
rewrite with file-level copy-on-write; the merge JOIN — the part this
module owns — is already the scale-correct shape.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from k8s_log_etl_spark.operators.merge import merge_upsert

_V_RE = re.compile(r"^v=(\d+)$")


def _versions(store_dir: str) -> list[int]:
    if not os.path.isdir(store_dir):
        return []
    out = []
    for name in os.listdir(store_dir):
        m = _V_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def read_store(
    spark: SparkSession, store_dir: str, as_of: int | None = None
) -> DataFrame | None:
    """The table state: the newest version, or — TIME TRAVEL — the
    newest version at or below `as_of` (a batch id). Versions are
    immutable once written, so an as-of read is a plain scan of one
    directory; retention bounds how far back travel reaches (the
    parent of the head is always kept)."""
    vs = _versions(store_dir)
    if as_of is not None:
        vs = [v for v in vs if v <= as_of]
    if not vs:
        return None
    return spark.read.parquet(os.path.join(store_dir, f"v={vs[-1]}"))


def merge_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    store_dir: str,
    keys: list[str],
    delete_col: str = "is_delete",
) -> None:
    """Fold one change micro-batch into the store (the foreachBatch
    body, callable directly for replay tests)."""
    parents = [v for v in _versions(store_dir) if v < batch_id]
    value_cols = [c for c in batch_df.columns if c != delete_col]
    if parents:
        base = spark.read.parquet(os.path.join(store_dir, f"v={parents[-1]}"))
    else:
        base = spark.createDataFrame([], batch_df.drop(delete_col).schema)
    # within-batch last-wins is the caller's contract; change feeds are
    # keyed upstream — here we only require one row per key, enforced
    # cheaply (max over a full-row struct is deterministic)
    others = [c for c in batch_df.columns if c not in keys]
    one_per_key = (
        batch_df.groupBy(*keys)
        .agg(F.max(F.struct(*others)).alias("r"))
        .select(*keys, *[F.col(f"r.{c}").alias(c) for c in others])
    )
    nxt = (
        merge_upsert(base.select(*value_cols), one_per_key, keys, delete_col)
        .filter(F.col("action") != "deleted")
        .drop("action")
    )
    out = os.path.join(store_dir, f"v={batch_id}")
    nxt.write.mode("overwrite").parquet(out)
    # prune everything older than the direct parent of the version just
    # written — replay of THIS batch only ever needs that parent
    for v in parents[:-1]:
        shutil.rmtree(os.path.join(store_dir, f"v={v}"), ignore_errors=True)


def start_merge_stream(
    spark: SparkSession,
    changes: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    delete_col: str = "is_delete",
) -> StreamingQuery:
    """Wire a streaming change feed into the versioned merge store."""
    return (
        changes.writeStream.foreachBatch(
            lambda df, bid: merge_batch(
                spark, df, bid, store_dir, keys, delete_col
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
