"""Small-files compaction for partitioned parquet datasets.

The operational tax of every streaming/incremental writer (the rollup
sink, foreachBatch appends, per-trigger micro-batches) is file-count
growth: thousands of KB-sized parquet files per partition turn every
downstream scan into an open/footer-parse storm. At 100 TB the fix is a
periodic compaction pass that rewrites each partition's files into few
right-sized ones WITHOUT changing content, partitioning, or readers'
paths.

No table format (Delta/Iceberg) is available here, so the swap is the
classic tmp-dir + atomic rename per partition: readers see either the
old file set or the new one, never a mix (rename within a filesystem is
atomic; on object stores this step becomes a manifest/format concern —
documented, not simulated).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession


def plan_compaction(
    spark: SparkSession,
    path: str,
    partition_col: str,
    max_files_per_partition: int = 1,
) -> list[str]:
    """List partition directories whose parquet file count exceeds the
    target — the cheap metadata-only scan that decides what to rewrite
    (compacting everything every time would rewrite the whole table)."""
    out = []
    for entry in sorted(os.listdir(path)):
        if not entry.startswith(f"{partition_col}="):
            continue
        pdir = os.path.join(path, entry)
        n = sum(1 for f in os.listdir(pdir) if f.endswith(".parquet"))
        if n > max_files_per_partition:
            out.append(entry)
    return out


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str,
    partitions: list[str],
    target_files: int = 1,
) -> int:
    """Rewrite each named partition's files into `target_files` parquet
    files with identical content, swapping via tmp-dir + rename.
    Returns the number of partitions rewritten. Each partition is
    processed independently (on a cluster these are independent jobs —
    trivially parallelizable; a failure mid-pass leaves every other
    partition untouched and the failed one still readable from its old
    files)."""
    done = 0
    for entry in partitions:
        pdir = os.path.join(path, entry)
        tmp = os.path.join(path, f"_compact_tmp_{uuid.uuid4().hex[:8]}")
        (
            spark.read.parquet(pdir)
            .repartition(target_files)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        old = os.path.join(path, f"_compact_old_{uuid.uuid4().hex[:8]}")
        os.rename(pdir, old)
        os.rename(tmp, pdir)
        shutil.rmtree(old)
        # Spark leaves a _SUCCESS marker; harmless, but drop it so the
        # partition dir contains only data files like the writer's own
        # dynamic-overwrite output.
        marker = os.path.join(pdir, "_SUCCESS")
        if os.path.exists(marker):
            os.remove(marker)
        done += 1
    return done
