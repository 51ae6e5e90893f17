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


def recover_compaction(path: str) -> int:
    """Repair any swap interrupted by a crash before running a new pass.

    The swap protocol below uses deterministic sidecar names
    (``_compact_tmp_<partition>`` / ``_compact_old_<partition>``), so an
    interrupted state is always one of three recognizable shapes:

    - tmp present, live partition present (crash before the swap began):
      the tmp write may be incomplete — discard it; the live dir was
      never touched.
    - old present, live partition missing (crash mid-swap): if the tmp
      dir exists and carries Spark's ``_SUCCESS`` marker the rewrite is
      known-complete — finish the swap forward; otherwise roll back by
      restoring the old dir.
    - old present, live partition present (crash after the swap, before
      cleanup): the new files are live — just delete the old dir.

    Returns the number of repairs performed. Idempotent and safe to call
    unconditionally."""
    repairs = 0
    for entry in sorted(os.listdir(path)):
        if not entry.startswith("_compact_old_"):
            continue
        part = entry[len("_compact_old_"):]
        old = os.path.join(path, entry)
        pdir = os.path.join(path, part)
        tmp = os.path.join(path, f"_compact_tmp_{part}")
        if os.path.exists(pdir):
            shutil.rmtree(old)  # swap completed; cleanup didn't run
        elif os.path.exists(os.path.join(tmp, "_SUCCESS")):
            os.rename(tmp, pdir)  # rewrite complete: roll forward
            # drop the marker, same as compact_partitions' normal path,
            # preserving the "partition dir contains only data files"
            # invariant on the recovered dir too
            os.remove(os.path.join(pdir, "_SUCCESS"))
            shutil.rmtree(old)
        else:
            os.rename(old, pdir)  # roll back to the original files
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
        repairs += 1
    for entry in sorted(os.listdir(path)):
        if not entry.startswith("_compact_tmp_"):
            continue
        part = entry[len("_compact_tmp_"):]
        if os.path.exists(os.path.join(path, part)):
            shutil.rmtree(os.path.join(path, entry))  # stale pre-swap tmp
            repairs += 1
    return repairs


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
    partition untouched). A crash inside the two-rename swap window
    leaves the partition path briefly missing, but the deterministic
    sidecar names make the state fully recoverable: the next pass calls
    :func:`recover_compaction` first, which rolls the swap forward when
    the rewrite is proven complete (tmp ``_SUCCESS`` marker) and rolls
    it back to the original files otherwise — no data is ever stranded."""
    recover_compaction(path)
    done = 0
    for entry in partitions:
        swap_rewrite(
            spark.read.parquet(os.path.join(path, entry)).repartition(target_files),
            path,
            entry,
        )
        done += 1
    return done


def swap_rewrite(df, path: str, entry: str) -> None:
    """Write `df` as partition `entry`'s new file set through the
    crash-safe tmp/old rename swap (the protocol recover_compaction
    repairs): tmp write → rename live→old → rename tmp→live → delete
    old. Shared by compaction (content-identical rewrite) and forget
    (keyed-delete rewrite) — any caller that crashes mid-swap is
    repaired by the next recover_compaction pass because the sidecar
    names and the `_SUCCESS` completeness proof are identical."""
    pdir = os.path.join(path, entry)
    tmp = os.path.join(path, f"_compact_tmp_{entry}")
    old = os.path.join(path, f"_compact_old_{entry}")
    df.write.mode("overwrite").parquet(tmp)
    os.rename(pdir, old)
    os.rename(tmp, pdir)
    shutil.rmtree(old)
    # Spark leaves a _SUCCESS marker; it served as the rewrite-
    # complete proof during the swap — drop it now so the partition
    # dir contains only data files like the writer's own
    # dynamic-overwrite output.
    marker = os.path.join(pdir, "_SUCCESS")
    if os.path.exists(marker):
        os.remove(marker)
