"""streaming/changepoint.py: the streamed hourly count table + the
shared read-side detector must be VALUE-IDENTICAL to the batch
events_changepoint_cusum on the same data — the feed arrives over
three micro-batches and every (mean, alarm count, first alarm, max
cusum) row matches the batch output."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from k8s_log_etl_spark.queries.streaming_batch import events_changepoint_cusum
from k8s_log_etl_spark.streaming.changepoint import (
    cusum_from_hourly,
    streaming_hourly_counts,
)
from k8s_log_etl_spark.tables import load_table


def test_streamed_cusum_matches_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.col("ts").cast("string").alias("ts"), "event_type"
    )

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    rows = ev.collect()
    third = (len(rows) + 2) // 3
    for i in range(3):
        p = os.path.join(in_dir, f"b{i}.jsonl")
        with open(p, "w") as f:
            for r in rows[i * third : (i + 1) * third]:
                f.write(
                    json.dumps(
                        {
                            "event_id": r["event_id"],
                            "ts": r["ts"],
                            "event_type": r["event_type"],
                        }
                    )
                    + "\n"
                )
        os.utime(p, (1_700_000_000 + i * 60,) * 2)

    stream = (
        spark.readStream.schema("event_id long, ts string, event_type string")
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
    )
    q = (
        streaming_hourly_counts(stream)
        .writeStream.format("memory")
        .queryName("cusum_hourly_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # localCheckpoint: cusum_from_hourly self-joins its input (hourly
    # vs the per-type mean derived from it); Spark's relation dedup
    # chokes on two references to the same MemoryPlan view (INTERNAL_
    # ERROR "conflicting references in Join"), so materialize the tiny
    # streamed table first — the production read side does the same
    # read-from-store step.
    live = spark.sql(
        "SELECT event_type, hour_start, x FROM cusum_hourly_stream"
    ).localCheckpoint()

    got = sorted(map(tuple, cusum_from_hourly(live).collect()))
    want = sorted(map(tuple, events_changepoint_cusum(spark, sf_dir).collect()))
    assert got == want
    assert len(got) > 0
