"""dedup_key_within_watermark: restamped retries (same key, DIFFERENT
event time) are suppressed — the case the exact (key, ts)
dropDuplicates twin cannot catch — while distinct keys all survive."""

from __future__ import annotations

import json
import os

from k8s_log_etl_spark.streaming.pipeline import dedup_key_within_watermark

ROWS = [
    # (event_id, ts, v) — event 1 retried twice with restamped times,
    # event 2 retried once, events 3-4 unique
    (1, "2024-01-01T10:00:00", "a"),
    (2, "2024-01-01T10:00:05", "b"),
    (1, "2024-01-01T10:00:30", "a-retry"),   # restamped duplicate
    (3, "2024-01-01T10:01:00", "c"),
    (2, "2024-01-01T10:01:10", "b-retry"),   # restamped duplicate
    (1, "2024-01-01T10:02:00", "a-retry2"),  # restamped duplicate
    (4, "2024-01-01T10:03:00", "d"),
]


def test_restamped_retries_suppressed(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    # two micro-batches split mid-stream: retries cross batch boundaries
    for i, chunk in enumerate((ROWS[:4], ROWS[4:])):
        p = os.path.join(in_dir, f"b{i}.jsonl")
        with open(p, "w") as f:
            for eid, ts, v in chunk:
                f.write(json.dumps({"event_id": eid, "ts": ts, "v": v}) + "\n")
        os.utime(p, (1_700_000_000 + i * 60,) * 2)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, v string")
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
    )
    q = (
        dedup_key_within_watermark(stream, ["event_id"], watermark="1 hour")
        .writeStream.format("memory")
        .queryName("key_dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["event_id"]: r["v"]
        for r in spark.sql("SELECT event_id, v FROM key_dedup_stream").collect()
    }
    # first arrival per key wins; every retry (all restamped) suppressed
    assert got == {1: "a", 2: "b", 3: "c", 4: "d"}
