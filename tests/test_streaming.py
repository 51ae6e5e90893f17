"""Structured Streaming tests: the streaming pipeline over a JSONL
directory must agree exactly with the batch lineage (same column
expressions), windowed counts with watermark must match the batch
window query, and graceful stop must drain (reference O26,
pipeline_test.go semantics)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from k8s_log_etl_spark.config import PipelineConfig
from k8s_log_etl_spark.fixtures import LOG_LINES

FIXTURE_LINES = [value for _, value in LOG_LINES]
from k8s_log_etl_spark.operators import lognorm
from k8s_log_etl_spark.streaming import pipeline as SP

CFG = PipelineConfig()


@pytest.fixture()
def jsonl_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    # two files → at least two potential micro-batches
    half = len(FIXTURE_LINES) // 2
    (d / "a.jsonl").write_text("\n".join(FIXTURE_LINES[:half]) + "\n")
    (d / "b.jsonl").write_text("\n".join(FIXTURE_LINES[half:]) + "\n")
    return str(d)


def test_stream_matches_batch(spark, jsonl_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream_df = SP.stream_pipeline(spark, jsonl_dir, CFG, max_files_per_trigger=1)
    q = SP.start_file_sink(stream_df, out, ckpt, CFG)
    q.awaitTermination(120)
    assert not q.isActive

    got = sorted(
        json.loads(line)["Message"]
        for p in os.listdir(out)
        if p.startswith("part-")
        for line in open(os.path.join(out, p)).read().splitlines()
    )

    batch = lognorm.written_records(
        lognorm.run_pipeline(spark.read.text(jsonl_dir), CFG)
    )
    want = sorted(r["message"] for r in batch.select("message").collect())
    assert got == want


def test_stream_windowed_counts_match_batch(spark, jsonl_dir, tmp_path):
    stream_df = SP.stream_pipeline(spark, jsonl_dir, CFG)
    windowed = SP.windowed_level_counts(stream_df)
    q = (
        windowed.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["level"]): r["n_events"]
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = SP.windowed_level_counts(lognorm.run_pipeline(spark.read.text(jsonl_dir), CFG))
    want = {
        (r["window_start"], r["level"]): r["n_events"] for r in batch.collect()
    }
    assert got == want and want


def test_stream_dedup_within_watermark(spark, tmp_path):
    d = tmp_path / "dup_in"
    d.mkdir()
    line = '{"ts":"2024-01-01T10:00:00Z","level":"error","msg":"dup","trace_id":"t-1"}'
    other = '{"ts":"2024-01-01T10:01:00Z","level":"error","msg":"other","trace_id":"t-2"}'
    (d / "a.jsonl").write_text(line + "\n" + other + "\n")
    (d / "b.jsonl").write_text(line + "\n")  # duplicate delivery

    stream_df = SP.stream_pipeline(spark, str(d), CFG)
    deduped = SP.dedup_within_watermark(stream_df)
    q = (
        deduped.select("trace_id", "message")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM dedup_out").collect()
    assert sorted(r["trace_id"] for r in rows) == ["t-1", "t-2"]


def test_graceful_stop(spark, jsonl_dir, tmp_path):
    stream_df = SP.stream_pipeline(spark, jsonl_dir, CFG)
    q = SP.start_file_sink(
        stream_df,
        str(tmp_path / "out2"),
        str(tmp_path / "ckpt4"),
        CFG,
        trigger_once=False,  # continuous trigger — must be stopped
    )
    assert SP.stop_gracefully(q, timeout_sec=60.0)
    assert not q.isActive


def test_watermark_drops_late_data(spark, tmp_path):
    """Once the watermark has closed and emitted a window (append mode),
    a row for that window arriving in a LATER micro-batch must be
    dropped — its state is gone and the window must not re-emit.
    (Within an open window Spark may still absorb late rows — the
    watermark guarantees eviction, not strict admission.)"""
    d = tmp_path / "late_in"
    d.mkdir()
    # batch 0: the 10:00 window's rows plus a 12:00 row to pull the
    # watermark forward
    (d / "a.jsonl").write_text(
        "\n".join(
            [
                '{"ts":"2024-01-01T10:05:00Z","level":"error","msg":"w1-a"}',
                '{"ts":"2024-01-01T10:20:00Z","level":"error","msg":"w1-b"}',
                '{"ts":"2024-01-01T12:00:00Z","level":"error","msg":"w3"}',
            ]
        )
    )
    # batch 1: advances the watermark past 11:00 -> 10:00 window evicted
    (d / "b.jsonl").write_text('{"ts":"2024-01-01T12:05:00Z","level":"error","msg":"w3-b"}\n')
    # batch 2: a very late row for the already-evicted 10:00 window
    (d / "c.jsonl").write_text('{"ts":"2024-01-01T10:30:00Z","level":"error","msg":"late"}\n')
    # the file source orders batches by modification time — pin it
    for i, name in enumerate(["a.jsonl", "b.jsonl", "c.jsonl"]):
        os.utime(d / name, (1000000000 + i * 100,) * 2)

    stream_df = SP.stream_pipeline(spark, str(d), CFG, max_files_per_trigger=1)
    windowed = SP.windowed_level_counts(stream_df, watermark="10 minutes", window="1 hour")
    q = (
        windowed.writeStream.format("memory")
        .queryName("late_counts")
        .outputMode("append")  # append only emits windows the watermark closed
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    hour10 = [
        r["n_events"]
        for r in spark.sql("SELECT * FROM late_counts").collect()
        if r["window_start"].hour == 10
    ]
    # exactly one emission of the 10:00 window, with only the 2 on-time
    # rows — the post-eviction late row neither re-emits nor re-counts
    assert hour10 == [2]
