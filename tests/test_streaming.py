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


def test_stream_static_enrichment_matches_batch(spark, jsonl_dir, tmp_path):
    """Stream-static join: per-service owner dim joined into the stream
    must equal the batch join over the same inputs."""
    dim = spark.createDataFrame(
        [("orders", "team-a"), ("payments", "team-b"), ("gateway", "team-c")],
        "service string, owner string",
    )
    stream_df = SP.stream_pipeline(spark, jsonl_dir, CFG)
    enriched = SP.enrich_with_dim(stream_df, dim).select("message", "service", "owner")
    q = (
        enriched.writeStream.format("memory")
        .queryName("enriched_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["message"], r["service"], r["owner"])
        for r in spark.sql("SELECT * FROM enriched_out").collect()
    )
    batch = SP.enrich_with_dim(
        lognorm.run_pipeline(spark.read.text(jsonl_dir), CFG), dim
    ).select("message", "service", "owner")
    want = sorted((r["message"], r["service"], r["owner"]) for r in batch.collect())
    assert got == want and got


def test_stream_stream_interval_join(spark, tmp_path):
    """Stream-stream correlation: request/response pairs matched on
    trace_id within the interval; a response past max_gap never pairs."""
    reqs = tmp_path / "reqs"
    resps = tmp_path / "resps"
    reqs.mkdir()
    resps.mkdir()
    (reqs / "a.jsonl").write_text(
        "\n".join(
            [
                '{"ts":"2024-01-01T10:00:00Z","level":"info","msg":"req-1","trace_id":"t-1"}',
                '{"ts":"2024-01-01T10:00:00Z","level":"info","msg":"req-2","trace_id":"t-2"}',
            ]
        )
        + "\n"
    )
    (resps / "a.jsonl").write_text(
        "\n".join(
            [
                # within the 10-minute gap -> pairs
                '{"ts":"2024-01-01T10:04:00Z","level":"info","msg":"resp-1","trace_id":"t-1"}',
                # 30 minutes later -> outside the interval, must not pair
                '{"ts":"2024-01-01T10:30:00Z","level":"info","msg":"resp-2","trace_id":"t-2"}',
            ]
        )
        + "\n"
    )
    left = SP.stream_pipeline(spark, str(reqs), CFG)
    right = SP.stream_pipeline(spark, str(resps), CFG)
    joined = SP.correlate_traces(left, right, watermark="1 hour", max_gap="10 minutes")
    q = (
        joined.writeStream.format("memory")
        .queryName("trace_pairs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ss"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM trace_pairs").collect()
    assert [(r["trace_id"], r["l_message"], r["r_message"]) for r in rows] == [
        ("t-1", "req-1", "resp-1")
    ]


def test_checkpoint_restart_exactly_once(spark, tmp_path):
    """Exactly-once resume: stop the query, drop a new file, restart
    with the SAME checkpoint — only the new file's records are appended
    (the file-source offset log survives the restart)."""
    d = tmp_path / "inc_in"
    d.mkdir()
    out = str(tmp_path / "inc_out")
    ckpt = str(tmp_path / "inc_ckpt")
    (d / "a.jsonl").write_text(
        '{"ts":"2024-01-01T10:00:00Z","level":"error","msg":"first"}\n'
    )
    stream_df = SP.stream_pipeline(spark, str(d), CFG)
    q1 = SP.start_file_sink(stream_df, out, ckpt, CFG)
    q1.awaitTermination(120)

    (d / "b.jsonl").write_text(
        '{"ts":"2024-01-01T10:01:00Z","level":"error","msg":"second"}\n'
    )
    q2 = SP.start_file_sink(SP.stream_pipeline(spark, str(d), CFG), out, ckpt, CFG)
    q2.awaitTermination(120)

    msgs = sorted(
        json.loads(line)["Message"]
        for p in os.listdir(out)
        if p.startswith("part-")
        for line in open(os.path.join(out, p)).read().splitlines()
    )
    # "first" exactly once (not reprocessed on restart), "second" appended
    assert msgs == ["first", "second"]


def test_stream_chained_stateful_distinct_matches_batch(spark, jsonl_dir, tmp_path):
    """Two chained stateful aggregations (per-(window, service) dedup →
    per-window distinct count) in APPEND mode: windows emit once the
    watermark passes them, so a far-future flush line pushes every real
    window closed; the emitted set must equal the batch lineage run on
    the real lines."""
    # flush sentinel: one line two days past the fixture's event times
    flush = (
        '{"ts":"2025-12-16T23:59:59Z","level":"INFO","msg":"flush",'
        '"service":"zz_flush"}'
    )
    with open(os.path.join(jsonl_dir, "z_flush.jsonl"), "w") as f:
        f.write(flush + "\n")

    stream_df = SP.stream_pipeline(spark, jsonl_dir, CFG, max_files_per_trigger=1)
    out = SP.windowed_distinct_services(stream_df)
    q = (
        out.writeStream.format("memory")
        .queryName("distinct_services")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ds"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["n_services"])
        for r in spark.sql("SELECT * FROM distinct_services").collect()
    }

    batch = SP.windowed_distinct_services(
        lognorm.run_pipeline(spark.read.text(jsonl_dir), CFG)
    )
    # batch includes the (open) flush window; streaming append only
    # emits watermark-closed windows — compare the closed set
    want_all = {(r["window_start"], r["n_services"]) for r in batch.collect()}
    flush_windows = {w for w in want_all if w[0].year == 2025 and w[0].month == 12 and w[0].day == 16}
    want_closed = want_all - flush_windows
    assert got == want_closed and len(want_closed) > 0


def test_streaming_dau_wau_matches_batch_lineage(spark, tmp_path):
    """Round-4 stretch (round-3 verdict item 8): the streaming DAU/WAU
    twin must emit, for every watermark-finalized day, exactly the
    batch events_dau_wau numbers — pair dedup + bounded forward
    scatter maintained under a watermark with two chained stateful
    aggregations. A far-future flush event closes all real windows;
    the per-branch watermarks (min policy) must keep raw-time windows
    open until raw time actually passes them, so nothing is dropped."""
    in_dir = str(tmp_path / "in_dw")
    os.makedirs(in_dir)
    # 4 users across 12 days with overlaps (user 1 daily for 5 days,
    # user 2 every 3rd day, user 3 twice same day — dedup matters,
    # user 4 once), plus a flush far past everything.
    rows = (
        [(f"2024-03-{d:02d}T10:00:00Z", 1) for d in range(1, 6)]
        + [(f"2024-03-{d:02d}T11:30:00Z", 2) for d in (2, 5, 8, 11)]
        + [("2024-03-04T09:00:00Z", 3), ("2024-03-04T21:00:00Z", 3)]
        + [("2024-03-09T12:00:00Z", 4)]
    )
    with open(os.path.join(in_dir, "a.jsonl"), "w") as f:
        for ts, uid in rows:
            f.write(json.dumps({"ts": ts, "user_id": uid}) + "\n")
    with open(os.path.join(in_dir, "z_flush.jsonl"), "w") as f:
        f.write(json.dumps({"ts": "2024-04-30T00:00:00Z", "user_id": 99}) + "\n")

    schema = "ts timestamp, user_id long"
    stream_df = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(in_dir)
    )
    q = (
        SP.streaming_dau_wau(stream_df)
        .writeStream.format("memory")
        .queryName("dau_wau_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dw"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["day"], r["kind"], r["n_users"])
        for r in spark.sql("SELECT * FROM dau_wau_stream").collect()
    }
    assert got, "streaming emitted nothing"

    batch = SP.streaming_dau_wau(spark.read.schema(schema).json(in_dir))
    want_all = {(r["day"], r["kind"], r["n_users"]) for r in batch.collect()}
    # streaming append emits only watermark-closed windows; the flush
    # event's own day (and its wau cover days) remain open
    closed = {w for w in want_all if w[0].month == 3}
    assert got == closed and len(closed) > 0

    # and the batch lineage itself must agree with the registered
    # events_dau_wau semantics on active days: dau/wau pivots join up
    piv = {}
    for day, kind, n in want_all:
        piv.setdefault(day, {})[kind] = n
    # every day with raw activity must carry both metrics, and wau must
    # dominate dau (a 7-day rolling superset)
    active_days = {d for d, k in ((day, kind) for day, kind, _ in want_all) if k == "dau"}
    for d in active_days:
        assert piv[d]["wau"] >= piv[d]["dau"]
    # spot-check exact values: 2024-03-04 has users {1,2(no),3} -> dau 2
    import datetime

    d4 = datetime.datetime(2024, 3, 4)
    d8 = datetime.datetime(2024, 3, 8)
    assert piv[d4]["dau"] == 2          # users 1, 3 (3's two events dedup)
    assert piv[d4]["wau"] == 3          # users 1 (3/1-3/4), 2 (3/2), 3
    assert piv[d8]["dau"] == 1          # user 2 only
    assert piv[d8]["wau"] == 3          # users 1 (3/2-3/5), 2, 3 (3/4)


def test_sessionize_islands_equals_native_session_window(spark, sf_dir):
    """Two independent sessionization mechanisms must produce identical
    sessions: events_sessionize builds them with gaps-and-islands
    (lag + running flag sum), stream_session_windows with Spark's
    native session_window(). Same 5-minute gap, same events table —
    the cross-check validates both implementations (and the islands
    oracle SQL transitively, via the driver hash of each)."""
    from k8s_log_etl_spark.queries.streaming_batch import (
        events_sessionize,
        stream_session_windows,
    )

    islands = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in events_sessionize(spark, sf_dir).collect()
    }
    native = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in stream_session_windows(spark, sf_dir).collect()
    }
    assert islands == native and len(islands) > 0


def test_streaming_session_window_matches_batch(spark, tmp_path):
    """Native session_window() under a real watermark in APPEND mode:
    sessions only emit once the watermark passes gap-close, a
    far-future flush closes all real sessions, and the emitted set
    must equal the batch session_window lineage on the real events —
    the streaming leg of the sessionization triangle (batch islands ==
    batch session_window == streaming session_window)."""
    in_dir = str(tmp_path / "in_sw")
    os.makedirs(in_dir)
    rows = [
        # user 1: two sessions (gap > 5 min between 10:00-block and 10:20)
        ("2024-03-01T10:00:00Z", 1), ("2024-03-01T10:03:00Z", 1),
        ("2024-03-01T10:20:00Z", 1),
        # user 2: one session with events within the gap
        ("2024-03-01T10:01:00Z", 2), ("2024-03-01T10:05:30Z", 2),
        ("2024-03-01T10:09:00Z", 2),
    ]
    with open(os.path.join(in_dir, "a.jsonl"), "w") as f:
        for ts, uid in rows:
            f.write(json.dumps({"ts": ts, "user_id": uid}) + "\n")
    with open(os.path.join(in_dir, "z_flush.jsonl"), "w") as f:
        f.write(json.dumps({"ts": "2024-03-02T00:00:00Z", "user_id": 99}) + "\n")

    schema = "ts timestamp, user_id long"

    def sessions(df):
        src = df.withWatermark("ts", "10 minutes") if df.isStreaming else df
        return (
            src.groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id", F.col("w.start").alias("session_start"), "n_events")
        )

    stream_df = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(in_dir)
    )
    q = (
        sessions(stream_df)
        .writeStream.format("memory")
        .queryName("sw_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sw"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in spark.sql("SELECT * FROM sw_stream").collect()
    }
    batch = sessions(spark.read.schema(schema).json(in_dir))
    want = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in batch.collect()
        if r["user_id"] != 99  # the flush session is still open
    }
    assert got == want and len(want) == 3


def test_streaming_corpus_ingest_dedup_and_replay_idempotent(spark, tmp_path):
    """Continuous corpus ingestion (streaming/ingest.py): per batch,
    quality gate -> in-batch dedup -> anti-join vs the persistent
    digest index -> batch-partitioned appends. Asserts (a) cross-batch
    and in-batch duplicates never reach the corpus, (b) the quality
    gate drops fragments, (c) replaying a batch (the crash-recovery
    path) leaves the corpus row-identical — the batch-keyed dynamic
    overwrite + index anti-join make the foreachBatch body idempotent."""
    from k8s_log_etl_spark.streaming import ingest as IN

    in_dir = str(tmp_path / "docs_in")
    os.makedirs(in_dir)
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt_ing")

    LONG = "the quick brown fox jumps over the lazy dog again and again"
    b1 = [
        (1, LONG + " one"),
        (2, LONG + " one"),        # in-batch duplicate of doc 1
        (3, LONG + " three"),
        (4, "too short"),          # gated out (< MIN_TOKENS)
    ]
    b2 = [
        (5, LONG + " ONE  "),      # canonical duplicate of doc 1 (case/ws)
        (6, LONG + " six"),
    ]
    for i, (name, rows) in enumerate((("a.jsonl", b1), ("b.jsonl", b2))):
        path = os.path.join(in_dir, name)
        with open(path, "w") as f:
            for did, text in rows:
                f.write(json.dumps({"doc_id": did, "text": text}) + "\n")
        # the file source orders batches by modification time — pin it
        # so 'a' is genuinely the earlier arrival
        os.utime(path, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    schema = "doc_id long, text string"
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(in_dir)
    )
    q = IN.ingest_corpus(spark, stream, corpus, index, ckpt)
    q.awaitTermination(120)

    got = {
        (r["doc_id"], r["text"]) for r in spark.read.parquet(corpus).collect()
    }
    assert {d for d, _ in got} == {1, 3, 6}
    # index matches the corpus exactly (digest per kept doc)
    idx = spark.read.parquet(index)
    assert idx.count() == 3
    assert idx.select("digest").distinct().count() == 3

    # replay batch 0 (docs b1, batch_id 0) — crash-recovery path
    before = sorted(
        (r["doc_id"], r["digest"], r["ingest_batch"])
        for r in spark.read.parquet(corpus).select("doc_id", "digest", "ingest_batch").collect()
    )
    replay_df = spark.createDataFrame(b1, schema)
    IN.ingest_batch(spark, replay_df, 0, corpus, index)
    after = sorted(
        (r["doc_id"], r["digest"], r["ingest_batch"])
        for r in spark.read.parquet(corpus).select("doc_id", "digest", "ingest_batch").collect()
    )
    assert after == before, "replaying a batch changed the corpus"

    # the worst crash window: corpus write landed, index write did NOT
    # (the exact ordering the anti-join alone cannot survive) — replay
    # must restore the index without duplicating the corpus
    import shutil

    shutil.rmtree(os.path.join(index, "ingest_batch=0"))
    IN.ingest_batch(spark, replay_df, 0, corpus, index)
    after2 = sorted(
        (r["doc_id"], r["digest"], r["ingest_batch"])
        for r in spark.read.parquet(corpus).select("doc_id", "digest", "ingest_batch").collect()
    )
    assert after2 == before, "crash-window replay duplicated corpus rows"
    idx2 = spark.read.parquet(index)
    assert idx2.count() == 3 and idx2.select("digest").distinct().count() == 3


def test_streaming_quantile_sketch_matches_batch(spark, tmp_path):
    """The mergeable-sketch claim, proven on the stream: maintaining
    (hour, type, bin) counts across micro-batches (maxFilesPerTrigger=1
    forces multi-batch merging) must finalize EXACTLY the batch sketch
    for every watermark-closed hour, and read-side recovery over the
    streamed table must equal recovery over the batch table — plus an
    exact hand-computed interpolation spot-check."""
    in_dir = str(tmp_path / "in_qs")
    os.makedirs(in_dir)
    # hour 10:00 'click': values 4, 12, 20 -> bins 0,1,2; n=3,
    # p50 target 1.5 crosses bin 1 (cum 2, prev 1): est = 8*(1+0.5) = 12
    rows_a = [("2024-03-01T10:05:00Z", "click", 4.0),
              ("2024-03-01T10:15:00Z", "click", 12.0)]
    rows_b = [("2024-03-01T10:25:00Z", "click", 20.0),
              ("2024-03-01T10:35:00Z", "view", 600.0),   # clamps to top bin
              ("2024-03-01T11:10:00Z", "click", 7.5)]
    for name, rows in (("a.jsonl", rows_a), ("b.jsonl", rows_b)):
        with open(os.path.join(in_dir, name), "w") as f:
            for ts, et, v in rows:
                f.write(json.dumps({"ts": ts, "event_type": et, "value": v}) + "\n")
    with open(os.path.join(in_dir, "z_flush.jsonl"), "w") as f:
        f.write(json.dumps(
            {"ts": "2024-03-02T00:00:00Z", "event_type": "flush", "value": 1.0}) + "\n")

    schema = "ts timestamp, event_type string, value double"
    stream_df = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(in_dir)
    )
    q = (
        SP.streaming_quantile_sketch(stream_df)
        .writeStream.format("memory")
        .queryName("qsk_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_qs"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["hour"], r["event_type"], r["bin"], r["cnt"])
        for r in spark.sql("SELECT * FROM qsk_stream").collect()
    }
    assert got, "streaming emitted nothing"

    batch_sketch = SP.streaming_quantile_sketch(spark.read.schema(schema).json(in_dir))
    want_all = {
        (r["hour"], r["event_type"], r["bin"], r["cnt"]) for r in batch_sketch.collect()
    }
    closed = {w for w in want_all if w[0].day == 1}  # flush hour stays open
    assert got == closed and len(closed) > 0
    # the 600.0 view event clamped into the top bin
    from k8s_log_etl_spark.queries.streaming_batch import QSK_BINS
    assert any(b == QSK_BINS - 1 and et == "view" for _, et, b, _ in got)

    # read-side recovery over the streamed table == over the batch
    # table (closed hours), including the hand-computed median
    stream_q = {
        (r["hour"], r["event_type"]): r
        for r in SP.quantiles_from_sketch(spark.sql("SELECT * FROM qsk_stream")).collect()
    }
    batch_q = {
        (r["hour"], r["event_type"]): r
        for r in SP.quantiles_from_sketch(batch_sketch).collect()
        if r["hour"].day == 1
    }
    assert set(stream_q) == set(batch_q)
    for k, r in batch_q.items():
        s = stream_q[k]
        assert (s["n_events"], s["est_p50"], s["est_p90"], s["est_p99"]) == (
            r["n_events"], r["est_p50"], r["est_p90"], r["est_p99"])
    import datetime
    h10 = datetime.datetime(2024, 3, 1, 10)
    assert stream_q[(h10, "click")]["est_p50"] == 12.0
    assert stream_q[(h10, "click")]["n_events"] == 3


def test_range_quantiles_merge_across_hours_equals_batch(spark, tmp_path):
    """Percentiles don't compose across rollup rows; bin counts do. A
    3-hour sketch table merged over a 2-hour range must yield EXACTLY
    the quantiles of the batch sketch built from the range's raw
    events — the range-serving pattern a stored per-hour percentile
    could never support."""
    import datetime

    from k8s_log_etl_spark.queries.streaming_batch import quantile_sketch_frame

    rows = []
    for h, vals in ((9, [4.0, 100.0, 13.5]), (10, [20.0, 20.5]), (11, [300.0, 1.0])):
        for i, v in enumerate(vals):
            rows.append((datetime.datetime(2024, 3, 1, h, i + 1), "click", v))
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")

    sketch = SP.streaming_quantile_sketch(df)     # batch run of the twin lineage
    got = {
        r.event_type: r
        for r in SP.range_quantiles_from_sketch(
            sketch, "2024-03-01 09:00:00", "2024-03-01 11:00:00"
        ).collect()
    }
    want = {
        r.event_type: r
        for r in quantile_sketch_frame(
            df.filter(
                (F.col("ts") >= "2024-03-01 09:00:00")
                & (F.col("ts") < "2024-03-01 11:00:00")
            ).select("event_type", "value")
        ).collect()
    }
    assert set(got) == set(want) == {"click"}
    g, w = got["click"], want["click"]
    assert (g.n_events, g.est_p50, g.est_p90, g.est_p99) == (
        w.n_events, w.est_p50, w.est_p90, w.est_p99)
    assert g.n_events == 5   # hour-11 events excluded by the range


def test_locf_gap_fill_hand_computable(spark, monkeypatch):
    """Hand-checkable LOCF semantics on a 4-hour spine with two series:
    'a' observed hours 0 and 2 (hour 1 and 3 carry hour-forward fills),
    'b' first observed hour 2 (hours 0-1 stay NULL — nothing to carry
    before the first observation)."""
    from k8s_log_etl_spark.queries import streaming_batch as SB

    rows = [
        ("2024-01-01 00:30:00", "a", 10.0),
        ("2024-01-01 02:30:00", "a", 30.0),
        ("2024-01-01 02:10:00", "b", 7.0),
        ("2024-01-01 03:20:00", "b", 9.0),
    ]
    ev = spark.createDataFrame(rows, "ts string, event_type string, value double").select(
        F.col("ts").cast("timestamp").alias("ts"), "event_type", "value"
    )
    monkeypatch.setattr(SB, "load_table", lambda spark, sf_dir, name: ev)
    got = {
        (r["event_type"], str(r["hour_start"])): (
            r["n_events"], r["avg_value_filled"], r["is_gap"]
        )
        for r in SB.events_gap_fill_locf(spark, "unused").collect()
    }
    h = lambda i: f"2024-01-01 0{i}:00:00"  # noqa: E731
    assert got == {
        ("a", h(0)): (1, 10.0, False),
        ("a", h(1)): (0, 10.0, True),    # carried forward
        ("a", h(2)): (1, 30.0, False),
        ("a", h(3)): (0, 30.0, True),    # carried forward
        ("b", h(0)): (0, None, True),    # before first observation: NULL
        ("b", h(1)): (0, None, True),
        ("b", h(2)): (1, 7.0, False),
        ("b", h(3)): (1, 9.0, False),
    }


def test_stream_scd2_dimension_enrichment_matches_batch(spark, tmp_path):
    """Streaming twin of join_scd2_dimension: a stream of fact rows
    (lineitems arriving over three micro-batches) stream-static-joined
    to the SAME versioned part dimension with the valid-at-event-time
    filter must reproduce the batch join row-for-row — the stream-
    static join re-plans the dim lookup per micro-batch, the validity
    interval rides as a post-join filter, and every fact row picks its
    own AS-OF dimension version."""
    from k8s_log_etl_spark.queries import relational as R

    sf = "/root/testdata/sf0.001"
    li = (
        spark.read.parquet(os.path.join(sf, "lineitem.parquet"))
        .select("l_partkey", "l_shipdate", "l_quantity")
    )
    in_dir = str(tmp_path / "facts_in")
    os.makedirs(in_dir)
    rows = li.collect()
    third = (len(rows) + 2) // 3
    for i in range(3):
        path = os.path.join(in_dir, f"b{i}.jsonl")
        with open(path, "w") as f:
            for r in rows[i * third:(i + 1) * third]:
                f.write(json.dumps({
                    "l_partkey": r["l_partkey"],
                    "l_shipdate": r["l_shipdate"].isoformat(),
                    "l_quantity": r["l_quantity"],
                }) + "\n")
        os.utime(path, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    dim = R.scd2_part_dim(spark, sf)
    schema = "l_partkey long, l_shipdate timestamp, l_quantity double"
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(in_dir)
    )
    enriched = (
        stream.join(dim, stream.l_partkey == dim.p_partkey)
        .filter(
            (F.col("valid_from") <= F.col("l_shipdate"))
            & (F.col("l_shipdate") < F.col("valid_to"))
        )
        .select(
            "l_partkey", "l_shipdate", "price_cents",
            F.floor("l_quantity").cast("long").alias("qty"),
        )
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("scd2_enrich_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT l_partkey, l_shipdate, price_cents, qty FROM scd2_enrich_stream"
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in li.join(dim, li.l_partkey == dim.p_partkey)
        .filter(
            (F.col("valid_from") <= F.col("l_shipdate"))
            & (F.col("l_shipdate") < F.col("valid_to"))
        )
        .select(
            "l_partkey", "l_shipdate", "price_cents",
            F.floor("l_quantity").cast("long").alias("qty"),
        )
        .collect()
    )
    assert got == want
    assert len(got) == len(rows)  # exactly one dimension version per fact
