"""Continuous-aggregate rollup (streaming/rollup.py): maintenance
equivalence vs the batch aggregate, incremental hour-partition writes
that leave old partitions untouched, and the rollup+tail read path
serving the exact full-history aggregate with partition pruning."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from k8s_log_etl_spark.streaming import rollup as RU

EVENTS_SCHEMA = "ts timestamp, event_type string, value double"


def _write(in_dir: str, name: str, rows) -> None:
    with open(os.path.join(in_dir, name), "w") as f:
        for ts, et, v in rows:
            f.write(json.dumps({"ts": ts, "event_type": et, "value": v}) + "\n")


def _run_maintenance(spark, in_dir: str, rollup_dir: str, ckpt: str) -> None:
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
    )
    q = RU.maintain_rollup(spark, stream, rollup_dir, ckpt)
    q.awaitTermination(120)
    assert not q.isActive


def _canon(df):
    return sorted(
        (r["hour_start"], r["event_type"], r["n_events"], float(r["sum_value"]))
        for r in df.collect()
    )


def test_rollup_maintenance_incremental_and_read_path(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    rollup_dir = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    _write(in_dir, "a.jsonl", [
        ("2024-01-01T10:05:00Z", "click", 1.5),
        ("2024-01-01T10:20:00Z", "view", 2.0),
        ("2024-01-01T10:40:00Z", "click", 0.5),
    ])
    _write(in_dir, "b.jsonl", [
        ("2024-01-01T11:10:00Z", "click", 3.0),
        ("2024-01-01T10:55:00Z", "view", 1.0),  # late but inside watermark
    ])
    _write(in_dir, "c.jsonl", [("2024-01-01T14:00:00Z", "click", 9.0)])

    _run_maintenance(spark, in_dir, rollup_dir, ckpt)

    raw = spark.read.schema(EVENTS_SCHEMA).json(in_dir)
    # watermark after run 1 is 14:00 - 2h = 12:00 → hours 10 and 11 are
    # finalized and materialized; hour 14 is still pending in state.
    got = spark.read.parquet(rollup_dir)
    want = RU.hourly_rollup(
        raw.filter(F.col("ts") < F.lit("2024-01-01 12:00:00").cast("timestamp"))
    )
    assert _canon(got.drop("hour_key")) == _canon(want)
    hour_dirs = sorted(
        p for p in os.listdir(rollup_dir) if p.startswith("hour_key=")
    )
    assert hour_dirs == ["hour_key=2024-01-01-10", "hour_key=2024-01-01-11"]

    # Incremental run: new hours arrive; previously-materialized hour
    # partitions must not be rewritten (dynamic overwrite only touches
    # the new hours).
    h10 = os.path.join(rollup_dir, "hour_key=2024-01-01-10")
    before = {p: os.path.getmtime(os.path.join(h10, p)) for p in os.listdir(h10)}
    _write(in_dir, "d.jsonl", [
        ("2024-01-01T12:30:00Z", "view", 4.0),
        ("2024-01-01T12:45:00Z", "click", 1.0),
    ])
    _write(in_dir, "e.jsonl", [("2024-01-01T16:00:00Z", "view", 7.0)])
    _run_maintenance(spark, in_dir, rollup_dir, ckpt)

    raw = spark.read.schema(EVENTS_SCHEMA).json(in_dir)
    # watermark now 14:00 → hour 12 joined the materialized set; hours
    # 14 and 16 are still pending.
    got = spark.read.parquet(rollup_dir)
    want = RU.hourly_rollup(
        raw.filter(F.col("ts") < F.lit("2024-01-01 14:00:00").cast("timestamp"))
    )
    assert _canon(got.drop("hour_key")) == _canon(want)
    after = {p: os.path.getmtime(os.path.join(h10, p)) for p in os.listdir(h10)}
    assert after == before, "old hour partition was rewritten"

    # Read path: materialized hours below the cutoff + raw tail at/after
    # it must equal the full-history batch aggregate exactly.
    serve = RU.rollup_with_tail(spark, rollup_dir, raw, "2024-01-01 13:00:00")
    full = RU.hourly_rollup(raw)
    assert _canon(serve) == _canon(full)

    # The cold side must prune on the partition key (only hour
    # directories below the cutoff are listed in the scan).
    cold_plan = (
        spark.read.parquet(rollup_dir)
        .filter(
            F.col("hour_key")
            < F.date_format(
                F.lit("2024-01-01 13:00:00").cast("timestamp"), RU.HOUR_KEY_FMT
            )
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in cold_plan and "hour_key" in cold_plan


def test_user_sketch_rollup_range_estimate(spark, tmp_path):
    """Per-hour HLL sketches answer range distinct-user questions from
    the materialized table alone: the union over [10:00, 12:00) must
    de-duplicate users spanning both hours (stored per-hour COUNT
    DISTINCTs could not) and land within HLL error of the exact
    answer."""
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    sketch_dir = str(tmp_path / "sketches")
    ckpt = str(tmp_path / "ckpt_sk")

    # users 0..39 active in hour 10; users 20..59 in hour 11 (overlap
    # 20..39) -> exact distinct over both hours = 60, sum of per-hour
    # counts = 80.
    rows_h10 = [(f"2024-01-01T10:{i % 60:02d}:00Z", "click", float(u))
                for i, u in enumerate(range(40))]
    rows_h11 = [(f"2024-01-01T11:{i % 60:02d}:00Z", "view", float(u))
                for i, u in enumerate(range(20, 60))]
    flush = [("2024-01-01T14:00:00Z", "click", 999.0)]
    _write(in_dir, "a.jsonl", rows_h10 + rows_h11)
    _write(in_dir, "b.jsonl", flush)

    schema = "ts timestamp, event_type string, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
        .withColumn("user_id", F.col("value").cast("long"))
    )
    q = RU.maintain_user_sketches(spark, stream, sketch_dir, ckpt)
    q.awaitTermination(120)
    assert not q.isActive

    est = RU.distinct_users_range(
        spark, sketch_dir, "2024-01-01 10:00:00", "2024-01-01 12:00:00"
    ).collect()[0]
    assert est["n_events"] == 80
    # HLL (lgK=12 default) is near-exact at this cardinality; allow 2%.
    assert abs(est["distinct_users_est"] - 60) <= max(2, 0.02 * 60)

    # Range covering only hour 10 prunes to one partition and estimates
    # that hour's 40 users.
    est10 = RU.distinct_users_range(
        spark, sketch_dir, "2024-01-01 10:00:00", "2024-01-01 11:00:00"
    ).collect()[0]
    assert abs(est10["distinct_users_est"] - 40) <= max(2, 0.02 * 40)


def test_rollup_sf01_incremental_partitions_untouched_and_pruned(spark, tmp_path):
    """Round-3 verdict item 5: exercise the rollup maintenance at sf0.1
    (real data volume, ~tens of hour partitions) and pin the two
    invariants that make the continuous aggregate safe to serve from:
    (a) an incremental batch leaves every previously-materialized hour
    partition BYTE-identical (dynamic partition overwrite only rewrites
    the finalized new hours), and (b) the serving read prunes on
    hour_key — the pruned scan's input files must all belong to hours
    below the cutoff."""
    import hashlib

    import pytest

    sf_dir = "/root/testdata/sf0.1"
    if not os.path.exists(os.path.join(sf_dir, "events.parquet")):
        pytest.skip("sf0.1 testdata not present")

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    rollup_dir = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    ev = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .select("ts", "event_type", "value")
    )
    b1 = ev.filter(F.col("ts") < "2024-01-03").collect()
    b2 = ev.filter((F.col("ts") >= "2024-01-03") & (F.col("ts") < "2024-01-05")).collect()
    assert len(b1) > 1000 and len(b2) > 1000
    stage_dir = str(tmp_path / "stage")
    os.makedirs(stage_dir)
    for name, rows in (("a.jsonl", b1), ("b.jsonl", b2)):
        # staged OUTSIDE in_dir: the file source reads every file in its
        # path regardless of extension, so a '.pending' suffix inside
        # in_dir would already be consumed by the first run
        with open(os.path.join(stage_dir, name), "w") as f:
            for r in rows:
                f.write(
                    json.dumps(
                        {"ts": r["ts"].isoformat(), "event_type": r["event_type"],
                         "value": r["value"]}
                    ) + "\n"
                )

    def _file_hashes(base):
        out = {}
        for entry in os.listdir(base):
            if not entry.startswith("hour_key="):
                continue
            for fn in os.listdir(os.path.join(base, entry)):
                p = os.path.join(base, entry, fn)
                out[f"{entry}/{fn}"] = hashlib.md5(open(p, "rb").read()).hexdigest()
        return out

    # run 1: only batch 1 visible
    os.rename(os.path.join(stage_dir, "a.jsonl"), os.path.join(in_dir, "a.jsonl"))
    _run_maintenance(spark, in_dir, rollup_dir, ckpt)
    before = _file_hashes(rollup_dir)
    assert len({k.split("/")[0] for k in before}) >= 24  # >= a day of hours

    # run 2: incremental batch arrives
    os.rename(os.path.join(stage_dir, "b.jsonl"), os.path.join(in_dir, "b.jsonl"))
    _run_maintenance(spark, in_dir, rollup_dir, ckpt)
    after = _file_hashes(rollup_dir)

    # (a) every run-1 partition file is still there, byte-identical
    untouched = {k: v for k, v in after.items() if k in before}
    assert untouched == before, "previously-materialized hour partitions were rewritten"
    assert len(after) > len(before)  # the new hours did materialize

    # (b) serving read prunes on the partition key: the scan node must
    # carry the cutoff as a PartitionFilter (directory-level pruning —
    # sub-cutoff hours never open a data file), not as a post-scan
    # filter. (inputFiles() reports the unpruned relation, so the
    # executed plan's scan metadata is the observable contract.)
    cutoff = "2024-01-02-00"
    pruned = spark.read.parquet(rollup_dir).filter(F.col("hour_key") < cutoff)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf, plan
    assert "hour_key" in pf[0] and cutoff in pf[0], pf[0]
    # and the pruned result genuinely excludes at-or-above-cutoff hours
    assert pruned.filter(F.col("hour_key") >= cutoff).count() == 0
    assert pruned.count() > 0


def test_compaction_reduces_files_preserves_content(spark, tmp_path):
    """Small-files compaction: many appended fragments per hour
    partition collapse to one file each, content and partition layout
    identical; untargeted partitions untouched."""
    from k8s_log_etl_spark.operators import compaction as C

    base = str(tmp_path / "tbl")
    # simulate an incremental writer: 6 tiny appends into hour A, one
    # into hour B
    for i in range(6):
        (
            spark.createDataFrame([(i, "A")], "v long, hour_key string")
            .write.mode("append").partitionBy("hour_key").parquet(base)
        )
    (
        spark.createDataFrame([(99, "B")], "v long, hour_key string")
        .write.mode("append").partitionBy("hour_key").parquet(base)
    )
    before = sorted(r["v"] for r in spark.read.parquet(base).collect())

    a_dir = os.path.join(base, "hour_key=A")
    n_before = sum(1 for f in os.listdir(a_dir) if f.endswith(".parquet"))
    assert n_before == 6

    todo = C.plan_compaction(spark, base, "hour_key", max_files_per_partition=1)
    assert todo == ["hour_key=A"]  # B already at target
    b_files = set(os.listdir(os.path.join(base, "hour_key=B")))
    assert C.compact_partitions(spark, base, "hour_key", todo) == 1

    n_after = sum(1 for f in os.listdir(a_dir) if f.endswith(".parquet"))
    assert n_after == 1
    assert set(os.listdir(os.path.join(base, "hour_key=B"))) == b_files
    after = sorted(r["v"] for r in spark.read.parquet(base).collect())
    assert after == before
    assert C.plan_compaction(spark, base, "hour_key") == []


def test_compaction_recovers_from_crash_states(spark, tmp_path):
    """Round-3 ADVICE: a crash between the two swap renames left the
    partition path missing with no recovery scan. recover_compaction
    must repair every interruption shape: roll FORWARD when the tmp
    rewrite is proven complete (_SUCCESS), roll BACK otherwise, and
    clean up post-swap leftovers — never losing rows."""
    import shutil

    from k8s_log_etl_spark.operators import compaction as C

    base = str(tmp_path / "tbl")
    for i in range(3):
        (
            spark.createDataFrame([(i, "A")], "v long, hour_key string")
            .write.mode("append").partitionBy("hour_key").parquet(base)
        )
    pdir = os.path.join(base, "hour_key=A")
    tmp = os.path.join(base, "_compact_tmp_hour_key=A")
    old = os.path.join(base, "_compact_old_hour_key=A")

    # Shape 1: crash mid-swap with a COMPLETE tmp rewrite -> roll forward.
    spark.read.parquet(pdir).repartition(1).write.mode("overwrite").parquet(tmp)
    os.rename(pdir, old)  # the crash window: live partition path missing
    assert C.recover_compaction(base) >= 1
    assert os.path.exists(pdir) and not os.path.exists(old) and not os.path.exists(tmp)
    assert sorted(r["v"] for r in spark.read.parquet(base).collect()) == [0, 1, 2]

    # Shape 2: crash mid-swap with an INCOMPLETE tmp (no _SUCCESS) -> roll back.
    spark.read.parquet(pdir).repartition(1).write.mode("overwrite").parquet(tmp)
    os.remove(os.path.join(tmp, "_SUCCESS"))
    os.rename(pdir, old)
    assert C.recover_compaction(base) >= 1
    assert os.path.exists(pdir) and not os.path.exists(old) and not os.path.exists(tmp)
    assert sorted(r["v"] for r in spark.read.parquet(base).collect()) == [0, 1, 2]

    # Shape 3: crash after the swap, before old-dir cleanup -> drop old.
    shutil.copytree(pdir, old)
    # Shape 4 (simultaneously): stale pre-swap tmp next to a live dir.
    spark.read.parquet(pdir).repartition(1).write.mode("overwrite").parquet(tmp)
    # compact_partitions runs recovery implicitly before a new pass
    assert C.compact_partitions(spark, base, "hour_key", ["hour_key=A"]) == 1
    assert not os.path.exists(old) and not os.path.exists(tmp)
    assert sorted(r["v"] for r in spark.read.parquet(base).collect()) == [0, 1, 2]
    assert sum(1 for f in os.listdir(pdir) if f.endswith(".parquet")) == 1


def test_ingest_compaction_sf01_content_identical_and_pruned(spark, tmp_path):
    """Round-4 verdict #4: wire compaction over the streaming-ingest
    corpus. Ingest several micro-batches of sf0.1 documents (each
    landing many fragment files per ingest_batch partition), compact
    both sinks through the crash-safe swap, and pin: (a) corpus AND
    index content row-identical, (b) file counts collapsed to 1 per
    batch partition, (c) the serving read still partition-prunes on
    ingest_batch (directory-level PartitionFilters, like the rollup
    read path), (d) a fresh batch ingested AFTER compaction still
    dedups against the compacted index."""
    import pytest

    from k8s_log_etl_spark.streaming import ingest as IN

    sf_dir = "/root/testdata/sf0.1"
    if not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
        pytest.skip("sf0.1 testdata not present")

    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    # 3 micro-batches; repartition(8) gives each batch partition many
    # fragment files, like a real micro-batch with parallel tasks.
    # Batch 1 re-sends some of batch 0 (cross-batch dups must die).
    slices = [
        docs.filter(F.col("doc_id") % 3 == 0),
        docs.filter(F.col("doc_id") % 3 == 1).unionAll(
            docs.filter((F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 5 == 0))
        ),
        docs.filter(F.col("doc_id") % 3 == 2),
    ]
    # At sf0.1 AQE's partition coalescing folds each micro-batch to one
    # output file — disable it during ingestion so every batch lands
    # multi-file partitions, the production fragment pattern compaction
    # exists for.
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key, "true")
    spark.conf.set(coalesce_key, "false")
    try:
        for bid, sl in enumerate(slices):
            IN.ingest_batch(spark, sl.repartition(8), bid, corpus, index)
    finally:
        spark.conf.set(coalesce_key, prev)

    def _files(base):
        return {
            entry: sorted(
                f for f in os.listdir(os.path.join(base, entry))
                if f.endswith(".parquet")
            )
            for entry in os.listdir(base)
            if entry.startswith("ingest_batch=")
        }

    n_before = {k: len(v) for k, v in _files(corpus).items()}
    assert len(n_before) == 3 and all(n > 1 for n in n_before.values()), n_before

    rows_before = sorted(
        (r["doc_id"], r["digest"], r["ingest_batch"])
        for r in spark.read.parquet(corpus).collect()
    )
    idx_before = sorted(
        (r["digest"], r["ingest_batch"]) for r in spark.read.parquet(index).collect()
    )

    done = IN.compact_ingest_output(spark, corpus, index)
    assert done == {"corpus": 3, "index": 3}

    # (b) one file per partition now; a second pass finds nothing to do
    assert all(len(v) == 1 for v in _files(corpus).values())
    assert all(len(v) == 1 for v in _files(index).values())
    assert IN.compact_ingest_output(spark, corpus, index) == {"corpus": 0, "index": 0}

    # (a) content row-identical on both sinks
    rows_after = sorted(
        (r["doc_id"], r["digest"], r["ingest_batch"])
        for r in spark.read.parquet(corpus).collect()
    )
    idx_after = sorted(
        (r["digest"], r["ingest_batch"]) for r in spark.read.parquet(index).collect()
    )
    assert rows_after == rows_before
    assert idx_after == idx_before

    # (c) the read path prunes on the batch partition key
    pruned = spark.read.parquet(corpus).filter(F.col("ingest_batch") == 1)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "ingest_batch" in pf[0], plan
    assert pruned.count() == sum(1 for r in rows_before if r[2] == 1)

    # (d) ingestion continues over the compacted index: a full replay
    # of everything must add nothing new
    IN.ingest_batch(spark, docs.repartition(8), 3, corpus, index)
    assert not os.path.exists(os.path.join(corpus, "ingest_batch=3")) or (
        spark.read.parquet(corpus).filter(F.col("ingest_batch") == 3).count() == 0
    )


def test_heavy_hitters_range_from_rollup(spark, tmp_path):
    """heavy_hitters_range over the streamed rollup: exact counts at
    this type cardinality (zero-error summaries, no trim), range
    filtering honored; and on an over-cardinality store the
    mergeable-summaries trim keeps the n/k undershoot bound."""
    in_dir = str(tmp_path / "in")
    rollup_dir = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    rows = (
        [("2024-03-01 10:%02d:00" % m, "click", 1.0) for m in range(30)]
        + [("2024-03-01 10:%02d:00" % m, "view", 1.0) for m in range(10)]
        + [("2024-03-01 11:%02d:00" % m, "click", 1.0) for m in range(20)]
        + [("2024-03-01 11:00:00", "buy", 1.0)]
        # sentinel far ahead so the watermark finalizes the hours above
        + [("2024-03-02 12:00:00", "late", 1.0)]
    )
    _write(in_dir, "a.jsonl", rows)
    _run_maintenance(spark, in_dir, rollup_dir, ckpt)

    full = {
        r["event_type"]: r["est_count"]
        for r in RU.heavy_hitters_range(
            spark, rollup_dir, "2024-03-01 00:00:00", "2024-03-02 00:00:00", k=50
        ).collect()
    }
    assert full == {"click": 50, "view": 10, "buy": 1}
    # range restriction: only hour 10
    hour10 = {
        r["event_type"]: r["est_count"]
        for r in RU.heavy_hitters_range(
            spark, rollup_dir, "2024-03-01 10:00:00", "2024-03-01 11:00:00", k=50
        ).collect()
    }
    assert hour10 == {"click": 30, "view": 10}

    # over-cardinality store: 60 types, k=10 — bound check
    many_dir = str(tmp_path / "many")
    hand = [
        ("2024-04-01-00", f"t{i:02d}", (60 - i) * 5) for i in range(60)
    ]
    spark.createDataFrame(
        hand, "hour_key string, event_type string, n_events long"
    ).write.partitionBy("hour_key").parquet(many_dir)
    k = 10
    est = {
        r["event_type"]: r["est_count"]
        for r in RU.heavy_hitters_range(
            spark, many_dir, "2024-04-01 00:00:00", "2024-04-02 00:00:00", k=k
        ).collect()
    }
    exact = {f"t{i:02d}": (60 - i) * 5 for i in range(60)}
    n = sum(exact.values())
    assert 0 < len(est) <= k
    for key, e in est.items():
        assert e <= exact[key]
        assert e >= exact[key] - n / k
