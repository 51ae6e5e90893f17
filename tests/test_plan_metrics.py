"""operators/plan_metrics: per-operator SQL metrics off the executed
plan (reference O14's per-operator clocks, engine-native). Pinned
loudly here so an engine upgrade that moves the internals walk shows
up in CI as a failure, not as silently-empty observability."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from k8s_log_etl_spark.operators.plan_metrics import (
    executed_plan_metrics,
    operator_duration_ms,
)


def test_cached_pipeline_reports_per_operator_metrics(spark):
    """After the cache-building action, the walk must descend through
    InMemoryTableScan into the shared cached plan and surface the real
    scan/filter accumulators."""
    df = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id")
    ).cache()
    try:
        n = df.count()
        rows = executed_plan_metrics(df)
        assert rows, "internals walk returned nothing"
        ops = [r["op"] for r in rows]
        assert any(op.startswith("Scan") for op in ops), ops
        assert "Filter" in ops, ops
        scan = next(r for r in rows if r["op"].startswith("Scan"))
        assert scan["metrics"]["numOutputRows"] > 0
        filt = next(r for r in rows if r["op"] == "Filter")
        assert filt["metrics"]["numOutputRows"] == n
        # at least one time-valued metric flattened for the prometheus
        # render, keys unique by pre-order index
        series = operator_duration_ms(rows)
        assert len(series) == len(set(series))
        # rows are JSON-serializable (they ride the report JSON)
        json.dumps(rows)
    finally:
        df.unpersist()


def test_unexecuted_plan_walk_is_harmless(spark):
    """Walking a never-executed frame must not raise — accumulators
    just read zero (compacted away), never a crash."""
    df = spark.range(10).filter(F.col("id") > 3)
    rows = executed_plan_metrics(df)
    assert isinstance(rows, list)


def test_cli_report_carries_operator_metrics(spark, tmp_path, monkeypatch):
    """End-to-end: the batch CLI's report JSON exposes the operator
    layer beside stage_timings_ms, and the Prometheus render carries
    the per-operator duration series."""
    from k8s_log_etl_spark import cli

    lines = [
        '{"ts":"2025-11-02T08:00:01Z","level":"INFO","msg":"a","service":"api"}',
        '{"ts":"2025-11-02T08:00:02Z","level":"ERROR","msg":"b","service":"db"}',
    ]
    inp = tmp_path / "logs.jsonl"
    inp.write_text("\n".join(lines) + "\n")
    out = tmp_path / "out.jsonl"
    rep_path = tmp_path / "report.json"
    prom_path = tmp_path / "metrics.prom"
    monkeypatch.setattr(cli, "get_spark", lambda **_kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    rc = cli.main(
        [
            "--input", str(inp),
            "--output-type", "file",
            "--output-path", str(out),
            "--report-path", str(rep_path),
            "--prometheus-path", str(prom_path),
        ]
    )
    assert rc == 0
    rep = json.loads(rep_path.read_text())
    rows = rep["operator_metrics"]
    assert rows and any(
        r["metrics"].get("numOutputRows") for r in rows
    ), rows
    assert any(r["op"].startswith("Scan") for r in rows)
    assert "etl_operator_duration_ms" in prom_path.read_text()
