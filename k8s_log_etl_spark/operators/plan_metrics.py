"""Per-operator metrics off the EXECUTED physical plan — the
engine-native completion of reference O14 (report.go:150-164,
cmd/etl/main.go:369-408): the Go pipeline wall-clocks each operator
(parse / normalize / filter / write) individually; Spark fuses them
into whole-stage-codegen'd passes, so the honest per-operator numbers
are the engine's own SQL metrics — scan time, per-codegen-stage
pipeline time, aggregate time, and per-node output-row counts, read
back from the executed plan's accumulators after the action runs.
`stage_timings_ms` keeps the action-boundary wall clocks; this module
adds the operator-grained layer below them.

The walk descends through the wrappers Spark puts between a Dataset
handle and the nodes that did the work: AdaptiveSparkPlanExec (AQE
re-planning) -> final plan, QueryStageExec -> materialized stage plan,
ReusedExchangeExec -> original exchange, and InMemoryTableScanExec ->
the shared InMemoryRelation.cachedPlan — the last one is what lets a
CACHED pipeline report its parse/filter metrics: the cache build runs
the shared cachedPlan instance's nodes, so their accumulators hold the
build-time numbers no matter which action triggered the build.

This reads Spark internals over py4j (stable across the 3.x/4.x line
but not a public API), and it is OBSERVABILITY, not correctness — so
unlike every computational path in this repo it degrades to an empty
list with a logged warning rather than failing the pipeline if a
future engine version moves a method. tests/test_plan_metrics.py pins
that it works (loudly, in CI) on the shipped Spark version.
"""

from __future__ import annotations

import logging
from typing import Any

from pyspark.sql import DataFrame

logger = logging.getLogger("k8s_log_etl_spark.plan_metrics")

#: metric keys whose values are milliseconds (Spark reports
#: shuffleWriteTime in nanoseconds — deliberately not listed)
_MS_KEYS = frozenset({"scanTime", "aggTime", "pipelineTime", "metadataTime"})


def _walk(node: Any, depth: int, out: list[dict]) -> None:
    metrics: dict[str, int] = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        v = kv._2().value()
        if v:  # keep the rows compact: zero metrics say nothing
            metrics[kv._1()] = int(v)
    out.append({"op": node.nodeName().strip(), "depth": depth, "metrics": metrics})
    cit = node.children().iterator()
    while cit.hasNext():
        _walk(cit.next(), depth + 1, out)
    cls = node.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        _walk(node.executedPlan(), depth + 1, out)
    elif cls.endswith("QueryStageExec"):
        _walk(node.plan(), depth + 1, out)
    elif cls == "ReusedExchangeExec":
        _walk(node.child(), depth + 1, out)
    elif cls == "InMemoryTableScanExec":
        _walk(node.relation().cachedPlan(), depth + 1, out)


def executed_plan_metrics(df: DataFrame) -> list[dict]:
    """Per-node rows [{"op", "depth", "metrics": {name: value}}] for
    the physical plan behind `df`, in pre-order. Call AFTER an action
    has run the plan (for a cached frame: after the action that built
    the cache) — accumulator values are whatever has executed so far.
    Returns [] with a logged warning if the internals walk fails."""
    try:
        out: list[dict] = []
        _walk(df._jdf.queryExecution().executedPlan(), 0, out)
        return out
    except Exception as exc:  # noqa: BLE001 — observability must not kill the run
        logger.warning("executed-plan metrics unavailable: %s", exc)
        return []


def operator_duration_ms(rows: list[dict]) -> dict[str, int]:
    """Flatten the time-valued metrics into a {'<op>.<metric>': ms}
    series for the Prometheus render (reference O28 exposes per-stage
    durations; this is the operator-grained equivalent). Ops repeat in
    a plan, so keys carry the pre-order index for uniqueness."""
    series: dict[str, int] = {}
    for idx, row in enumerate(rows):
        for key, value in row["metrics"].items():
            if key in _MS_KEYS:
                series[f"{idx}.{row['op']}.{key}"] = value
    return series
