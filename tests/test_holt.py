"""events_forecast_holt: the compiled weight vectors must reproduce
the textbook step-by-step Holt recurrence on the real daily series
(to within the documented micro-unit quantization)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k8s_log_etl_spark.queries.streaming_batch import (
    HOLT_ALPHA,
    HOLT_BETA,
    HOLT_DAYS,
    events_forecast_holt,
)
from k8s_log_etl_spark.tables import load_table


def _python_holt(y):
    lvl, trd = y[0], y[1] - y[0]
    for t in range(1, len(y)):
        new_lvl = HOLT_ALPHA * y[t] + (1 - HOLT_ALPHA) * (lvl + trd)
        trd = HOLT_BETA * (new_lvl - lvl) + (1 - HOLT_BETA) * trd
        lvl = new_lvl
    return lvl, lvl + trd


def test_compiled_weights_match_stepwise_recurrence(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    daily = {
        (r["event_type"], r["d"]): r["y"]
        for r in ev.select(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("d"),
        )
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("y"))
        .collect()
    }
    got = {
        r["event_type"]: (r["level_now"], r["forecast_next"])
        for r in events_forecast_holt(spark, sf_dir).collect()
    }
    assert got
    for etype, (level, forecast) in got.items():
        y = [daily.get((etype, d), 0) for d in range(HOLT_DAYS)]
        want_level, want_forecast = _python_holt(y)
        # quantization error bound: 30 terms x 0.5 micro-unit each
        assert level == pytest.approx(want_level, abs=1e-4)
        assert forecast == pytest.approx(want_forecast, abs=1e-4)
