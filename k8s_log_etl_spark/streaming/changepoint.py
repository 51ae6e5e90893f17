"""Streaming changepoint monitoring: the online face of
events_changepoint_cusum.

The stream maintains only the (event_type, hour_start) COUNT TABLE of
the live feed — bounded state (|types| · calendar hours rows, ~9k
rows/type/year regardless of event volume), merged by pure addition
every micro-batch: exactly the mergeable-summary discipline of
streaming_drift_bins. The CUSUM detector itself (mean pricing, slacked
deviations, the prefix-sum/running-min identity) is recovered at READ
time from that tiny table by the SAME function the batch query runs
(queries.streaming_batch.cusum_from_hourly), so the streamed monitor
and the batch monitor are value-identical on identical data (pinned in
tests/test_stream_cusum.py).

At 100 TB/day the stream never carries CUSUM state or means — just
hourly counts; the alarm query is a few window functions over a
calendar-bounded frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from k8s_log_etl_spark.queries.streaming_batch import cusum_from_hourly

__all__ = ["streaming_hourly_counts", "cusum_from_hourly"]


def streaming_hourly_counts(df: DataFrame) -> DataFrame:
    """The live feed's hourly count table: one stateful aggregation on
    (event_type, hour bucket). State is bounded by calendar time, so
    complete-mode output stays tiny forever; counts merge by addition
    across micro-batches."""
    return df.groupBy(
        "event_type",
        F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("hour_start"),
    ).agg(F.count(F.lit(1)).alias("x"))
