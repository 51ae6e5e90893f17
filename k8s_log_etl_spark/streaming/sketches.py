"""Streaming count-min sketch: the online face of agg_countmin_events.

The stream maintains only the CMS REGISTER TABLE — counter[i][b] as a
stateful count on the (row, bucket) coordinates of each event — which
is bounded at CMS_D * CMS_W rows regardless of stream size and merges
by pure addition (the mergeable-summary discipline of
streaming_quantile_sketch / streaming drift bins). Point estimates are
recovered at READ time with the batch query's exact helpers, so the
streamed sketch and the batch sketch are value-identical on identical
data (pinned in tests/test_stream_sketch.py) — and since round 7 the
register state is also DuckDB-replayable (deterministic md5 bucket
hashes), the streamed state inherits the batch oracle's exactness.

At 100 TB/day the stream never carries values — just the ≤10,240-row
register table; the serving query probes it with a broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from k8s_log_etl_spark.queries.relational import (
    cms_hashed,
    cms_point_estimates,
    cms_registers,
)


def streaming_cms_registers(df: DataFrame, col: str = "event_type") -> DataFrame:
    """One stateful aggregation on (i, b): complete-mode output stays
    bounded by the register grid forever."""
    return cms_registers(cms_hashed(df, col))


def cms_serve_estimates(registers: DataFrame, probe: DataFrame, col: str = "event_type") -> DataFrame:
    """Read-side point queries against the streamed register table for
    the values present in `probe` — same helpers, same arithmetic,
    hash-identical to the batch estimates."""
    return cms_point_estimates(registers, cms_hashed(probe, col))


# ---------------------------------------------------------------------------
# streaming AMS F2: the online face of agg_ams_f2_events
# ---------------------------------------------------------------------------


def streaming_ams_registers(
    df: DataFrame, keys: list[str] | None = None, value_col: str = "user_id"
) -> DataFrame:
    """The streamed AMS register table — one stateful aggregation on
    (keys..., i, b) whose complete-mode output stays bounded by the
    register grid (|keys| * AMS_D * AMS_W rows) forever. Registers are
    order-free +-1 integer sums over deterministic md5 coordinates, so
    the streamed state is value-identical to the batch sketch on
    identical data regardless of micro-batch cuts (pinned in
    tests/test_stream_sketch.py) and inherits the batch oracle's
    DuckDB-replayable exactness — the streaming_cms_registers
    discipline applied to the second moment."""
    from pyspark.sql import functions as F

    from k8s_log_etl_spark.queries.relational import ams_registers

    return ams_registers(df, keys or ["event_type"], F.col(value_col))


def ams_serve_estimates(
    registers: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """Read-side F2 estimates against the streamed register table —
    the SAME back-half helper the batch query uses
    (queries/relational.ams_f2_estimates), so streamed estimates are
    hash-identical to batch estimates."""
    from k8s_log_etl_spark.queries.relational import ams_f2_estimates

    return ams_f2_estimates(registers, keys or ["event_type"])
