"""Event-time windowed aggregations (§2c charter: streaming windows &
watermarks) in their batch form. The exact same window expressions run
under Structured Streaming in k8s_log_etl_spark/streaming/ (lineage is
mode-agnostic — tests assert stream==batch); registering the batch form
gives them a DuckDB oracle.

Determinism: window bounds are exact timestamp arithmetic; double
aggregates are rounded to 6 dp on both sides (micro-different summation
order between engines is below that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from k8s_log_etl_spark.functions import xengine as X
from k8s_log_etl_spark.plans.registry import register
from k8s_log_etl_spark.tables import load_table, spill_checkpoint

SESSION_GAP_MIN = 5

_TUMBLING_SQL = """
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM events
GROUP BY 1, 2
"""


@register("stream_tumbling_counts", oracle=_TUMBLING_SQL, tags=("streaming",), bench=True)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event type — the
    watermarked streaming aggregation's batch twin."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


_SLIDING_SQL = """
WITH offsets AS (SELECT 0 AS off UNION ALL SELECT 30),
win AS (
  SELECT time_bucket(INTERVAL 1 HOUR, e.ts - to_minutes(o.off)) + to_minutes(o.off) AS window_start,
         e.value
  FROM events e CROSS JOIN offsets o
)
SELECT window_start, count(*) AS n_events, round(avg(value), 6) AS avg_value
FROM win GROUP BY window_start
"""


@register("stream_sliding_avg", oracle=_SLIDING_SQL, tags=("streaming",))
def stream_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 hour long, every 30 min): each event lands in
    two windows; Spark's window() explodes to the assignments the
    oracle reconstructs with bucket offsets."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "avg_value")
    )


_SESSION_SQL = f"""
WITH ordered AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL {SESSION_GAP_MIN} MINUTE
                   OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
tagged AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM ordered
)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events
FROM tagged GROUP BY user_id, session_id
"""


@register("stream_session_windows", oracle=_SESSION_SQL, tags=("streaming",), bench=True)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (5-minute inactivity gap) per user via
    session_window() — the oracle derives identical sessions with the
    gaps-and-islands construction. One shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


_RESAMPLE_SQL = """
WITH bounds AS (
  SELECT time_bucket(INTERVAL 1 HOUR, min(ts)) AS lo,
         time_bucket(INTERVAL 1 HOUR, max(ts)) AS hi
  FROM events
),
spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start FROM bounds),
actual AS (
  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS hour_start, count(*) AS n,
         round(sum(value), 6) AS sum_value
  FROM events GROUP BY 1
)
SELECT s.hour_start, coalesce(a.n, 0) AS n_events,
       coalesce(a.sum_value, 0.0) AS sum_value
FROM spine s LEFT JOIN actual a USING (hour_start)
"""


@register("events_resample_1h", oracle=_RESAMPLE_SQL, tags=("streaming", "temporal"))
def events_resample_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly resample: a generated time spine (min..max
    hour) left-joined to the actual hourly aggregate, so empty hours
    appear as zero rows — the standard time-series densification. The
    spine is one tiny generated frame (broadcast side); the aggregate
    is the only real shuffle."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour_start")
    )
    actual = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour_start")).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("sum_value")
    )
    return spine.join(actual, "hour_start", "left").select(
        "hour_start",
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# per-series LOCF gap fill (forward-fill densification)
# ---------------------------------------------------------------------------

_LOCF_SQL = """
WITH bounds AS (
  SELECT time_bucket(INTERVAL 1 HOUR, min(ts)) AS lo,
         time_bucket(INTERVAL 1 HOUR, max(ts)) AS hi
  FROM events
),
spine AS (
  SELECT t.event_type, h.hour_start
  FROM (SELECT DISTINCT event_type FROM events) t,
       (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start
        FROM bounds) h
),
actual AS (
  SELECT event_type, time_bucket(INTERVAL 1 HOUR, ts) AS hour_start,
         count(*) AS n, round(avg(value), 6) AS avg_v
  FROM events GROUP BY 1, 2
)
SELECT s.event_type, s.hour_start,
       coalesce(a.n, 0) AS n_events,
       last_value(a.avg_v IGNORE NULLS) OVER (
         PARTITION BY s.event_type ORDER BY s.hour_start
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_value_filled,
       a.n IS NULL AS is_gap
FROM spine s LEFT JOIN actual a
  ON a.event_type = s.event_type AND a.hour_start = s.hour_start
"""


@register("events_gap_fill_locf", oracle=_LOCF_SQL, tags=("streaming", "temporal"))
def events_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series forward-fill (last observation carried forward): the
    hourly spine per event_type, with empty hours carrying the most
    recent observed hourly average instead of resample's zeros — the
    densification dashboards and feature pipelines actually serve
    (a sensor that went quiet keeps its last reading; hours before the
    first observation stay NULL). Complements events_resample_1h
    (zero-fill) with the second standard gap policy.

    Plan shape: one hourly hash-aggregate (the only real shuffle); the
    spine is |event_types| x |hours| — both bounded dimensions, built
    broadcast-side, so the left join never shuffles the aggregate
    side at fixture scale and stays keyed at any scale; the LOCF
    itself is ONE window per series key with a running last(ignore
    nulls) over a ROWS frame — at 100 TB the window partitions on the
    series key (here event_type; a high-cardinality deployment
    partitions per sensor/entity), so per-partition state is one
    series' hours and the sort is local."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias(
            "hour_start"
        )
    )
    types = ev.select("event_type").distinct()
    # both spine dimensions are bounded (|types| x |hours|) — an
    # explicit broadcast densification, not a data-sized cross join
    spine = types.crossJoin(F.broadcast(hours))
    actual = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_start")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 6).alias("avg_v"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(actual, ["event_type", "hour_start"], "left")
        .select(
            "event_type",
            "hour_start",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.last("avg_v", ignorenulls=True).over(w).alias("avg_value_filled"),
            F.col("n").isNull().alias("is_gap"),
        )
    )


# ---------------------------------------------------------------------------
# funnel analysis (event-sequence detection)
# ---------------------------------------------------------------------------

FUNNEL_FIRST = "click"
FUNNEL_THEN = "purchase"
FUNNEL_WINDOW_MIN = 60

_FUNNEL_SQL = f"""
WITH firsts AS (
  SELECT user_id, min(ts) AS first_ts FROM events
  WHERE event_type = '{FUNNEL_FIRST}' GROUP BY user_id
),
conv AS (
  SELECT f.user_id, f.first_ts, min(e.ts) AS conv_ts
  FROM firsts f JOIN events e
    ON e.user_id = f.user_id
   AND e.event_type = '{FUNNEL_THEN}'
   AND e.ts > f.first_ts
   AND e.ts <= f.first_ts + INTERVAL {FUNNEL_WINDOW_MIN} MINUTE
  GROUP BY f.user_id, f.first_ts
)
SELECT CAST(count(*) AS BIGINT) AS n_converted,
       round(avg(date_diff('microsecond', first_ts, conv_ts) / 1000000.0), 6)
         AS avg_seconds_to_convert
FROM conv
"""


@register("events_funnel", oracle=_FUNNEL_SQL, tags=("events",), bench=True)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step funnel: users whose first '{click}' is followed by a
    '{purchase}' within the conversion window; reports converted-user
    count and mean seconds-to-convert. Plan: per-user min over the
    (pushed-down) first-step scan, then a bounded range join against the
    second-step scan keyed on user_id — the time bound keeps per-user
    work constant, the user_id equi-key keeps it a hash join (same
    shape as join_range_binned, no cross product)."""
    ev = load_table(spark, sf_dir, "events")
    firsts = (
        ev.filter(F.col("event_type") == FUNNEL_FIRST)
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
    )
    # Exact integer microseconds for the bound: a double-cast loses
    # precision past ~2^53 us and can flip inclusion exactly on the
    # window edge vs the oracle's interval arithmetic.
    micros = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("first_ts"))
    conv = (
        ev.filter(F.col("event_type") == FUNNEL_THEN)
        .join(firsts, "user_id")
        .filter((micros > 0) & (micros <= FUNNEL_WINDOW_MIN * 60 * 1_000_000))
        .groupBy("user_id", "first_ts")
        .agg(F.min("ts").alias("conv_ts"))
    )
    delta = (
        F.unix_micros(F.col("conv_ts")) - F.unix_micros(F.col("first_ts"))
    ) / 1_000_000.0
    return conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.avg(delta), 6).alias("avg_seconds_to_convert"),
    )


# ---------------------------------------------------------------------------
# retention cohorts
# ---------------------------------------------------------------------------

_RETENTION_SQL = """
WITH cohorts AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id,
         CAST(floor(date_diff('day', c.cohort_week, date_trunc('week', e.ts)) / 7.0) AS BIGINT)
           AS week_offset
  FROM events e JOIN cohorts c ON e.user_id = c.user_id
  WHERE e.ts >= c.cohort_week
)
SELECT CAST(c.cohort_week AS TIMESTAMP) AS cohort_week, a.week_offset,
       count(*) AS n_users
FROM activity a JOIN cohorts c ON a.user_id = c.user_id
GROUP BY 1, 2
"""


@register("events_retention_cohorts", oracle=_RETENTION_SQL, tags=("events",))
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention matrix: users cohorted by first-signup week,
    counted in every later week they show any activity. Two hash
    aggregates and one equi-join on user_id — the cohort frame is one
    row per user, broadcast-or-shuffle by AQE; the distinct bounds the
    matrix at |users| x |weeks| regardless of event volume."""
    ev = load_table(spark, sf_dir, "events")
    cohorts = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    days = F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
    activity = (
        ev.join(cohorts, "user_id")
        .filter(F.col("ts") >= F.col("cohort_week"))
        .select("user_id", F.floor(days / 7.0).alias("week_offset"))
        .distinct()
    )
    return (
        activity.join(cohorts, "user_id")
        # Spark date_trunc returns TIMESTAMP, DuckDB DATE — cast the
        # oracle up to TIMESTAMP (the proven cross-engine temporal form;
        # DATE canonicalizes differently between collect() and pandas).
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# ---------------------------------------------------------------------------
# rolling range-frame window
# ---------------------------------------------------------------------------

_ROLLING_SQL = """
SELECT event_id, user_id, ts,
       CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
       round(sum(value) OVER w, 6) AS sum_last_hour
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts
  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
)
"""


@register("events_rolling_1h", oracle=_ROLLING_SQL, tags=("events", "temporal"))
def events_rolling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling 1-hour stats via a RANGE window frame (value
    range over event-time, not row counts — each row's frame is every
    event within the trailing hour). One shuffle on user_id; frame
    evaluation is a per-partition sliding aggregate, linear state. The
    temporal complement of the ROWS frames in window_running_total."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    # RANGE frames need a numeric ordering key: exact integer
    # microseconds since epoch, so boundary rows (exactly 1 hour back)
    # resolve identically to the oracle's interval arithmetic — a
    # double-cast can round a fractional-microsecond edge either way.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.round(F.sum("value").over(w), 6).alias("sum_last_hour"),
    )


# ---------------------------------------------------------------------------
# value histogram + z-score anomaly flags
# ---------------------------------------------------------------------------

HIST_BINS = 20

_HIST_SQL = f"""
WITH bounds AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
binned AS (
  SELECT least(CAST(floor((value - lo) / ((hi - lo) / {HIST_BINS}.0)) AS BIGINT),
               {HIST_BINS - 1}) AS bin
  FROM events, bounds
)
SELECT bin, count(*) AS n_events FROM binned GROUP BY bin
"""


@register("events_value_histogram", oracle=_HIST_SQL, tags=("events",))
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 20-bin histogram of the value column: global min/max
    as a broadcast scalar frame, bin assignment as a narrow expression,
    one small shuffle for the counts. The top edge folds into the last
    bin (max-value rows). Two passes total (bounds + counts) — the
    unavoidable shape for exact-bounds histograms at any scale."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / float(HIST_BINS)
    bin_ = F.least(
        F.floor((F.col("value") - F.col("lo")) / width), F.lit(HIST_BINS - 1)
    )
    return (
        ev.crossJoin(F.broadcast(bounds))
        .select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


ZSCORE_THRESHOLD = 3.0

_ZSCORE_SQL = f"""
WITH stats AS (
  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       round(e.value, 6) AS value,
       round((e.value - s.mu) / s.sigma, 6) AS zscore
FROM events e JOIN stats s ON e.event_type = s.event_type
WHERE s.sigma IS NOT NULL AND s.sigma > 0
  AND abs((e.value - s.mu) / s.sigma) > {ZSCORE_THRESHOLD}
"""


@register("events_anomaly_zscore", oracle=_ZSCORE_SQL, tags=("events",))
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population z-score outlier flags: per-type mean/stddev (one
    tiny aggregate, broadcast back) and every event more than 3 sigma
    out. The simplest data-quality screen a feed gets; the stats join
    is a broadcast of |event types| rows, the filter is narrow."""
    ev = load_table(spark, sf_dir, "events")
    # Singleton groups: Spark stddev_samp over one row is NaN (and NaN
    # compares greater than any threshold under Spark's total ordering),
    # while DuckDB returns NULL and drops the row — so guard the stats
    # frame to positive finite sigma on both sides.
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    ).filter(
        F.col("sigma").isNotNull() & ~F.isnan("sigma") & (F.col("sigma") > 0)
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > ZSCORE_THRESHOLD)
        .select(
            "event_id",
            "event_type",
            F.round(F.col("value"), 6).alias("value"),
            F.round(z, 6).alias("zscore"),
        )
    )


# ---------------------------------------------------------------------------
# rolling distinct actives (DAU / WAU)
# ---------------------------------------------------------------------------

_DAU_WAU_SQL = """
WITH pairs AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day FROM events
),
dau AS (SELECT day, count(*) AS dau FROM pairs GROUP BY day),
wau AS (
  SELECT d.day, count(DISTINCT p.user_id) AS wau
  FROM dau d JOIN pairs p
    ON p.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
  GROUP BY d.day
)
SELECT d.day, d.dau, w.wau FROM dau d JOIN wau w USING (day)
"""


@register("events_dau_wau", oracle=_DAU_WAU_SQL, tags=("events",), bench=True)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users plus exact 7-day rolling actives (WAU) per
    day — the canonical rolling-distinct metric, which a naive
    count(DISTINCT) OVER (RANGE 7 DAYS) window cannot express in Spark.
    Scale shape: dedup to (user, day) pairs first (one hash-agg keyed
    user+day — map-side partial absorbs the raw event volume), then each
    pair scatters to the ≤7 week-windows it contributes to via a
    map-side sequence+explode (bounded 7× amplification of the already
    tiny pair set, NOT of raw events), and one count-distinct per
    cover day. No range join, no per-day rescans; at 100 TB the cost is
    the (user, day) dedup shuffle, everything after is on day keys.
    Restricting output to days with actual activity makes the inner join
    back to dau also the correctness filter (no phantom trailing days)."""
    ev = load_table(spark, sf_dir, "events")
    # day stays TIMESTAMP (not DATE) end-to-end: the driver's pandas
    # canonicalization renders DuckDB DATE as datetime64 midnight but
    # Spark DATE as datetime.date — timestamps agree byte-for-byte.
    # The deduped pair frame feeds BOTH the dau aggregate and the
    # cover-window scatter; checkpoint it so the raw-event dedup
    # shuffle (the only cost that scales with event volume) runs once,
    # not once per consumer.
    pairs = (
        ev.select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
        .transform(spill_checkpoint)  # (user, day): data-sized
    )
    dau = pairs.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    cover = pairs.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr("INTERVAL 6 DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
    )
    wau = cover.groupBy("day").agg(F.countDistinct("user_id").alias("wau"))
    return dau.join(wau, "day").select("day", "dau", "wau")


# ---------------------------------------------------------------------------
# event-type transition matrix (sequence-model prep)
# ---------------------------------------------------------------------------

_MARKOV_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
trans AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
),
tot AS (SELECT prev_type, sum(n) AS row_total FROM trans GROUP BY prev_type)
SELECT t.prev_type, t.next_type, t.n,
       round(t.n * 1.0 / o.row_total, 6) AS p
FROM trans t JOIN tot o ON t.prev_type = o.prev_type
"""


@register("events_markov_transitions", oracle=_MARKOV_SQL, tags=("events",))
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix per the user stream —
    the counts/probabilities a behavior model (or a session-anomaly
    scorer) trains on. lag() over (user_id; ts, event_id) is a window
    partitioned by the high-cardinality user key, so per-partition
    state is one user's events and the sort is local — the scale-safe
    window shape. Transition tally and row-normalization are two tiny
    hash-aggregates on the |event_types|² key space; the row-total
    join is broadcast-sized at any scale. Ties in ts break on event_id
    identically in both engines."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = trans.groupBy("prev_type").agg(F.sum("n").alias("row_total"))
    return (
        trans.join(F.broadcast(tot), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.round(F.col("n") / F.col("row_total"), 6).alias("p"),
        )
    )


# ---------------------------------------------------------------------------
# rate-based bot detection (events per user-minute over threshold)
# ---------------------------------------------------------------------------

BOT_RATE_PER_MIN = 2

_BOT_SQL = f"""
WITH per_min AS (
  SELECT user_id, CAST(date_trunc('minute', ts) AS TIMESTAMP) AS minute,
         count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT user_id,
       count(*) AS hot_minutes,
       CAST(max(n) AS BIGINT) AS peak_per_min,
       CAST(sum(n) AS BIGINT) AS events_in_hot_minutes
FROM per_min WHERE n >= {BOT_RATE_PER_MIN}
GROUP BY user_id
"""


@register("events_bot_rate_flags", oracle=_BOT_SQL, tags=("events",))
def events_bot_rate_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-based bot/abuse flagging — the complement of the
    distributional z-score screen: users with minutes at or above
    BOT_RATE_PER_MIN events, with their hot-minute count and peak rate.
    Two hash-aggregates, both keyed on high-cardinality (user, minute)
    then user — map-side partials absorb the raw stream, no windows,
    no joins; the per-minute tally is exactly the keyed pre-aggregation
    a streaming twin would maintain under a watermark."""
    ev = load_table(spark, sf_dir, "events")
    per_min = (
        ev.select("user_id", F.date_trunc("minute", "ts").alias("minute"))
        .groupBy("user_id", "minute")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= BOT_RATE_PER_MIN)
    )
    return per_min.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("hot_minutes"),
        F.max("n").alias("peak_per_min"),
        F.sum("n").alias("events_in_hot_minutes"),
    )


# ---------------------------------------------------------------------------
# activity streaks (gaps-and-islands)
# ---------------------------------------------------------------------------

_STREAK_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events
),
grouped AS (
  SELECT user_id, day,
         day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER)
           AS island
  FROM days
),
streaks AS (
  SELECT user_id, island, count(*) AS streak_days,
         CAST(min(day) AS TIMESTAMP) AS streak_start
  FROM grouped GROUP BY user_id, island
)
SELECT user_id,
       CAST(max(streak_days) AS BIGINT) AS longest_streak,
       count(*) AS n_streaks,
       min(streak_start) AS first_streak_start
FROM streaks GROUP BY user_id
"""


@register("events_activity_streaks", oracle=_STREAK_SQL, tags=("events",))
def events_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-active-day streaks per user via the classic
    gaps-and-islands construction: distinct (user, day), then
    day - row_number() is constant within a consecutive run, so one
    grouped count per (user, island) yields streak lengths. The
    engagement metric behind DAU retention dashboards. Scale: the
    window partitions on the high-cardinality user key (local sorts of
    per-user day lists), everything else is keyed hash-aggregates —
    the same discipline as events_markov_transitions."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    grouped = days.withColumn(
        "island", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    streaks = grouped.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_days"),
        F.min("day").cast("timestamp").alias("streak_start"),
    )
    return streaks.groupBy("user_id").agg(
        F.max("streak_days").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.min("streak_start").alias("first_streak_start"),
    )


# ---------------------------------------------------------------------------
# batch sessionization (gaps-and-islands; twin of stream_session_windows)
# ---------------------------------------------------------------------------

_SESSIONIZE_SQL = f"""
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL {SESSION_GAP_MIN} MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM events
),
sess AS (
  SELECT user_id, ts,
         CAST(sum(is_start) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS session_seq
  FROM gaps
)
SELECT user_id, session_seq, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events,
       CAST(date_diff('microsecond', min(ts), max(ts)) AS BIGINT) AS duration_us
FROM sess GROUP BY user_id, session_seq
"""


@register("events_sessionize", oracle=_SESSIONIZE_SQL, tags=("events", "temporal"))
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization with the same 5-minute inactivity
    gap — the gaps-and-islands construction: a lag() flags each
    session-opening event (gap exceeded or first event), a running sum
    of the flags numbers the sessions per user, and one hash-agg emits
    per-session bounds/size/duration. This is the BATCH twin of
    stream_session_windows (Spark's native session_window()): two
    independent mechanisms, same semantics, equivalence-pinned in
    tests/test_streaming.py — the cross-check that validates both.

    Scale shape: both windows share ONE (user_id; ts, event_id)
    sort+exchange (lag and the running sum reuse the partitioning),
    then a keyed hash-agg; per-user partitions are event-bounded.
    Duration in exact integer microseconds (ADVICE round-2 pattern:
    never a float second subtraction)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_start = (
        prev.isNull()
        | (
            (F.unix_micros(F.col("ts")) - F.unix_micros(prev))
            > SESSION_GAP_MIN * 60 * 1_000_000
        )
    ).cast("int")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ev.select("user_id", "ts", "event_id")
        .withColumn("is_start", is_start)
        .withColumn("session_seq", F.sum("is_start").over(run))
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
                "duration_us"
            ),
        )
    )


# ---------------------------------------------------------------------------
# top 3-step behavior paths (double-lag sequence mining)
# ---------------------------------------------------------------------------

PATHS_TOP = 10

_PATHS_SQL = f"""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type, 1) OVER w AS p1,
         lag(event_type, 2) OVER w AS p2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT p2 || ' > ' || p1 || ' > ' || event_type AS path, count(*) AS n
FROM seq WHERE p2 IS NOT NULL
GROUP BY 1
ORDER BY n DESC, path
LIMIT {PATHS_TOP}
"""


@register("events_top_paths", oracle=_PATHS_SQL, tags=("events",))
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 3-step behavior paths — sequence mining one order above the
    transition matrix (events_markov_transitions): two lags over the
    per-user event stream form each sliding 3-gram of event types, one
    hash-aggregate counts them, TakeOrderedAndProject keeps the top
    paths. Both lags share ONE window (single per-user local sort);
    path cardinality is |event_types|³ — the aggregate output stays
    tiny at any stream volume."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    ).filter(F.col("p2").isNotNull())
    path = F.concat_ws(" > ", F.col("p2"), F.col("p1"), F.col("event_type"))
    return (
        seq.select(path.alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(PATHS_TOP)
    )


# ---------------------------------------------------------------------------
# conversion latency: first view -> first subsequent purchase
# ---------------------------------------------------------------------------

_CONVERT_SQL = """
WITH v AS (
  SELECT user_id, min(ts) AS first_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
p AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS conv_us
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= v.first_view
  GROUP BY e.user_id
),
lat AS (
  SELECT v.user_id, p.conv_us - epoch_us(v.first_view) AS us
  FROM v JOIN p ON v.user_id = p.user_id
)
SELECT count(*) AS n_converted,
       round(quantile_cont(us, 0.5) / 1e6, 6) AS p50_s,
       round(quantile_cont(us, 0.9) / 1e6, 6) AS p90_s,
       round(max(us) / 1e6, 6) AS max_s
FROM lat
"""


@register("events_time_to_convert", oracle=_CONVERT_SQL, tags=("events", "temporal"))
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency funnel metric: per user, the gap between the
    FIRST view and the first purchase at or after it, summarized as
    exact percentiles. Two keyed min-aggregates (each absorbs its event
    slice map-side) joined on user_id — no per-user sequence scan, no
    window sort over raw events; at 100 TB both aggregates shuffle once
    on user_id and the latency frame is one row per converter. All
    interval math on exact integer microseconds (unix_micros ≡ DuckDB
    epoch_us — the ADVICE round-2 boundary-exactness pattern);
    percentile() ≡ quantile_cont keeps the summary engine-exact."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(
            (F.min(F.unix_micros("ts")) - F.unix_micros(F.min("first_view"))).alias(
                "us"
            )
        )
    )
    return p.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.expr("percentile(us, 0.5)") / 1e6, 6).alias("p50_s"),
        F.round(F.expr("percentile(us, 0.9)") / 1e6, 6).alias("p90_s"),
        F.round(F.max("us") / 1e6, 6).alias("max_s"),
    )


# ---------------------------------------------------------------------------
# weekly seasonality profile (hour-of-day x day-of-week)
# ---------------------------------------------------------------------------

_SEASONALITY_SQL = """
SELECT CAST(extract(dow FROM ts) AS INTEGER) AS dow,
       CAST(extract(hour FROM ts) AS INTEGER) AS hour,
       count(*) AS n_events,
       round(sum(CAST(value AS DECIMAL(18,2))) * 1.0 / count(*), 6) AS avg_value
FROM events
GROUP BY dow, hour
"""


@register("events_weekly_seasonality", oracle=_SEASONALITY_SQL, tags=("events", "temporal"))
def events_weekly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality heat-map input: event volume and average value
    per (day-of-week, hour-of-day) cell — at most 168 output rows from
    any input size, one map-side-combined aggregate. Cross-engine trap
    handled explicitly: Spark's dayofweek() is 1-based Sunday=1 while
    DuckDB's extract(dow) is 0-based Sunday=0, so the Spark side shifts
    by one instead of letting the two numbering conventions silently
    misalign; averages divide an exact DECIMAL sum by the count."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.dayofweek("ts") - 1).cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")) * 1.0
                / F.count(F.lit(1)),
                6,
            ).alias("avg_value"),
        )
    )


# ---------------------------------------------------------------------------
# mergeable fixed-bin quantile sketch (histogram quantiles)
# ---------------------------------------------------------------------------

QSK_VMIN = 0.0     # fixed sketch domain: bins are data-INdependent so
QSK_VMAX = 512.0   # per-partition count vectors merge by pure addition
QSK_BINS = 64
QSK_W = (QSK_VMAX - QSK_VMIN) / QSK_BINS   # 8.0


def _qsk_est_sql(p: float) -> str:
    return (
        f"round(max(CASE WHEN cum >= {p} * n AND cum - cnt < {p} * n "
        f"THEN {QSK_VMIN} + {QSK_W} * (bin + ({p} * n - (cum - cnt)) / cnt) "
        f"END), 6)"
    )


_QSK_SQL = f"""
WITH binned AS (
  SELECT event_type,
         least(greatest(CAST(floor((value - {QSK_VMIN}) / {QSK_W}) AS BIGINT), 0),
               {QSK_BINS - 1}) AS bin
  FROM events
),
counts AS (SELECT event_type, bin, count(*) AS cnt FROM binned GROUP BY 1, 2),
cum AS (
  SELECT event_type, bin, cnt,
         CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS BIGINT) AS cum,
         CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM counts
)
SELECT event_type, n AS n_events,
       {_qsk_est_sql(0.5)} AS est_p50,
       {_qsk_est_sql(0.9)} AS est_p90,
       {_qsk_est_sql(0.99)} AS est_p99
FROM cum GROUP BY event_type, n
"""


@register("events_quantile_sketch", oracle=_QSK_SQL, tags=("events", "sketch"))
def events_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram quantile estimation over a FIXED-bin sketch — the
    mergeable quantile structure monitoring systems (Prometheus
    histogram_quantile) and streaming aggregators use: 64 equi-width
    bins over a data-independent domain [0, 512), per-type counts, and
    p50/p90/p99 recovered by linear interpolation inside the bin where
    the cumulative count crosses p·n. Out-of-domain values clamp to the
    edge bins. Fifth mergeable sketch in the engine (count-min, HLL,
    Bloom, SQ8 codes): because the bins are fixed, the per-partition
    count vectors merge by pure addition — Spark's partial aggregation
    IS the sketch merge, and the same vectors could accumulate across
    streaming micro-batches or clusters with no bounds pass (unlike
    events_value_histogram, whose data-dependent bounds need a prior
    global min/max). Estimation error: the estimate lands in the same
    bin as the ceil(p·n)-th order statistic, so it is within one bin
    width of the inverse-CDF quantile (pinned in tests/test_approx.py;
    note percentile_cont's order-statistic interpolation can straddle
    a bin boundary, so the bound is stated against percentile_disc).
    Exact quantiles at 100 TB would need a full sort per group.
    Streaming twin: streaming/pipeline.py::streaming_quantile_sketch
    maintains the same structure per event-time hour under a watermark
    (merge across micro-batches = stateful count addition),
    equivalence-tested in tests/test_streaming.py.

    Scale shape: bin assignment is a narrow map-side expression; the
    count matrix is at most |types|·64 rows after one partially
    aggregated shuffle; the cumulative window and the interpolation
    run on that tiny frame. Nothing scales with row count after the
    first aggregate."""
    return quantile_sketch_frame(load_table(spark, sf_dir, "events"))


def qsk_bin(value: F.Column) -> F.Column:
    """Fixed-domain bin assignment shared by the batch sketch and the
    streaming twin (streaming/pipeline.py) — one definition so the two
    structures can never drift apart."""
    return F.least(
        F.greatest(
            F.floor((value - F.lit(QSK_VMIN)) / F.lit(QSK_W)).cast("long"),
            F.lit(0),
        ),
        F.lit(QSK_BINS - 1),
    )


def quantile_sketch_frame(ev: DataFrame) -> DataFrame:
    """The sketch lineage over any (event_type, value) frame — shared
    by the registered query and the Hypothesis property test
    (tests/test_llmprep_properties.py), which checks the
    one-bin-width-vs-order-statistic bound on arbitrary generated
    distributions including out-of-domain clamping."""
    counts = (
        ev.select("event_type", qsk_bin(F.col("value")).alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wcum = Window.partitionBy("event_type").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy("event_type")
    cum = counts.select(
        "event_type",
        "bin",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )

    def est(p: float) -> F.Column:
        target = F.lit(p) * F.col("n")
        cond = (F.col("cum") >= target) & ((F.col("cum") - F.col("cnt")) < target)
        interp = F.lit(QSK_VMIN) + F.lit(QSK_W) * (
            F.col("bin") + (target - (F.col("cum") - F.col("cnt"))) / F.col("cnt")
        )
        return F.round(F.max(F.when(cond, interp)), 6)

    return cum.groupBy("event_type", F.col("n").alias("n_events")).agg(
        est(0.5).alias("est_p50"),
        est(0.9).alias("est_p90"),
        est(0.99).alias("est_p99"),
    )


# ---------------------------------------------------------------------------
# last-touch revenue attribution
# ---------------------------------------------------------------------------

ATTR_WINDOW_US = 24 * 3600 * 1_000_000  # credit window: 24 h in microseconds

_ATTR_SQL = f"""
WITH seq AS (
  SELECT user_id, event_type, value, epoch_us(ts) AS tus,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS touch_type,
         last_value(CASE WHEN event_type <> 'purchase' THEN epoch_us(ts) END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS touch_tus
  FROM events
),
credited AS (
  SELECT CASE WHEN touch_tus IS NOT NULL
                   AND tus - touch_tus <= {ATTR_WINDOW_US}
              THEN touch_type ELSE 'unattributed' END AS channel,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM seq WHERE event_type = 'purchase'
)
SELECT channel,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(cents) AS BIGINT) AS revenue_cents
FROM credited GROUP BY channel
"""


@register("events_attribution_last_touch", oracle=_ATTR_SQL, tags=("events",))
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH revenue attribution — the marketing-analytics
    companion of events_time_to_convert (which measures latency;
    this assigns CREDIT): every purchase is attributed to the user's
    most recent preceding non-purchase event, but only if it happened
    within a 24 h window; otherwise the revenue lands in the
    'unattributed' bucket. Revenue travels as exact integer cents and
    the window ordering ties break on event_id, so the credit
    assignment is engine-exact. One carry-forward window per user (the
    LOCF shape of events_gap_fill_locf, applied to a conditional
    column) — no self-join of purchases against candidate touches.

    Scale shape: ONE shuffle on user_id for the ordered carry-forward
    window (linear per-user state, the sessionize discipline), then a
    map-side credit CASE and a ≤|event types|-group hash-agg. An
    interval self-join (purchase × prior events) would shuffle the
    square of the touch density; the carry-forward form never
    materializes a pair."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    non_purchase = F.col("event_type") != "purchase"
    seq = ev.select(
        "user_id",
        "event_type",
        "value",
        F.unix_micros(F.col("ts")).alias("tus"),
        F.last(F.when(non_purchase, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
        F.last(F.when(non_purchase, F.unix_micros(F.col("ts"))), ignorenulls=True)
        .over(w)
        .alias("touch_tus"),
    )
    credited = seq.filter(F.col("event_type") == "purchase").select(
        F.when(
            F.col("touch_tus").isNotNull()
            & (F.col("tus") - F.col("touch_tus") <= ATTR_WINDOW_US),
            F.col("touch_type"),
        )
        .otherwise("unattributed")
        .alias("channel"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    return credited.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("cents").alias("revenue_cents"),
    )


# ---------------------------------------------------------------------------
# Holt double-exponential forecast, compiled to a one-pass weighted scan
# ---------------------------------------------------------------------------

HOLT_ALPHA = 0.5
HOLT_BETA = 0.3
HOLT_DAYS = 30               # the fixture window: 2024-01-01 .. 01-30
HOLT_QUANT = 1_000_000       # per-term products quantized to micro-units


def _holt_weights() -> tuple[list[float], list[float]]:
    """Coefficient vectors expressing Holt's level/trend recurrence as
    LINEAR functionals of the day series: l_t = a·y_t + (1-a)(l+tr),
    tr_t = b·(l_t - l_prev) + (1-b)·tr, init l_1 = y_1,
    tr_1 = y_2 - y_1. Because the recurrence is linear with constant
    smoothing, l_30 and tr_30 are fixed weighted sums over y_1..y_30 —
    computed ONCE here, so the engines never iterate."""
    n = HOLT_DAYS
    lvl = [0.0] * n
    trd = [0.0] * n
    lvl[0] = 1.0                       # l_1 = y_1
    trd[0], trd[1] = -1.0, 1.0         # tr_1 = y_2 - y_1
    for t in range(1, n):              # steps 2..30 (0-indexed)
        prev_l, prev_t = lvl[:], trd[:]
        lvl = [(1 - HOLT_ALPHA) * (pl + pt) for pl, pt in zip(prev_l, prev_t)]
        lvl[t] += HOLT_ALPHA
        trd = [
            HOLT_BETA * (nl - pl) + (1 - HOLT_BETA) * pt
            for nl, pl, pt in zip(lvl, prev_l, prev_t)
        ]
    return lvl, trd


_HOLT_LVL, _HOLT_TRD = _holt_weights()
_HOLT_FC = [lw + tw for lw, tw in zip(_HOLT_LVL, _HOLT_TRD)]  # l_30 + tr_30


def _lit_list_sql(ws: list[float]) -> str:
    return "[" + ", ".join(repr(w) for w in ws) + "]"


_HOLT_SQL = f"""
WITH spine AS (
  SELECT t.event_type, d.d
  FROM (SELECT DISTINCT event_type FROM events) t,
       (SELECT unnest(range({HOLT_DAYS})) AS d) d
),
daily AS (
  SELECT event_type, date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
series AS (
  SELECT s.event_type, s.d, coalesce(daily.y, 0) AS y
  FROM spine s LEFT JOIN daily ON s.event_type = daily.event_type AND s.d = daily.d
),
terms AS (
  SELECT event_type, y,
         CAST(round({_lit_list_sql(_HOLT_LVL)}[d + 1] * y * {HOLT_QUANT}) AS BIGINT) AS lq,
         CAST(round({_lit_list_sql(_HOLT_FC)}[d + 1] * y * {HOLT_QUANT}) AS BIGINT) AS fq
  FROM series
)
SELECT event_type,
       CAST(sum(y) AS BIGINT) AS n_events,
       round(sum(lq) * 1.0 / {HOLT_QUANT}, 4) AS level_now,
       round(sum(fq) * 1.0 / {HOLT_QUANT}, 4) AS forecast_next
FROM terms GROUP BY event_type
"""


@register("events_forecast_holt", oracle=_HOLT_SQL, tags=("events", "temporal"))
def events_forecast_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential-smoothing forecast of next-day event
    volume per type — with the RECURRENCE COMPILED AWAY: level and
    trend under constant smoothing are linear functionals of the day
    series, so the 30-step recurrence collapses at import time into
    two literal 30-weight vectors and the engines run ONE weighted
    scan — no driver loop, no per-step sync, no window. Each
    weight·count product is quantized to integer micro-units before
    the sum (the micro-nat discipline), so the aggregate is exact and
    order-free in both engines. Missing days enter as exact zeros via
    a generated day spine.

    Scale shape: the daily tally is one (type, day) hash-agg that
    absorbs raw volume map-side; everything after operates on
    |types|·30 rows. The pattern generalizes: ANY constant-coefficient
    linear recurrence (EWMA, Holt, discounted returns) should ship as
    a precomputed weight vector + one quantized dot product, never as
    an iterative job — iteration count is a compile-time property,
    not a runtime one."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias("d"),
        )
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(
        F.broadcast(
            ev.sparkSession.range(HOLT_DAYS).select(F.col("id").cast("int").alias("d"))
        )
    )
    series = spine.join(daily, ["event_type", "d"], "left").select(
        "event_type", "d", F.coalesce("y", F.lit(0)).alias("y")
    )
    lvl_arr = F.array(*[F.lit(w) for w in _HOLT_LVL])
    fc_arr = F.array(*[F.lit(w) for w in _HOLT_FC])
    terms = series.select(
        "event_type",
        "y",
        F.round(F.element_at(lvl_arr, F.col("d") + 1) * F.col("y") * HOLT_QUANT)
        .cast("bigint")
        .alias("lq"),
        F.round(F.element_at(fc_arr, F.col("d") + 1) * F.col("y") * HOLT_QUANT)
        .cast("bigint")
        .alias("fq"),
    )
    return terms.groupBy("event_type").agg(
        F.sum("y").alias("n_events"),
        F.round(F.sum("lq") / HOLT_QUANT, 4).alias("level_now"),
        F.round(F.sum("fq") / HOLT_QUANT, 4).alias("forecast_next"),
    )


# ---------------------------------------------------------------------------
# A/B experiment analysis: hash-assigned arms, conversion lift, z-stat
# ---------------------------------------------------------------------------

AB_Q = 1_000_000  # conversion rates in parts-per-million (integer)

_AB_ASSIGN_SQL = '(' + X.md5_long_sql("CAST(user_id AS VARCHAR)") + ' % 2)'

_AB_SQL = f"""
WITH assigned AS (
  SELECT user_id, {_AB_ASSIGN_SQL} AS arm,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS revenue_cents
  FROM events GROUP BY user_id
),
arms AS (
  SELECT arm,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(converted) AS BIGINT) AS n_converted,
         CAST(sum(revenue_cents) AS BIGINT) AS revenue_cents
  FROM assigned GROUP BY arm
)
SELECT arm, n_users, n_converted, revenue_cents,
       CAST(n_converted * {AB_Q} // n_users AS BIGINT) AS conversion_ppm,
       CASE WHEN (SELECT sum(n_converted) FROM arms) = 0
              OR (SELECT sum(n_converted) FROM arms)
                 = (SELECT sum(n_users) FROM arms)
            THEN NULL
            ELSE round(
              (n_converted * 1.0 / n_users
               - (SELECT sum(n_converted) * 1.0 / sum(n_users) FROM arms))
              / sqrt(
                  (SELECT sum(n_converted) * 1.0 / sum(n_users) FROM arms)
                  * (1 - (SELECT sum(n_converted) * 1.0 / sum(n_users) FROM arms))
                  / n_users),
              4) END AS z_vs_pooled
FROM arms
"""


@register("events_ab_test_analysis", oracle=_AB_SQL, tags=("events", "agg"))
def events_ab_test_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment-analysis readout — the family every product events
    pipeline ends in: users are hash-assigned to two arms (md5 % 2 —
    the deterministic assignment discipline of split_train_holdout, so
    re-ingestion never reshuffles arms), and each arm reports users,
    converters (>= 1 purchase), exact integer-ppm conversion, integer-
    cents revenue, and its z-statistic against the pooled conversion
    rate (the two-proportion test numerator/denominator in one rounded
    double — every input to it an exact integer ratio, so both engines
    divide the same numbers).

    Scale shape: one user-keyed hash-agg absorbs the event stream
    (converted = max of a CASE — no per-user ordering needed), then a
    2-group tally; the pooled rate is a 1-row broadcast. Nothing
    scales past the user dimension, and the assignment is a pure
    map-side hash — the query form of a metrics pipeline that at
    100 TB runs as one shuffle."""
    ev = load_table(spark, sf_dir, "events")
    is_purchase = F.col("event_type") == "purchase"
    assigned = (
        ev.select(
            "user_id",
            (X.md5_long(F.col("user_id").cast("string")) % 2).alias("arm"),
            F.when(is_purchase, 1).otherwise(0).alias("conv"),
            F.when(is_purchase, F.round(F.col("value") * 100).cast("bigint"))
            .otherwise(0)
            .alias("cents"),
        )
        .groupBy("user_id", "arm")
        .agg(
            F.max("conv").alias("converted"),
            F.sum("cents").alias("revenue_cents"),
        )
    )
    arms = assigned.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_converted"),
        F.sum("revenue_cents").alias("revenue_cents"),
    )
    pooled = arms.agg(
        (F.sum("n_converted") / F.sum("n_users")).alias("p_pool")
    )
    # a degenerate experiment (nobody or everybody converts) has no
    # defined z-statistic — NULL, not a divide-by-zero (ANSI mode)
    z = F.when(
        (F.col("p_pool") > 0) & (F.col("p_pool") < 1),
        F.round(
            (F.col("n_converted") / F.col("n_users") - F.col("p_pool"))
            / F.sqrt(F.col("p_pool") * (1 - F.col("p_pool")) / F.col("n_users")),
            4,
        ),
    )
    return arms.crossJoin(F.broadcast(pooled)).select(
        "arm",
        "n_users",
        "n_converted",
        "revenue_cents",
        F.expr(f"CAST(n_converted * {AB_Q} DIV n_users AS BIGINT)").alias(
            "conversion_ppm"
        ),
        z.alias("z_vs_pooled"),
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint detection (Page 1954) on the hourly event rate
# ---------------------------------------------------------------------------

CUSUM_SLACK_DIV = 2   # slack k = mean/2: alarm accumulates past 1.5x mean
CUSUM_H_MULT = 3      # alarm threshold h = 3x mean (cumulative excess hours)

_CUSUM_SQL = f"""
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL 1 HOUR, ts) AS hour_start,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT event_type,
         CAST((CAST(sum(x) AS BIGINT) * 1000) // CAST(count(*) AS BIGINT)
              AS BIGINT) AS mean_milli
  FROM hourly GROUP BY 1
),
d AS (
  SELECT h.event_type, h.hour_start, m.mean_milli,
         h.x * 1000 - m.mean_milli - (m.mean_milli // {CUSUM_SLACK_DIV}) AS d
  FROM hourly h JOIN m ON h.event_type = m.event_type
),
p AS (
  SELECT event_type, hour_start, mean_milli,
         sum(d) OVER (PARTITION BY event_type ORDER BY hour_start
                      ROWS UNBOUNDED PRECEDING) AS p
  FROM d
),
s AS (
  SELECT event_type, hour_start, mean_milli,
         p - least(CAST(0 AS BIGINT),
                   min(p) OVER (PARTITION BY event_type ORDER BY hour_start
                                ROWS UNBOUNDED PRECEDING)) AS s
  FROM p
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_hours,
       CAST(min(mean_milli) AS BIGINT) AS mean_milli,
       CAST(sum(CASE WHEN s >= {CUSUM_H_MULT} * mean_milli THEN 1 ELSE 0 END)
            AS BIGINT) AS n_alarm_hours,
       min(CASE WHEN s >= {CUSUM_H_MULT} * mean_milli THEN hour_start END)
         AS first_alarm,
       CAST(max(s) AS BIGINT) AS max_cusum_milli
FROM s GROUP BY event_type
"""


@register("events_changepoint_cusum", oracle=_CUSUM_SQL, tags=("events", "temporal"))
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM changepoint detector (Page 1954) on the hourly
    event rate per type: s_i = max(0, s_{i-1} + (x_i − μ − k)) with
    slack k = μ/2 and alarm threshold h = 3μ — the sequential test an
    ops pipeline runs to catch a sustained rate shift that no
    single-point z-score flags. The recursive max is NOT a window
    function; it distributes via the prefix-sum identity
    s_i = P_i − min(0, min_{j≤i} P_j) (P = running sum of the slacked
    deviations), so the whole detector is two stacked running
    aggregates over each series — no iteration, no UDF.

    Determinism: μ is quantized to integer milli-events/hour by floor
    division before any use, so deviations, prefix sums, and alarms
    are pure BIGINT arithmetic (hour buckets make series order total —
    one row per (type, hour)).

    Scale shape: the data-sized step is the hourly hash-agg (map-side
    partials); everything after operates on |types| × |hours| rows —
    bounded by calendar time, not data volume. The per-type window
    sort is the only per-series state; a type's series at 100 TB is
    still just its hour count (~9k rows/year). Detects rate INCREASES
    on observed hours (an absent hour has no row; pair with
    events_resample_1h's spine when downshift detection matters)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_start")
    ).agg(F.count(F.lit(1)).alias("x"))
    return cusum_from_hourly(hourly)


def cusum_from_hourly(hourly: DataFrame) -> DataFrame:
    """Read-side CUSUM over a (event_type, hour_start, x) hourly count
    table — shared verbatim by the batch query above and the streaming
    twin (streaming/changepoint.py), so the streamed detector is
    value-identical to the batch one by construction."""
    m = hourly.groupBy("event_type").agg(
        F.expr("(sum(x) * 1000) div count(1)").alias("mean_milli")
    )
    d = hourly.join(m, "event_type").select(
        "event_type",
        "hour_start",
        "mean_milli",
        (
            F.col("x") * 1000
            - F.col("mean_milli")
            - F.expr(f"mean_milli div {CUSUM_SLACK_DIV}")
        ).alias("d"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = d.withColumn("p", F.sum("d").over(w))
    s = p.withColumn(
        "s", F.col("p") - F.least(F.lit(0).cast("long"), F.min("p").over(w))
    )
    alarm = F.col("s") >= CUSUM_H_MULT * F.col("mean_milli")
    return s.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.min("mean_milli").alias("mean_milli"),
        F.sum(F.when(alarm, 1).otherwise(0)).alias("n_alarm_hours"),
        F.min(F.when(alarm, F.col("hour_start"))).alias("first_alarm"),
        F.max("s").alias("max_cusum_milli"),
    )
