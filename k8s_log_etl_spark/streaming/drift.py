"""Streaming drift monitoring: the online face of dq_psi_value_drift.

The stream maintains only the (event_type, bin) COUNT TABLE of the
live population — bounded state (|types| · PSI_BINS rows), merged by
pure addition every micro-batch, exactly the mergeable-summary
discipline of streaming_quantile_sketch. PSI against a static baseline
is recovered at READ time from that tiny table with the same integer
ppm / nano-nat arithmetic the batch query uses, so the streamed
monitor and the batch monitor are value-identical on identical data
(pinned in tests/test_stream_drift.py).

At 100 TB/day the stream never carries shares or logs — just counts;
the alert query joins two ≤|types|·10-row frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from k8s_log_etl_spark.queries.relational import PSI_BIN_COL, PSI_NANO, PSI_Q


def streaming_drift_bins(df: DataFrame) -> DataFrame:
    """The live population's bin-count table: one stateful aggregation
    on (event_type, log-width value bin). State is bounded by the bin
    grid, so complete-mode output stays tiny forever."""
    return df.groupBy("event_type", PSI_BIN_COL().alias("bin")).agg(
        F.count(F.lit(1)).alias("n_new")
    )


def psi_from_bins(baseline: DataFrame, live: DataFrame) -> DataFrame:
    """Read-side PSI: join the static baseline bin counts
    (event_type, bin, n_old) against the streamed live counts
    (event_type, bin, n_new), zero-filling one-sided bins, and emit
    the exact integer-ppm shares and nano-nat PSI terms of the batch
    monitor — same columns, same arithmetic, hash-identical values."""
    cells = (
        baseline.join(live, ["event_type", "bin"], "full_outer")
        .select(
            "event_type",
            "bin",
            F.coalesce("n_old", F.lit(0)).cast("bigint").alias("n_old"),
            F.coalesce("n_new", F.lit(0)).cast("bigint").alias("n_new"),
        )
    )
    tot = cells.groupBy("event_type").agg(
        F.sum("n_old").alias("t_old"), F.sum("n_new").alias("t_new")
    )
    shares = cells.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "bin",
        "n_old",
        "n_new",
        F.expr(f"CAST(n_old * {PSI_Q} DIV t_old AS BIGINT)").alias("share_old_ppm"),
        F.expr(f"CAST(n_new * {PSI_Q} DIV t_new AS BIGINT)").alias("share_new_ppm"),
    )
    psi = F.when(
        (F.col("share_old_ppm") == 0) | (F.col("share_new_ppm") == 0),
        F.lit(None).cast("bigint"),
    ).otherwise(
        F.round(
            ((F.col("share_new_ppm") - F.col("share_old_ppm")) / PSI_Q)
            * F.log(F.col("share_new_ppm") / F.col("share_old_ppm"))
            * PSI_NANO
        ).cast("bigint")
    )
    return shares.select(
        "event_type", "bin", "n_old", "n_new",
        "share_old_ppm", "share_new_ppm", psi.alias("psi_term_nano"),
    )
