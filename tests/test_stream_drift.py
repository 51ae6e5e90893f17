"""streaming/drift.py: the streamed bin table + read-side PSI must be
VALUE-IDENTICAL to the batch dq_psi_value_drift on the same data —
the new-half population arrives over three micro-batches, the baseline
is the old half, and every (share, psi term) matches the batch rows."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from k8s_log_etl_spark.queries.relational import (
    PSI_BIN_COL,
    PSI_SPLIT_TS,
    dq_psi_value_drift,
)
from k8s_log_etl_spark.streaming.drift import psi_from_bins, streaming_drift_bins
from k8s_log_etl_spark.tables import load_table


def test_streamed_psi_matches_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    split_ts = F.lit(PSI_SPLIT_TS).cast("timestamp")
    old = ev.filter(F.col("ts") < split_ts)
    new = ev.filter(F.col("ts") >= split_ts).select(
        "event_id", F.col("ts").cast("string").alias("ts"), "event_type", "value"
    )

    # stream the NEW half in three micro-batches
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    rows = new.collect()
    third = (len(rows) + 2) // 3
    for i in range(3):
        p = os.path.join(in_dir, f"b{i}.jsonl")
        with open(p, "w") as f:
            for r in rows[i * third : (i + 1) * third]:
                f.write(
                    json.dumps(
                        {
                            "event_id": r["event_id"],
                            "ts": r["ts"],
                            "event_type": r["event_type"],
                            "value": r["value"],
                        }
                    )
                    + "\n"
                )
        os.utime(p, (1_700_000_000 + i * 60,) * 2)

    stream = (
        spark.readStream.schema(
            "event_id long, ts string, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
    )
    q = (
        streaming_drift_bins(stream)
        .writeStream.format("memory")
        .queryName("drift_bins_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    live = spark.sql("SELECT event_type, bin, n_new FROM drift_bins_stream")

    baseline = old.groupBy("event_type", PSI_BIN_COL().alias("bin")).agg(
        F.count(F.lit(1)).alias("n_old")
    )
    got = sorted(map(tuple, psi_from_bins(baseline, live).collect()))
    want = sorted(map(tuple, dq_psi_value_drift(spark, sf_dir).collect()))
    assert got == want
    assert len(got) > 0
