"""streaming/sketches.py: the streamed CMS register table and its
read-side point estimates must be VALUE-IDENTICAL to the batch
agg_countmin_events on the same data, independent of micro-batch
cuts — registers are order-free integer sums, so 3-way streaming
accumulation must reproduce the batch sketch bit-for-bit."""

from __future__ import annotations

import json
import os

from k8s_log_etl_spark.queries.relational import (
    agg_countmin_events,
    cms_hashed,
    cms_registers,
)
from k8s_log_etl_spark.streaming.sketches import (
    cms_serve_estimates,
    streaming_cms_registers,
)
from k8s_log_etl_spark.tables import load_table


def test_streamed_cms_matches_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    rows = ev.select("event_id", "event_type").collect()

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    third = (len(rows) + 2) // 3
    for i in range(3):
        p = os.path.join(in_dir, f"b{i}.jsonl")
        with open(p, "w") as f:
            for r in rows[i * third : (i + 1) * third]:
                f.write(
                    json.dumps(
                        {"event_id": r["event_id"], "event_type": r["event_type"]}
                    )
                    + "\n"
                )
        os.utime(p, (1_700_000_000 + i * 60,) * 2)

    stream = (
        spark.readStream.schema("event_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
    )
    q = (
        streaming_cms_registers(stream)
        .writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["i"], r["b"]): r["cnt"]
        for r in spark.sql("SELECT i, b, cnt FROM cms_stream").collect()
    }
    batch = {
        (r["i"], r["b"]): r["cnt"]
        for r in cms_registers(cms_hashed(ev)).collect()
    }
    assert streamed == batch  # register-state identity

    live = spark.sql("SELECT i, b, cnt FROM cms_stream")
    served = {
        r["event_type"]: r["est_count"]
        for r in cms_serve_estimates(live, ev).collect()
    }
    batch_q = {
        r["event_type"]: r["est_count"]
        for r in agg_countmin_events(spark, sf_dir).collect()
    }
    assert served == batch_q  # read-side estimate identity


def test_streamed_ams_matches_batch(spark, sf_dir, tmp_path):
    """The streamed AMS register table and its read-side F2 estimates
    must be value-identical to the batch sketch on the same data,
    independent of micro-batch cuts — registers are order-free +-1
    integer sums, estimates share the exact-median back half."""
    from pyspark.sql import functions as F

    from k8s_log_etl_spark.queries.relational import (
        agg_ams_f2_events,
        ams_registers,
    )
    from k8s_log_etl_spark.streaming.sketches import (
        ams_serve_estimates,
        streaming_ams_registers,
    )

    ev = load_table(spark, sf_dir, "events")
    rows = ev.select("event_type", "user_id").collect()

    in_dir = str(tmp_path / "ams_in")
    os.makedirs(in_dir)
    third = (len(rows) + 2) // 3
    for i in range(3):
        p = os.path.join(in_dir, f"b{i}.jsonl")
        with open(p, "w") as f:
            for r in rows[i * third : (i + 1) * third]:
                f.write(
                    json.dumps(
                        {"event_type": r["event_type"], "user_id": r["user_id"]}
                    )
                    + "\n"
                )
        os.utime(p, (1_700_000_000 + i * 60,) * 2)

    stream = (
        spark.readStream.schema("event_type string, user_id long")
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
    )
    q = (
        streaming_ams_registers(stream)
        .writeStream.format("memory")
        .queryName("ams_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["event_type"], r["i"], r["b"]): r["c"]
        for r in spark.sql("SELECT * FROM ams_stream").collect()
    }
    batch = {
        (r["event_type"], r["i"], r["b"]): r["c"]
        for r in ams_registers(ev, ["event_type"], F.col("user_id")).collect()
    }
    assert streamed == batch  # register-state identity

    live = spark.sql("SELECT * FROM ams_stream")
    served = {
        r["event_type"]: r["f2_est"]
        for r in ams_serve_estimates(live).collect()
    }
    batch_q = {
        r["event_type"]: r["f2_est"]
        for r in agg_ams_f2_events(spark, sf_dir).collect()
    }
    assert served == batch_q  # read-side estimate identity
