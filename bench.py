#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is executed to completion with a full-result noop write (no
driver-side collect), which measures the whole Catalyst plan including
the final exchange.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from k8s_log_etl_spark.plans.registry import load_all
    from k8s_log_etl_spark.session import get_spark

    # -Xbatch: block on JIT compilation instead of interpreting. With
    # ~26 distinct codegen'd plans in one JVM the compile queue backs
    # up, and a heavy single-task stage that starts while its methods
    # wait in queue runs interpreted for its whole life (measured: the
    # same query bimodally takes 1-3 s or 60-70 s). Blocking costs a few
    # hundred ms per stage and removes the 20-70 s interpreted tail.
    spark = get_spark(
        app_name="k8s-log-etl-spark-bench",
        extra_conf={"spark.driver.extraJavaOptions": "-Xbatch"},
    )
    specs = load_all()
    bench_specs = {n: s for n, s in specs.items() if s.bench}

    # Input prep (not query work): materialize the JSONL files for the
    # target SF. Then warm codegen+JIT by running every bench query once
    # at sf0.001 — the generated classes are identical across scale
    # factors, so the timed runs below measure steady-state execution
    # rather than HotSpot compiling the generated code.
    from k8s_log_etl_spark.queries.log_queries import events_jsonl_path

    events_jsonl_path(spark, sf_dir)
    warm_dir = "/root/testdata/sf0.001"
    for name, spec in sorted(bench_specs.items()):
        spec.fn(spark, warm_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name, spec in sorted(bench_specs.items()):
        start = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - start, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
