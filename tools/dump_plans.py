"""Dump .explain("formatted") for chosen queries into plans/r13/.

Usage:
    python tools/dump_plans.py before q1_pricing_summary ...
    python tools/dump_plans.py after  q1_pricing_summary ...
    python tools/dump_plans.py before --bench        # all bench heads

Plans are built at sf0.001 (plan shape is scale-independent; building
at bench scale would pay full input prep). Iterative driver-loop
queries (cc_star, _qc_fit) EXECUTE their sync points during plan
construction — that is inherent to capturing their final-frame plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from k8s_log_etl_spark.plans.registry import load_all  # noqa: E402
from k8s_log_etl_spark.session import get_spark  # noqa: E402

SF = os.environ.get("PLAN_DUMP_SF_DIR", "/root/testdata/sf0.001")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", os.environ.get("PLAN_DUMP_ROUND", "r14"))


def main() -> int:
    tag = sys.argv[1]
    assert tag in ("before", "after"), "first arg must be before|after"
    names = sys.argv[2:]
    specs = load_all()
    if "--bench" in names:
        names = [n for n, s in sorted(specs.items()) if s.bench]
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name="plan-dump", master="local[4]",
                      shuffle_partitions=4)
    for name in names:
        df = specs[name].fn(spark, SF)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
