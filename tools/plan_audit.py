"""Physical-plan audit over every registered query (the re-runnable
form of the PLANS.md tables): for each query, count shuffle boundaries
and flag the plan features that matter at 100 TB.

Usage:
    python tools/plan_audit.py            # all queries, sf0.001
    python tools/plan_audit.py q1_pricing_summary corpus_clean_pipeline

Columns:
    exch   — number of Exchange operators (shuffle boundaries)
    flags  — CART  CartesianProduct (forbidden everywhere)
             NLJ   BroadcastNestedLoopJoin (only OK for brute baselines)
             BHJ   BroadcastHashJoin present
             SMJ   SortMergeJoin present
             WGL   WindowGroupLimit (per-group top-k pruned map-side)
             TOP   TakeOrderedAndProject (global top-k without sort)
             WIN   Window operator present
             CKPT  Scan ExistingRDD (localCheckpoint reuse)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from k8s_log_etl_spark.plans.registry import load_all  # noqa: E402
from k8s_log_etl_spark.session import get_spark  # noqa: E402

SF = os.environ.get("PLAN_AUDIT_SF_DIR", "/root/testdata/sf0.001")

FLAGS = (
    ("CART", "CartesianProduct"),
    ("NLJ", "BroadcastNestedLoopJoin"),
    ("BHJ", "BroadcastHashJoin"),
    ("SMJ", "SortMergeJoin"),
    ("WGL", "WindowGroupLimit"),
    ("TOP", "TakeOrderedAndProject"),
    ("WIN", "Window"),
    ("CKPT", "Scan ExistingRDD"),
)


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark(app_name="plan-audit", master="local[4]", shuffle_partitions=4)
    bad = []
    for name, spec in sorted(load_all().items()):
        if only and name not in only:
            continue
        try:
            plan = spec.fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:
            print(f"{name:36s} ERR {type(exc).__name__}: {exc}")
            bad.append(name)
            continue
        exch = plan.count("Exchange")
        flags = " ".join(tag for tag, frag in FLAGS if frag in plan)
        if "CartesianProduct" in plan:
            bad.append(name)
        print(f"{name:36s} exch={exch:2d}  {flags}")
    spark.stop()
    if bad:
        print("PROBLEMS:", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
