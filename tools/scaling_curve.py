"""Scaling-curve measurement: run selected headline queries at every
available scale factor and print time-vs-data-size ratios — the
empirical check behind the "would this survive 100×?" design notes in
PLANS.md. A query whose 0.01→0.1 ratio is near the 10× data growth is
scan/shuffle bound (scales linearly — fine); a ratio well above the
data growth means super-linear work (a red flag no docstring should
survive); well below means fixed overhead still dominates at sf0.1.

Usage:
    python tools/scaling_curve.py                       # default set
    python tools/scaling_curve.py q1_pricing_summary …  # chosen set
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from k8s_log_etl_spark.plans.registry import load_all  # noqa: E402
from k8s_log_etl_spark.session import get_spark  # noqa: E402

# Override with SCALE_SFS="dir1,dir2,..." (e.g. to append a
# tools/synth_scale.py output for the data-linear regime).
SFS = [
    s
    for s in os.environ.get(
        "SCALE_SFS",
        "/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1",
    ).split(",")
    if s
]

DEFAULT = [
    "training_mix_pipeline",
    "corpus_clean_pipeline",
    "dedup_minhash_lsh",
    "dedup_simhash_banded",
    "q7_volume_shipping",
    "q1_pricing_summary",
    "events_dau_wau",
    "knn_lsh_hyperplane",
]


def main() -> int:
    names = sys.argv[1:] or DEFAULT
    specs = load_all()
    spark = get_spark(app_name="scaling-curve")

    # JIT/codegen warmup at the smallest SF (same classes at every SF).
    for n in names:
        specs[n].fn(spark, SFS[0]).write.format("noop").mode("overwrite").save()

    ratio_hdr = " ".join(
        f"{'r(' + os.path.basename(SFS[i + 1]) + '/' + os.path.basename(SFS[i]) + ')':>22s}"
        for i in range(len(SFS) - 1)
    )
    print(f"{'query':34s} " + " ".join(f"{os.path.basename(s):>9s}" for s in SFS)
          + ("   " + ratio_hdr if ratio_hdr else ""))
    for n in names:
        times = []
        for sf in SFS:
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                specs[n].fn(spark, sf).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            times.append(best)
        ratios = " ".join(
            f"{times[i + 1] / times[i]:22.2f}" for i in range(len(times) - 1)
        )
        print(f"{n:34s} " + " ".join(f"{t:9.3f}" for t in times)
              + ("   " + ratios if ratios else ""))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
