"""Time a single registered query head in isolation, bench-identically
(same JVM flags, sf0.001 JIT warmup, gc discipline, noop sink), and
print a per-JOB wall-time breakdown from the app status store — the
measurement face guide §1 asks for: where each head's wall-clock
actually goes (driver-loop heads run many jobs; the bench number is
their sum plus driver time between them).

Usage:
    python tools/time_head.py split_group_aware [more ...] [--reps 3]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from k8s_log_etl_spark.plans.registry import load_all  # noqa: E402
from k8s_log_etl_spark.session import get_spark  # noqa: E402


def _jobs_since(spark, first_job_id: int) -> list[dict]:
    store = spark._sc._jsc.sc().statusStore()
    it = store.jobsList(None).iterator()
    raw = []
    while it.hasNext():
        raw.append(it.next())
    out = []
    for j in raw:
        jid = j.jobId()
        if jid < first_job_id:
            continue
        sub = j.submissionTime()
        comp = j.completionTime()
        dur = None
        if sub.isDefined() and comp.isDefined():
            dur = (comp.get().getTime() - sub.get().getTime()) / 1000.0
        out.append(
            {
                "id": jid,
                "sec": dur,
                "tasks": j.numCompletedTasks(),
                "desc": (j.description().get() if j.description().isDefined() else "")[:90],
            }
        )
    return sorted(out, key=lambda r: r["id"])


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    specs = load_all()
    spark = get_spark(
        app_name="time-head",
        extra_conf={
            "spark.driver.extraJavaOptions": (
                "-XX:-DontCompileHugeMethods "
                "-XX:ReservedCodeCacheSize=512m "
                "-XX:CICompilerCount=8"
            )
        },
    )
    from k8s_log_etl_spark.queries.log_queries import events_jsonl_path

    events_jsonl_path(spark, sf_dir)
    warm_dir = "/root/testdata/sf0.001"
    for name in args:
        specs[name].fn(spark, warm_dir).write.format("noop").mode("overwrite").save()

    sc = spark.sparkContext
    for name in args:
        times = []
        for rep in range(reps):
            gc.collect()
            sc._jvm.System.gc()
            prior = _jobs_since(spark, 0)
            next_id = (prior[-1]["id"] + 1) if prior else 0
            t0 = time.perf_counter()
            df = specs[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            times.append(wall)
            if rep == reps - 1:  # breakdown from the LAST (steady) rep
                jobs = _jobs_since(spark, next_id)
                job_sum = sum(j["sec"] or 0 for j in jobs)
                print(f"\n== {name}: last {wall:.3f}s  all {['%.3f' % t for t in times]}")
                print(f"   jobs {len(jobs)}, job-wall sum {job_sum:.3f}s, "
                      f"driver gap {wall - job_sum:.3f}s")
                for j in jobs:
                    print(f"   job {j['id']:>4} {j['sec'] if j['sec'] is not None else -1:7.3f}s "
                          f"tasks={j['tasks']:<5} {j['desc']}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
