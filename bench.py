#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is executed to completion with a full-result noop write (no
driver-side collect), which measures the whole Catalyst plan including
the final exchange.

Timing protocol (standing since round 11): three full passes over the
bench set in alternating name order (asc, desc, asc); per-query
headline = MEDIAN of the three samples, with min-of-3 carried in
`queries_min` as the like-for-like bridge to the pre-r11 best-of-2
series. The interleaving makes the committed numbers robust to the
1.5x consecutive-run order effects that previously cost a manual
worktree A/B every round.
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time


# The round-2 bench set: the standing cross-round comparability core.
# Every later round's set is a superset; BASELINE.md adjudicates
# regressions on this matched subset, so bench.py computes the
# arithmetic itself (round-4 verdict #5) instead of leaving it to
# hand sums in prose.
R2_CORE_15 = [
    "corpus_clean_pipeline", "dedup_minhash_lsh", "dedup_simhash_banded",
    "join_asof_last_purchase", "knn_lsh_hyperplane", "pipeline_events",
    "pipeline_events_report", "q1_pricing_summary", "q3_top_unshipped",
    "q5_regional_revenue", "stream_session_windows", "stream_tumbling_counts",
    "text_quality_score", "tfidf_top_terms", "window_topk_per_customer",
]


# ---------------------------------------------------------------------------
# Calibration anchor (round-6 verdict #1): two straight rounds of perf
# adjudication rested on builder-side reruns inside a documented ±35%
# cross-session host-throughput band. Every bench run now measures a
# FIXED synthetic workload (pure JVM-side hash-agg over spark.range —
# no I/O, no shuffle, codegen'd like the real queries) at START and END
# of the run, and matched_subtotals carry both raw seconds and seconds
# normalized to the pinned reference host throughput, so a genuine
# 1.1-1.2× regression is separable from session drift without reruns.
# ---------------------------------------------------------------------------

CAL_ROWS_SINGLE = 40_000_000  # one partition: single-core throughput
CAL_ROWS_WIDE = 40_000_000 * 32  # 32 partitions: full-width throughput

#: Reference host throughput, pinned in the round-7 session that also
#: established that session's matched subtotals (BASELINE.md round 7,
#: "Calibration anchor"). Normalization: sec_norm = sec * (ref / measured)
#: using the wide32 number (bench queries are 32-wide workloads), with
#: measured = mean(start, end).
CAL_REF_WIDE32_SEC = 1.24


def _calibration(spark) -> dict:
    """Min-of-3 timing of the fixed single-core and 32-wide hash-agg
    loops. Min dodges transient spikes but still reflects session-level
    host slowness (hypervisor tenancy) — exactly the drift to normalize
    out. The double xxhash64 keeps the loop compute-bound; the tiny
    warmup run triggers codegen+JIT so the timed runs are steady-state."""
    from pyspark.sql import functions as F
    import time as _t

    def loop(parts: int, rows: int):
        # pmod bounds the summand so the 40M-row sum can't overflow
        # int64 under ANSI mode; both hashes still run per row.
        return spark.range(0, rows, 1, parts).select(
            F.sum(F.pmod(F.xxhash64(F.xxhash64("id")), F.lit(1 << 20))).alias("h")
        )

    loop(32, 320_000).collect()  # JIT warm (same generated class shape)
    out = {}
    for key, parts, rows in (
        ("single_core_sec", 1, CAL_ROWS_SINGLE),
        ("wide32_sec", 32, CAL_ROWS_WIDE),
    ):
        best = float("inf")
        for _ in range(3):
            t0 = _t.perf_counter()
            loop(parts, rows).collect()
            best = min(best, _t.perf_counter() - t0)
        out[key] = round(best, 3)
    out["python_kernel_sec"] = _python_calibration()
    return out


#: Reference band for the Python-side probe below: the perceptual
#: decode kernel micro-benches 1.10-1.23 s per 20k payloads on a clean
#: host (PLANS.md round-10), i.e. ~0.28-0.31 s for the 5k probe.
CAL_REF_PY5K_SEC = 0.30


def _python_calibration() -> list[float]:
    """Python-side host probe: 5 reps of the perceptual decode kernel
    (single-threaded numpy, no Spark) on 5k synthetic payloads. The JVM
    calibration above is blind to this dimension — the round-12 session
    measured the JVM anchor AT reference (1.19/0.97 vs 1.24) while this
    exact kernel ran BIMODAL 1.25/3.9 s per 20k, alternating reps
    (hypervisor tenancy hitting the Python/numpy side only), inflating
    every mapInPandas-heavy head ~2x. All 5 samples are recorded, not a
    min: bimodality IS the signal. Read: min near CAL_REF_PY5K_SEC and
    median ~2x+ above it = contended session — adjudicate
    mapInPandas-heavy heads on mins, and don't re-pin decade numbers."""
    from k8s_log_etl_spark.operators.multimodal import decoded_block_sums_batch
    import time as _t

    payloads = [("payload-%08d-" % i).encode() * 8 for i in range(5_000)]
    decoded_block_sums_batch(payloads[:500])  # warm allocators
    vals = []
    for _ in range(5):
        t0 = _t.perf_counter()
        decoded_block_sums_batch(payloads)
        vals.append(round(_t.perf_counter() - t0, 3))
    return vals


def _cal_factor(cal: dict | None) -> float | None:
    """Normalization factor from a calibration block: ref / measured
    wide32, measured = mean of the start/end samples present."""
    if not cal:
        return None
    vals = [
        cal[k]["wide32_sec"]
        for k in ("start", "end")
        if isinstance(cal.get(k), dict) and "wide32_sec" in cal[k]
    ]
    if not vals:
        return None
    return CAL_REF_WIDE32_SEC / (sum(vals) / len(vals))


def _bench_files(here: str) -> list[str]:
    return sorted(
        (f for f in os.listdir(here) if re.fullmatch(r"BENCH_r\d+\.json", f)),
        key=lambda f: int(re.search(r"\d+", f).group()),
    )


def _current_round(here: str):
    """This round's number: $SPARK_GRAFT_ROUND or argv[1] when given,
    else newest committed BENCH round + 1 (right whenever this round's
    own file hasn't been written yet — round-5 ADVICE)."""
    return _current_round_ex(here)[0]


def _current_round_ex(here: str):
    """(round, inferred): `inferred` is True when the number came from
    the newest-BENCH-file heuristic rather than an explicit
    $SPARK_GRAFT_ROUND / argv pin — the artifact write path refuses to
    overwrite an existing BENCH_full_r{N}.json on an inferred round
    (round-13 verdict #6/#8: the driver's own post-judgment re-run
    inferred N+1 and wrote a misleading next-round artifact)."""
    for raw in (
        os.environ.get("SPARK_GRAFT_ROUND"),
        sys.argv[1] if len(sys.argv) > 1 else None,
    ):
        if raw and re.fullmatch(r"\d+", raw.strip()):
            return int(raw.strip()), False
    benches = _bench_files(here)
    if benches:
        inferred = int(re.search(r"\d+", benches[-1]).group()) + 1
        print(
            f"bench: round inferred as {inferred} (newest BENCH_r file "
            f"+ 1) — WRONG after the driver writes this round's file; "
            f"set SPARK_GRAFT_ROUND to pin on re-runs (round-12 ADVICE)",
            file=sys.stderr,
        )
        return inferred, True
    return None, True


def _artifact_target(here: str, cur: int, inferred: bool) -> str:
    """Where the full artifact lands. Round-13 verdict #8: an INFERRED
    round number must never overwrite an artifact that already exists
    for that round — the driver's own post-judgment re-run hit exactly
    this and committed a misleading BENCH_full_r14.json. Re-runs on a
    judged tree land in a clearly-labeled side file instead."""
    target = os.path.join(here, f"BENCH_full_r{cur:02d}.json")
    if inferred and os.path.exists(target):
        print(
            f"bench: {os.path.basename(target)} already exists and the "
            f"round was inferred — writing BENCH_full_inferred.json "
            f"instead; set SPARK_GRAFT_ROUND to pin",
            file=sys.stderr,
        )
        return os.path.join(here, "BENCH_full_inferred.json")
    return target


def _balanced_object_after(text: str, key: str):
    """Parse the {...} object following '"key": ' in a (possibly
    truncated) JSON text by balanced-brace scan — the recovery path for
    the round driver's bounded output capture (it keeps the LAST 2000
    chars of bench stdout; from round 11 the committed `samples` block
    made the JSON line longer than that, so the driver's own parse
    yields null and the head of the line is gone, but trailing blocks
    survive intact inside the tail)."""
    i = text.find(f'"{key}": {{')
    if i < 0:
        return None
    s = text[i + len(f'"{key}": '):]
    depth = 0
    for j, ch in enumerate(s):
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0:
                try:
                    return json.loads(s[: j + 1])
                except json.JSONDecodeError:
                    return None
    return None


def _load_prev_bench(here: str, prev_file: str):
    """(median timings, calibration factor) for a previous round's
    bench, by preference: the full artifact bench.py writes from round
    12 on (BENCH_full_r*.json), then the driver file's parsed block,
    then tail reconstruction (balanced-brace samples extraction +
    factor regex). Returns (None, None) when nothing is recoverable."""
    full = os.path.join(here, prev_file.replace("BENCH_r", "BENCH_full_r"))
    if os.path.exists(full):
        try:
            with open(full) as f:
                d = json.load(f)
            # sf guard: only trust a full artifact recorded at the
            # driver's bench scale — a smoke-run artifact (sf0.001)
            # would silently corrupt the medians comparison.
            if d.get("sf", 0) >= 0.05 and d.get("queries"):
                return d["queries"], _cal_factor(d.get("calibration"))
        except (json.JSONDecodeError, OSError):
            pass
    try:
        with open(os.path.join(here, prev_file)) as f:
            wrapper = json.load(f)
    except (json.JSONDecodeError, OSError):
        return None, None
    parsed = wrapper.get("parsed")
    if isinstance(parsed, dict) and "queries" in parsed:
        return parsed["queries"], _cal_factor(parsed.get("calibration"))
    tail = wrapper.get("tail") or ""
    samples = _balanced_object_after(tail, "samples")
    if not samples:
        return None, None
    medians = {
        n: sorted(v)[len(v) // 2]
        for n, v in samples.items()
        if isinstance(v, list) and v
    }
    m = re.search(r'"factor": ([0-9.]+)', tail)
    factor = float(m.group(1)) if m else None
    return medians, factor


def _matched_subtotals(
    timings: dict[str, float],
    cal: dict | None = None,
    mins: dict[str, float] | None = None,
) -> dict:
    """Machine-checked cross-round comparability: the r2-core-15
    subtotal, plus current-vs-previous-round subtotals over the
    intersection of query sets. "Previous" = the newest BENCH_r*.json
    in the repo root whose round is STRICTLY below the current round —
    once the driver has written this round's own file, a naive
    newest-file pick would compare the run against its own numbers
    (round-5 ADVICE). Current round comes from $SPARK_GRAFT_ROUND or
    argv[1] when given; otherwise it defaults to newest-round + 1
    (right whenever this round's file hasn't been written yet).

    Each subtotal carries raw seconds AND `sec_norm` (seconds scaled by
    this run's calibration factor to the pinned reference host
    throughput); when the previous round's BENCH file carries its own
    calibration block, `prev_sec_norm` is computed from THAT run's
    factor, so the normalized pair compares code on a common
    synthetic-throughput scale (round-6 verdict #1).

    `sec_min` (when ``mins`` is given) is the min-of-3 subtotal: the
    round-11 protocol change (interleaved median-of-3 replacing
    consecutive best-of-2) structurally raised medians ~1.3x because a
    query's back-to-back second run was measured hot; min-of-3 over the
    interleaved passes is the like-for-like bridge to every BENCH file
    before r11 (best-of ~= min)."""
    factor = _cal_factor(cal)
    here = os.path.dirname(os.path.abspath(__file__))
    out: dict = {
        "r2_core_15": {
            "n": sum(1 for n in R2_CORE_15 if n in timings),
            "sec": round(sum(timings.get(n, 0.0) for n in R2_CORE_15), 3),
        }
    }
    if mins is not None:
        out["r2_core_15"]["sec_min"] = round(
            sum(mins.get(n, 0.0) for n in R2_CORE_15), 3
        )
    if factor is not None:
        out["r2_core_15"]["sec_norm"] = round(out["r2_core_15"]["sec"] * factor, 3)
        if mins is not None:
            out["r2_core_15"]["sec_min_norm"] = round(
                out["r2_core_15"]["sec_min"] * factor, 3
            )
    benches = _bench_files(here)
    cur_round = _current_round(here)
    benches = [f for f in benches if int(re.search(r"\d+", f).group()) < (cur_round or 0)]
    if benches:
        prev_file = benches[-1]
        prev, prev_factor = _load_prev_bench(here, prev_file)
        if not prev:
            return out
        matched = sorted(set(prev) & set(timings))
        block = {
            "n": len(matched),
            "sec": round(sum(timings[n] for n in matched), 3),
            "prev_sec": round(sum(prev[n] for n in matched), 3),
        }
        if mins is not None:
            block["sec_min"] = round(sum(mins[n] for n in matched), 3)
        if factor is not None:
            block["sec_norm"] = round(block["sec"] * factor, 3)
            if mins is not None:
                block["sec_min_norm"] = round(block["sec_min"] * factor, 3)
        if prev_factor is not None:
            block["prev_sec_norm"] = round(block["prev_sec"] * prev_factor, 3)
        out["vs_" + prev_file.removesuffix(".json")] = block
    return out


def _pipe_ms(block: dict) -> int:
    """Summed pipelineTime (ms, across-task accumulator sums) of a
    head's operator-metrics block — the numerator of the effective-
    parallelism ratio (PLANS.md round-12 interpretation rules)."""
    return sum(
        op.get("pipelineTime", 0) for op in block.get("ops", ())
    )


def _operator_metrics_vs_prev(
    operator_metrics: dict[str, dict],
    timings: dict[str, float],
    here: str,
) -> dict | None:
    """Machine-flagged cross-round PLAN drift (round-12 verdict #5):
    per-head node/exchange counts and the pipe_ms/wall effective-
    parallelism ratio, diffed against the previous round's committed
    BENCH_full artifact. Interpretation rules (PLANS.md round 12): an
    exchange appearing is a new shuffle; a parallelism ratio
    collapsing toward 1 is the single-row-group scan trap;
    checkpoint-fed heads read near-zero by construction and are
    diagnosed on COUNT stability only. `drift` lists the heads a human
    should look at; `heads` carries the full comparison so the look
    needs no worktree re-run."""
    cur_round = _current_round(here)
    benches = [
        f
        for f in _bench_files(here)
        if int(re.search(r"\d+", f).group()) < (cur_round or 0)
    ]
    if not benches:
        return None
    prev_file = benches[-1].replace("BENCH_r", "BENCH_full_r")
    try:
        with open(os.path.join(here, prev_file)) as f:
            prev = json.load(f)
    except (json.JSONDecodeError, OSError):
        return None
    prev_om = prev.get("operator_metrics") or {}
    prev_q = prev.get("queries") or {}
    heads: dict[str, dict] = {}
    drift: list[str] = []
    for name in sorted(set(operator_metrics) & set(prev_om)):
        c, p = operator_metrics[name], prev_om[name]
        row: dict = {
            "n_nodes": [p.get("n_nodes"), c.get("n_nodes")],
            "n_exchanges": [p.get("n_exchanges"), c.get("n_exchanges")],
        }
        par = []
        for block, wall in ((p, prev_q.get(name)), (c, timings.get(name))):
            pipe = _pipe_ms(block)
            par.append(
                round(pipe / 1000.0 / wall, 1) if wall and wall > 0 else None
            )
        row["parallelism"] = par
        heads[name] = row
        if row["n_exchanges"][0] != row["n_exchanges"][1]:
            drift.append(
                f"{name}: exchanges {row['n_exchanges'][0]} -> "
                f"{row['n_exchanges'][1]}"
            )
        elif row["n_nodes"][0] != row["n_nodes"][1]:
            drift.append(
                f"{name}: nodes {row['n_nodes'][0]} -> {row['n_nodes'][1]}"
            )
        if (
            par[0] is not None
            and par[1] is not None
            and par[0] >= 4.0
            and par[1] <= par[0] / 3.0
        ):
            drift.append(
                f"{name}: parallelism {par[0]}x -> {par[1]}x (collapse)"
            )
    return {"prev": prev_file, "drift": drift, "heads": heads}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from k8s_log_etl_spark.plans.registry import load_all
    from k8s_log_etl_spark.session import get_spark

    # HotSpot refuses to JIT methods over 8000 bytecodes by default
    # (DontCompileHugeMethods), and Spark's whole-stage-codegen'd plans
    # here (16-way minhash aggregate, the multi-stage corpus pipeline)
    # routinely exceed that — the hot stage then runs interpreted for
    # its whole life (measured: the same query bimodally takes 1-3 s or
    # 20-70 s). Allow huge-method compilation, give the code cache room
    # for ~26 distinct codegen'd plans, and widen the background
    # compiler pool so compilation keeps up with 32 executor threads.
    # (-Xbatch — blocking compilation — was measured strictly worse:
    # every thread serializes on the compile queue.)
    spark = get_spark(
        app_name="k8s-log-etl-spark-bench",
        extra_conf={
            "spark.driver.extraJavaOptions": (
                "-XX:-DontCompileHugeMethods "
                "-XX:ReservedCodeCacheSize=512m "
                "-XX:CICompilerCount=8"
            )
        },
    )
    specs = load_all()
    bench_specs = {n: s for n, s in specs.items() if s.bench}

    cal = {"start": _calibration(spark)}

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

    # Two-order interleaved median-of-3 (round-10 verdict #2, standing
    # protocol): consecutive heavy JVM runs show execution-ORDER
    # effects up to 1.5x on identical code (r9/r10 adjudications each
    # burned a manual worktree A/B on this), so per-query timing is now
    # three full passes over the bench set — ascending, descending,
    # ascending name order — with the per-query MEDIAN as the headline
    # number. The median drops both the order-effect tail and any
    # residual one-time tier-4 JIT hit on a query's first full-scale
    # run (the sf0.001 warmup triggers codegen+load but not always
    # compilation); `samples` carries all three per-pass numbers so a
    # cross-round drift question reads the spread directly instead of
    # re-running worktrees.
    from k8s_log_etl_spark.operators.plan_metrics import executed_plan_metrics

    def _operator_block(rows: list[dict]) -> dict:
        """Compact per-head plan fingerprint for the BENCH artifact
        (round-11 verdict #6): the time-valued SQL metrics plus
        per-node output rows off the executed plan, and the exchange
        count — enough to diagnose cross-round plan drift (a scan
        suddenly dominating, an exchange appearing) from committed
        data instead of a live worktree session."""
        ops = []
        for idx, r in enumerate(rows):
            keep = {
                k: v
                for k, v in r["metrics"].items()
                if k in ("scanTime", "aggTime", "pipelineTime", "numOutputRows")
            }
            if keep:
                ops.append({"i": idx, "op": r["op"], **keep})
        return {
            "n_nodes": len(rows),
            "n_exchanges": sum(1 for r in rows if "Exchange" in r["op"]),
            "ops": ops,
        }

    names_sorted = sorted(bench_specs)
    samples: dict[str, list[float]] = {n: [] for n in names_sorted}
    operator_metrics: dict[str, dict] = {}
    for pass_i in range(3):
        order = names_sorted if pass_i % 2 == 0 else names_sorted[::-1]
        for name in order:
            spec = bench_specs[name]
            # Queries that localCheckpoint intermediates leave multi-GB
            # blocks in the block manager until BOTH garbage collectors
            # have run: Python must drop its DataFrame (and via py4j the
            # JVM-side plan holding the checkpointed RDD), then the JVM
            # GC lets ContextCleaner reclaim the blocks. Skipping either
            # leaves blocks piling up and later runs degrade
            # monotonically (measured: 6.7 -> 10.6 -> 15.5 s without
            # this, flat ~4 s with).
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            start = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.perf_counter() - start, 3))
    timings = {n: sorted(s)[1] for n, s in samples.items()}
    timings_min = {n: min(s) for n, s in samples.items()}

    # Fourth, UNTIMED metrics pass, after all three timed passes
    # (round-12 ADVICE: collecting these inside pass 3 re-executed
    # each plan between pass-3 timed runs, so later pass-3 samples ran
    # in a dirtier JVM/page-cache than rounds <= 11 — a systematic
    # perturbation of one of the three samples feeding the cross-round
    # median comparison). The noop save above ran a SEPARATE
    # QueryExecution (the write command's plan), so each df's own
    # executedPlan never ran and its accumulators are zero; execute it
    # once JVM-side (InternalRow count, no Python transfer) to
    # populate them, then read. Observability only — a failure here
    # must not kill the bench.
    for name in names_sorted:
        try:
            df = bench_specs[name].fn(spark, sf_dir)
            df._jdf.queryExecution().executedPlan().execute().count()
            operator_metrics[name] = _operator_block(
                executed_plan_metrics(df)
            )
        except Exception:
            pass

    cal["end"] = _calibration(spark)
    cal["ref_wide32_sec"] = CAL_REF_WIDE32_SEC
    factor = _cal_factor(cal)
    if factor is not None:
        cal["factor"] = round(factor, 4)

    total = round(sum(timings.values()), 3)
    # Execution-width evidence (round-13 verdict #4): the artifact
    # itself proves which core count ran — the driver benches at two
    # widths to measure scaling, and its r13 scaling block false-
    # alarmed `suspect_cpus_ignored` because nothing in the JSON line
    # said local[8] vs local[32]. `cpus` echoes the env contract,
    # `default_parallelism` what the live context actually used, and
    # the calibration block's fixed 32-partition wide-kernel pair is
    # the independent witness (reads ~2.9x slower at 8 cores).
    width = {
        "env_cpus": os.environ.get("SPARK_GRAFT_CPUS"),
        "default_parallelism": spark.sparkContext.defaultParallelism,
        "master": spark.sparkContext.master,
    }
    # Key order matters: the round driver keeps only the LAST 2000
    # chars of this output (BENCH_r*.json `tail`), and from round 11
    # the committed `samples` made the line overflow that — so the big
    # diagnostic blocks go FIRST and the cross-round essentials
    # (queries medians, matched_subtotals) go LAST, inside the
    # surviving window. The complete artifact is also written to
    # BENCH_full_r{N}.json, which the end-of-round commit picks up and
    # _load_prev_bench prefers next round.
    result = {
        "metric": "headline_queries_total_runtime",
        "unit": "sec",
        "sf": sf,
        "order_protocol": "median-of-3, passes in asc/desc/asc name order",
        "operator_metrics": operator_metrics,
        "operator_metrics_vs_prev": _operator_metrics_vs_prev(
            operator_metrics, timings, os.path.dirname(os.path.abspath(__file__))
        ),
        "samples": samples,
        "queries_min": timings_min,
        "calibration": cal,
        "cpus": width,
        "value": total,
        "queries": timings,
        "matched_subtotals": _matched_subtotals(timings, cal, timings_min),
    }
    here = os.path.dirname(os.path.abspath(__file__))
    cur, inferred = _current_round_ex(here)
    # sf guard: never let a smoke run (sf0.001) overwrite the round's
    # committed full-scale artifact — next round's medians comparison
    # reads this file.
    if cur is not None and sf >= 0.05:
        with open(_artifact_target(here, cur, inferred), "w") as f:
            json.dump(result, f)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
