from __future__ import annotations

import os
import sys
from concurrent.futures import ThreadPoolExecutor

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from k8s_log_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # local[8] (round-14): the suite must finish inside the round
    # driver's pytest window (round-13 verdict #2 — the driver's run
    # expired at ~90% of 45 min). The heavy tests (ANN recall at
    # 20k/100k vectors, the full-surface sweeps) are data-bound and
    # scale with executor threads; the tiny parametrized tests are
    # driver-bound and indifferent. No test depends on width (the
    # cross-engine exactness discipline is partitioning-independent by
    # construction; drive_entry's DRIVE_CPUS re-run exists to prove it).
    spark = get_spark(
        app_name="k8s-log-etl-spark-tests", master="local[8]", shuffle_partitions=8
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


# ---------------------------------------------------------------------------
# Concurrent full-surface sweep helper (round-14, guide §2.6)
# ---------------------------------------------------------------------------

#: Queries whose first run BUILDS a shared persisted artifact under
#: dataset_cache_path (BM25 segment index, minhash corpus index,
#: classifier weight store). Two of them racing on a cold cache would
#: exercise the lost-race republish paths rather than the queries under
#: test, so each group runs serially inside ONE pool task; everything
#: else fans out freely.
_ARTIFACT_GROUPS = ("bm25", "minhash_index", "minhash_incremental", "quality_")


def run_surface(names, run_one, workers: int = 8):
    """Run `run_one(name)` for every name on a bounded thread pool and
    return {name: (ok: bool, value_or_exception)}.

    The full-surface sweeps (every registered query against a
    pathological corpus; every oracled query against DuckDB) are
    embarrassingly parallel: each query is an independent Spark action
    whose wall-clock is dominated by per-query driver latency
    (Catalyst analysis + py4j + job scheduling), exactly the §2.6
    overlap-independent-jobs case. Spark's scheduler runs concurrent
    jobs FIFO; job descriptions are thread-local. Assertions stay in
    the CALLER — this helper only moves the work off a serial loop
    (same queries, same checks, same failure attribution)."""
    buckets: dict[str, list[str]] = {}
    for n in names:
        key = next((g for g in _ARTIFACT_GROUPS if g in n), None)
        buckets.setdefault(key or f"solo:{n}", []).append(n)

    results: dict[str, tuple[bool, object]] = {}

    def _run_bucket(bucket_names):
        out = []
        for n in bucket_names:
            try:
                out.append((n, (True, run_one(n))))
            except Exception as e:  # noqa: BLE001 — caller decides
                out.append((n, (False, e)))
        return out

    with ThreadPoolExecutor(max_workers=workers) as pool:
        for chunk in pool.map(_run_bucket, buckets.values()):
            results.update(dict(chunk))
    return results
