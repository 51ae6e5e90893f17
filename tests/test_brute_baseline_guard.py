"""The two brute O(n²) all-pairs BASELINES (dedup_simhash,
dedup_embedding_cosine) are honest references for their banded/LSH
scale paths, but until round 13 nothing MECHANICALLY stopped a 100x
caller from pointing the theta-join at a corpus it can't survive
(round-12 verdict "What's wrong" #1). Pin the fail-fast gate: over-cap
corpora refuse with a pointer to the sub-quadratic sibling, in-cap
corpora run exactly as before, and the registry tags both queries as
brute_baseline so tooling can see the class.
"""

from __future__ import annotations

import pytest

from k8s_log_etl_spark.plans.registry import load_all
from k8s_log_etl_spark.queries import dedup

SF = "/root/testdata/sf0.01"


def test_over_cap_refuses_with_scale_path_pointer(spark, monkeypatch):
    monkeypatch.setattr(dedup, "BRUTE_BASELINE_MAX_ROWS", 10)
    with pytest.raises(ValueError) as e:
        dedup.dedup_simhash(spark, SF)
    assert "dedup_simhash_banded" in str(e.value)
    assert "O(n^2)" in str(e.value)
    with pytest.raises(ValueError) as e2:
        dedup.dedup_embedding_cosine(spark, SF)
    assert "dedup_embedding_lsh" in str(e2.value)


def test_in_cap_baselines_still_run(spark):
    # sf0.01 (500 docs / 500 vectors) sits far below the cap; both
    # baselines must build and produce their pair frames unchanged
    assert dedup.dedup_simhash(spark, SF).columns == [
        "doc_a", "doc_b", "hamming",
    ]
    assert dedup.dedup_embedding_cosine(spark, SF).columns == [
        "vec_a", "vec_b", "cos_sim",
    ]


def test_registry_tags_mark_the_brute_class():
    specs = load_all()
    for name in ("dedup_simhash", "dedup_embedding_cosine"):
        assert "brute_baseline" in specs[name].tags
        assert not specs[name].bench  # never in the timed headline set
