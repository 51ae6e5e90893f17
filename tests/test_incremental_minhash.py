"""Incremental near-dup (dedup_minhash_incremental): probing the
persisted band index with only the new batch must reach the SAME
verdicts as a full recompute — the delta is an optimization, never a
semantics change.
"""

from __future__ import annotations

import os
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from k8s_log_etl_spark.queries.dedup import (
    dedup_minhash_incremental,
    dedup_minhash_lsh,
)
from k8s_log_etl_spark.queries.llmprep import CORPUS_MAX_ID

SF = "/root/testdata/sf0.01"


def test_index_probe_equals_full_recompute(spark):
    """Derive the per-source counts from dedup_minhash_lsh's FULL
    corpus+batch pair recompute (restricted to the batch side) and
    require the incremental query to reproduce them exactly: same
    signatures, same band scheme, same estimate threshold — so
    index-probe == full-join on every verdict."""
    if not os.path.exists(os.path.join(SF, "documents.parquet")):
        pytest.skip("sf0.01 testdata not present")
    pairs = dedup_minhash_lsh(spark, SF).collect()
    docs = {
        r["doc_id"]: r["source"]
        for r in spark.read.parquet(os.path.join(SF, "documents.parquet"))
        .select("doc_id", "source")
        .collect()
    }
    # doc_a < doc_b and corpus ids all precede batch ids, so a
    # corpus-batch pair always has doc_a in the corpus
    dup_corpus = {
        r["doc_b"]
        for r in pairs
        if r["doc_a"] < CORPUS_MAX_ID <= r["doc_b"]
    }
    dup_batch = {r["doc_b"] for r in pairs if r["doc_a"] >= CORPUS_MAX_ID}
    expect: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0, 0])
    for doc_id, source in docs.items():
        if doc_id < CORPUS_MAX_ID:
            continue
        e = expect[source]
        e[0] += 1
        if doc_id in dup_corpus:
            e[1] += 1
        elif doc_id in dup_batch:
            e[2] += 1
        else:
            e[3] += 1

    got = {
        r["source"]: [
            r["n_new"],
            r["n_neardup_vs_corpus"],
            r["n_neardup_within_batch"],
            r["n_unique"],
        ]
        for r in dedup_minhash_incremental(spark, SF).collect()
    }
    assert got == dict(expect)
    # the split must actually exercise both paths at this SF
    total = [sum(v[i] for v in got.values()) for i in range(4)]
    assert total[1] > 0 and total[3] > 0


def test_synthetic_batch_verdicts(spark, tmp_path, monkeypatch):
    """Hand-built corpus: one batch doc near-duplicates a corpus doc,
    one near-duplicates an earlier batch doc, one is unique — the
    three verdicts land in the right buckets."""
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    other = (
        "one two three four five six seven eight nine ten eleven "
        "twelve thirteen fourteen fifteen sixteen"
    )
    import k8s_log_etl_spark.queries.dedup as DD

    monkeypatch.setattr(DD, "CORPUS_MAX_ID", 100)
    rows = [
        (1, base, "en", "web", len(base)),          # corpus
        (2, other, "en", "web", len(other)),        # corpus
        (100, base + " omega", "en", "web", 1),     # batch: near-dup of corpus 1
        (101, base + " psi chi", "en", "web", 1),   # batch: near-dup of corpus 1 AND of 100
        (102, "totally different words entirely unique content here "
              "nothing shared with anything else at all", "en", "web", 1),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["source"]: r for r in DD.dedup_minhash_incremental(spark, str(tmp_path)).collect()
    }
    r = got["web"]
    assert r["n_new"] == 3
    assert r["n_neardup_vs_corpus"] == 2   # 100 and 101 both match corpus doc 1
    assert r["n_neardup_within_batch"] == 0  # 101 already flagged vs corpus
    assert r["n_unique"] == 1


def test_serve_variant_probe_plan_and_flatness(spark):
    """dedup_minhash_index_serve (round-6 verdict #4) must probe the
    persisted index with the BATCH side broadcast — the corpus-sized
    index is never shuffled or sorted — and its per-run work is
    batch-sized: the serve plan must contain a BroadcastHashJoin on
    (band, bsig) and no CartesianProduct; the index parquet must exist
    after one call (build-once amortization)."""
    import os

    from k8s_log_etl_spark.queries.dedup import (
        dedup_minhash_index_serve,
        mh_corpus_index_path,
    )

    sf = "/root/testdata/sf0.01"
    idx = mh_corpus_index_path(spark, sf)
    assert os.path.exists(os.path.join(idx, "_SUCCESS"))
    df = dedup_minhash_index_serve(spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # serving output equals the incremental semantics restricted to the
    # fixed window: every batch doc is counted exactly once
    rows = df.collect()
    assert sum(r["n_new"] for r in rows) == 100
    # the three categories are mutually exclusive and exhaustive
    for r in rows:
        assert r["n_new"] == (
            r["n_neardup_vs_corpus"] + r["n_neardup_within_batch"] + r["n_unique"]
        )
