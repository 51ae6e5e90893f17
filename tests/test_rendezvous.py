"""corpus_shard_rendezvous: the minimal-disruption property must hold
exactly — growing 8 -> 9 shards moves docs ONLY into the new shard —
and the assignment must match a pure-Python argmax reference."""

from __future__ import annotations

import hashlib

import pandas as pd

from k8s_log_etl_spark.queries.llmprep import (
    RDV_SHARDS,
    corpus_shard_rendezvous,
)


def md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def py_shard(doc_id: int, n_shards: int) -> int:
    hs = [md5_long(f"{doc_id}:{s}") for s in range(n_shards)]
    return hs.index(max(hs))


def test_rendezvous_minimal_disruption_and_reference(spark, tmp_path):
    n = 400
    pd.DataFrame(
        {
            "doc_id": range(n),
            "text": [f"doc {i}" for i in range(n)],
            "lang": ["en"] * n,
            "source": ["s"] * n,
            "n_chars": [10 + i % 7 for i in range(n)],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    rows = {r["shard"]: r for r in corpus_shard_rendezvous(spark, str(tmp_path)).collect()}

    # reference assignment
    s8 = {i: py_shard(i, RDV_SHARDS) for i in range(n)}
    s9 = {i: py_shard(i, RDV_SHARDS + 1) for i in range(n)}

    # THE rendezvous property: a doc moves iff its new argmax is the
    # NEW shard — every move lands in shard RDV_SHARDS
    movers = {i for i in range(n) if s8[i] != s9[i]}
    assert all(s9[i] == RDV_SHARDS for i in movers)
    for shard, r in rows.items():
        if shard < RDV_SHARDS:
            assert r["moved_in"] == 0, f"pre-existing shard {shard} received movers"
        else:
            assert r["moved_in"] == r["n_docs_new"] == len(movers)
    # counts match the reference per shard
    for shard, r in rows.items():
        assert r["n_docs_new"] == sum(1 for i in range(n) if s9[i] == shard)
        assert r["n_docs_old"] == sum(1 for i in range(n) if s8[i] == shard)
    # the new shard takes roughly 1/(S+1) of the corpus (loose band)
    exp = n / (RDV_SHARDS + 1)
    assert 0.4 * exp <= len(movers) <= 2.0 * exp
