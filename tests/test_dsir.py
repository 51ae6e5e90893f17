"""select_dsir_importance: importance weights must match a pure-Python
reference, and a pool doc written in the target's vocabulary must
outscore (and be selected over) one written in disjoint vocabulary."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from k8s_log_etl_spark.queries.llmprep import (
    DSIR_B,
    DSIR_Q,
    DSIR_TMOD,
    select_dsir_importance,
)


def bkt(term: str) -> int:
    return int(hashlib.md5(term.encode()).hexdigest()[:15], 16) % DSIR_B


def py_dsir(rows):
    """(doc_id, source, text) -> per-source (n_pool, n_selected,
    sum_w_micro) with KEEP = all pool docs (small fixtures select
    everything; ordering is still exercised via weights)."""
    toks = {i: [w.lower() for w in t.split() if w] for i, _, t in rows}
    tcnt: dict[int, int] = {}
    rcnt: dict[int, int] = {}
    nt = nr = 0
    for i, _, _ in rows:
        for w in toks[i]:
            if i % DSIR_TMOD == 0:
                tcnt[bkt(w)] = tcnt.get(bkt(w), 0) + 1
                nt += 1
            else:
                rcnt[bkt(w)] = rcnt.get(bkt(w), 0) + 1
                nr += 1
    lw = {
        k: round(
            math.log(
                ((tcnt.get(k, 0) + 1) * (nr + DSIR_B))
                / ((rcnt.get(k, 0) + 1) * (nt + DSIR_B))
            )
            * DSIR_Q
        )
        for k in set(tcnt) | set(rcnt)
    }
    weights = {}
    for i, src, _ in rows:
        if i % DSIR_TMOD == 0 or not toks[i]:
            continue
        weights[(i, src)] = sum(lw[bkt(w)] for w in toks[i])
    return weights


def test_dsir_weights_match_reference_and_prefer_target_like(spark, tmp_path):
    target_vocab = "science physics theorem proof lemma axiom"
    junk_vocab = "zzz qqq xxx www vvv uuu"
    rows = []
    for i in range(40):
        if i % DSIR_TMOD == 0:
            text = target_vocab  # curated seed
            src = "seed"
        elif i % 2 == 0:
            text = f"science proof axiom number {i}"  # target-like pool
            src = "good"
        else:
            text = f"zzz qqq www junk {i}"  # off-distribution pool
            src = "junk"
        rows.append((i, src, text))
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[2] for r in rows],
            "lang": ["en"] * len(rows),
            "source": [r[1] for r in rows],
            "n_chars": [len(r[2]) for r in rows],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)

    weights = py_dsir(rows)
    good = [w for (i, s), w in weights.items() if s == "good"]
    junk = [w for (i, s), w in weights.items() if s == "junk"]
    # the reference itself must separate the pools
    assert min(good) > max(junk)

    got = {
        r["source"]: r for r in select_dsir_importance(spark, str(tmp_path)).collect()
    }
    assert set(got) == {"good", "junk"}
    # with KEEP larger than the pool, everything is selected — counts
    # and the exact integer weight sums must match the reference
    for src in ("good", "junk"):
        exp_sum = sum(w for (i, s), w in weights.items() if s == src)
        assert got[src]["n_pool"] == got[src]["n_selected"]
        assert got[src]["sum_w_micro"] == exp_sum
        assert got[src]["sel_ppm"] == 1_000_000
