"""Semantics tests for text_kneser_ney_lm and dq_benford_first_digit
against pure-Python references."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from k8s_log_etl_spark.queries.llmprep import (
    KN_DISCOUNT_MILLI,
    TRAIN_PCT,
    _KN_Q,
)


def md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def py_kn(docs: dict[int, str]):
    """Reference interpolated-KN bigram scorer mirroring the query's
    exact integer-ratio arithmetic."""
    bg = {
        did: list(zip(w, w[1:]))
        for did, t in docs.items()
        for w in [[x for x in t.strip().split() if x]]
    }
    train = {d: g for d, g in bg.items() if md5_long(str(d)) % 100 < TRAIN_PCT}
    test = {d: g for d, g in bg.items() if md5_long(str(d)) % 100 >= TRAIN_PCT}
    c2: dict[tuple[str, str], int] = {}
    for g in train.values():
        for p in g:
            c2[p] = c2.get(p, 0) + 1
    c1: dict[str, int] = {}
    n1p: dict[str, int] = {}
    n1pc: dict[str, int] = {}
    for (a, b), n in c2.items():
        c1[a] = c1.get(a, 0) + n
        n1p[a] = n1p.get(a, 0) + 1
        n1pc[b] = n1pc.get(b, 0) + 1
    nbt = len(c2)
    v = len({b for _, b in c2})
    out = {}
    for did, grams in test.items():
        tot = 0
        for a, b in grams:
            if a not in c1:
                num = _KN_Q * (n1pc.get(b, 0) + 1)
                den = _KN_Q * (nbt + v)
            else:
                num = max(_KN_Q * c2.get((a, b), 0) - KN_DISCOUNT_MILLI, 0) * (
                    nbt + v
                ) + KN_DISCOUNT_MILLI * n1p[a] * (n1pc.get(b, 0) + 1)
                den = _KN_Q * c1[a] * (nbt + v)
            tot += round(math.log(den / num) * 1_000_000)
        out[did] = (len(grams), tot)
    return out


def _write_docs(tmp_path, docs: dict[int, str]):
    pd.DataFrame(
        {
            "doc_id": list(docs),
            "text": list(docs.values()),
            "lang": ["en"] * len(docs),
            "source": ["s"] * len(docs),
            "n_chars": [len(t) for t in docs.values()],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def test_kneser_ney_matches_python_reference(spark, tmp_path):
    from k8s_log_etl_spark.queries.llmprep import text_kneser_ney_lm

    # enough ids that both split sides are populated
    base = "san francisco is big but san diego is warm and san jose is near"
    docs = {i: f"{base} doc{i % 3} tail{i % 5}" for i in range(1, 40)}
    docs[40] = "completely unseen context francisco here"  # OOV-context doc
    d = _write_docs(tmp_path, docs)
    want = py_kn(docs)
    assert want, "hand corpus produced no held-out docs — adjust ids"
    got = {
        r.doc_id: (r.n_bigrams, r.sum_nll_micro)
        for r in text_kneser_ney_lm(spark, d).collect()
    }
    assert got == want


def test_kneser_ney_continuation_beats_raw_frequency(spark, tmp_path):
    """The family-defining property: 'francisco' is FREQUENT in train
    but only ever follows 'san', so under an unseen context its KN
    continuation probability is low — scored WORSE (higher nll) than a
    word of equal frequency seen after many contexts."""
    from k8s_log_etl_spark.queries.llmprep import text_kneser_ney_lm

    versatile = [f"w{i} cat" for i in range(8)]  # 'cat' follows 8 contexts
    train_text = "san francisco " * 8 + " ".join(versatile)
    docs = {i: train_text for i in range(1, 30)}
    # find two held-out ids
    held = [i for i in range(100, 200) if md5_long(str(i)) % 100 >= TRAIN_PCT][:2]
    docs[held[0]] = "zzz francisco"  # unseen context -> Pcont(francisco)
    docs[held[1]] = "zzz cat"        # unseen context -> Pcont(cat)
    d = _write_docs(tmp_path, docs)
    got = {r.doc_id: r.sum_nll_micro for r in text_kneser_ney_lm(spark, d).collect()}
    assert got[held[0]] > got[held[1]]  # francisco is the worse continuation


def test_benford_hand_values(spark, tmp_path):
    from k8s_log_etl_spark.queries.relational import dq_benford_first_digit

    prices = [1.00, 19.99, 123.45, 1999.00, 2.50, 29.00, 3.33, 0.99, 950.00]
    pd.DataFrame(
        {
            "o_orderkey": range(1, len(prices) + 1),
            "o_custkey": [1] * len(prices),
            "o_orderstatus": ["F"] * len(prices),
            "o_totalprice": prices,
            "o_orderpriority": ["1-URGENT"] * len(prices),
        }
    ).to_parquet(tmp_path / "orders.parquet", index=False)
    got = {r.digit: r.asDict() for r in dq_benford_first_digit(spark, str(tmp_path)).collect()}
    # first digits of cents-integers: 100->1, 1999->1, 12345->1, 199900->1,
    # 250->2, 2900->2, 333->3, 99->9, 95000->9
    assert got[1]["n_orders"] == 4
    assert got[2]["n_orders"] == 2
    assert got[3]["n_orders"] == 1
    assert got[9]["n_orders"] == 2
    assert set(got) == {1, 2, 3, 9}
    assert got[1]["benford_ppm"] == round(math.log(2) / math.log(10) * 1_000_000)
    assert got[1]["share_ppm"] == (4 * 1_000_000) // 9
    assert got[1]["delta_ppm"] == got[1]["share_ppm"] - got[1]["benford_ppm"]
