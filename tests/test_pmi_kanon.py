"""Semantics tests for text_collocations_pmi and dq_k_anonymity on
hand corpora small enough to verify against pure-Python references."""

from __future__ import annotations

import math

import pandas as pd

from k8s_log_etl_spark.queries.relational import KANON_K, _KANON_OFFSET, KANON_BUCKET_CENTS
from k8s_log_etl_spark.queries.text import PMI_LIFT_Q, PMI_MICRO, PMI_MIN_COUNT


def _write_docs(tmp_path, texts):
    pd.DataFrame(
        {
            "doc_id": range(1, len(texts) + 1),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def py_pmi(texts):
    uni: dict[str, int] = {}
    c2: dict[tuple[str, str], int] = {}
    B = 0
    for t in texts:
        w = [x.lower() for x in t.strip().split() if x]
        for x in w:
            uni[x] = uni.get(x, 0) + 1
        for a, b in zip(w, w[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
            B += 1
    T = sum(uni.values())
    out = []
    for (a, b), n in c2.items():
        if n < PMI_MIN_COUNT:
            continue
        lift_q = (n * PMI_LIFT_Q) // (uni[a] * uni[b])
        pmi = round(
            (math.log(n * 1.0 / uni[a]) - math.log(uni[b] * 1.0 / T)
             - math.log(B * 1.0 / T)) * PMI_MICRO
        )
        out.append((a, b, n, lift_q, pmi))
    out.sort(key=lambda r: (-r[3], r[0], r[1]))
    return out[:20]


def test_pmi_matches_python_reference(spark, tmp_path):
    from k8s_log_etl_spark.queries.text import text_collocations_pmi

    texts = [
        "new york is not old york but new york is big",
        "new york new york so good they named it twice",
        "the cat sat on the mat the cat sat again",
        "hong kong and new york and hong kong again hong kong",
        "hong kong hong kong once more",
        "a b a b a b a b a b a b",
    ]
    d = _write_docs(tmp_path, texts)
    got = [
        (r.w1, r.w2, r.pair_count, r.lift_q, r.pmi_micro)
        for r in text_collocations_pmi(spark, d).collect()
    ]
    assert got == py_pmi(texts)
    # the family-defining property: an exclusive pair (hong kong)
    # outranks a frequent-but-promiscuous pair even at lower count
    names = [(a, b) for a, b, *_ in got]
    assert ("hong", "kong") in names


def test_pmi_support_floor_drops_rare_pairs(spark, tmp_path):
    from k8s_log_etl_spark.queries.text import text_collocations_pmi

    # "rare pair" appears PMI_MIN_COUNT - 1 times -> excluded;
    # "anchor pair" appears exactly PMI_MIN_COUNT times -> included
    texts = ["rare pair x"] * (PMI_MIN_COUNT - 1) + ["anchor pair2 y"] * PMI_MIN_COUNT
    d = _write_docs(tmp_path, texts)
    got = {(r.w1, r.w2) for r in text_collocations_pmi(spark, d).collect()}
    assert ("rare", "pair") not in got
    assert ("anchor", "pair2") in got


def test_k_anonymity_hand_table(spark, tmp_path):
    from k8s_log_etl_spark.queries.relational import dq_k_anonymity

    # segment A: one class of 6 (safe) + one class of 2 (below k=5)
    # segment B: a single class of 1 (below k)
    rows = (
        [("A", 1, 1500.00)] * 6
        + [("A", 2, 1500.00)] * 2
        + [("B", 1, -500.00)]
    )
    pd.DataFrame(
        {
            "c_custkey": range(1, len(rows) + 1),
            "c_name": [f"c{i}" for i in range(len(rows))],
            "c_nationkey": [r[1] for r in rows],
            "c_acctbal": [r[2] for r in rows],
            "c_mktsegment": [r[0] for r in rows],
        }
    ).to_parquet(tmp_path / "customer.parquet", index=False)
    got = {r.c_mktsegment: r.asDict() for r in dq_k_anonymity(spark, str(tmp_path)).collect()}
    assert got["A"]["n_rows"] == 8 and got["A"]["n_classes"] == 2
    assert got["A"]["k_min"] == 2
    assert got["A"]["classes_below_k"] == 1 and got["A"]["rows_below_k"] == 2
    assert got["A"]["risk_ppm"] == (2 * 1_000_000) // 8
    assert got["B"]["k_min"] == 1 and got["B"]["risk_ppm"] == 1_000_000
    # negative balance buckets stay positive after the offset
    assert (round(-500.00 * 100) + _KANON_OFFSET) // KANON_BUCKET_CENTS >= 0
    assert KANON_K == 5
