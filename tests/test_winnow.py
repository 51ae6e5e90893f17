"""text_winnow_fingerprints: the winnowing sketch must match a
pure-Python reference, honor the paper's guarantee (a shared run of
>= w + k - 1 words yields a shared fingerprint), and keep the
fingerprint set invariant to where a shared passage sits in a doc."""

from __future__ import annotations

import hashlib

import pandas as pd

from k8s_log_etl_spark.queries.text import (
    WINNOW_K,
    WINNOW_MIN_SHARED,
    WINNOW_W,
    text_winnow_fingerprints,
)


def md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def py_fps(text: str) -> set[int]:
    w = [x for x in text.strip().split() if x]
    g = [
        md5_long(" ".join(w[i : i + WINNOW_K]))
        for i in range(max(len(w) - WINNOW_K + 1, 0))
    ]
    if not g:
        return set()
    wl = min(WINNOW_W, len(g))
    return {min(g[i : i + wl]) for i in range(len(g) - wl + 1)}


def _write(tmp_path, texts):
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


def test_winnow_matches_python_reference_and_guarantee(spark, tmp_path):
    # a shared passage of exactly w + k - 1 = 6 words, embedded at
    # DIFFERENT offsets in two otherwise-unrelated documents
    passage = "alpha beta gamma delta epsilon zeta"
    texts = [
        f"one two three {passage} four five six seven",
        f"red orange yellow green blue indigo violet {passage}",
        "completely unrelated words nothing shared here at all today",
        "another disjoint document with its own private vocabulary set",
    ]
    d = _write(tmp_path, texts)
    rows = text_winnow_fingerprints(spark, d).collect()

    # pure-Python reference of the full pair pipeline
    fps = {i: py_fps(t) for i, t in enumerate(texts, start=1)}
    expected = {}
    for a in fps:
        for b in fps:
            if a < b:
                shared = len(fps[a] & fps[b])
                if shared >= WINNOW_MIN_SHARED:
                    expected[(a, b)] = shared
    got = {(r["doc_a"], r["doc_b"]): r["shared_fps"] for r in rows}
    assert got == expected

    # the SIGMOD-2003 guarantee: docs 1 and 2 share a >= w+k-1 run,
    # so their fingerprint SETS intersect (>= 1 shared fingerprint)
    assert len(fps[1] & fps[2]) >= 1
    # and the unrelated docs share nothing
    assert not (fps[3] & fps[4])


def test_winnow_short_docs_degrade_gracefully(spark, tmp_path):
    # fewer grams than the window: one window over all grams; fewer
    # words than k: no grams, no fingerprints, no crash
    texts = ["just four words here", "xy", "a b c d e f g h", "a b c d e f g h"]
    d = _write(tmp_path, texts)
    rows = text_winnow_fingerprints(spark, d).collect()
    fps = {i: py_fps(t) for i, t in enumerate(texts, start=1)}
    assert fps[2] == set()
    # identical docs 3 and 4 share their whole fingerprint set
    got = {(r["doc_a"], r["doc_b"]): r["shared_fps"] for r in rows}
    if len(fps[3]) >= WINNOW_MIN_SHARED:
        assert got.get((3, 4)) == len(fps[3])
