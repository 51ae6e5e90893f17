"""text_bm25_retrieval: the integer-exact BM25 scoring must match a
pure-Python reference on a hand corpus, self-matches must be excluded,
and the idf must be Lucene's always-positive form."""

from __future__ import annotations

import math

import pandas as pd

from k8s_log_etl_spark.queries.llmprep import (
    BM25_DELTA_HI,
    BM25_DELTA_LO,
    BM25_Q,
    BM25_QMOD,
    BM25_QW,
    BM25_TOPK,
    bm25_index_delta_serve,
    bm25_index_path,
    bm25_index_serve,
    text_bm25_retrieval,
)


def py_bm25(texts: dict[int, str]) -> list[tuple[int, int, int, int]]:
    """Loop-form reference: same tokenization (whitespace, lowercase),
    same integer math — idf_micro = round(ln((2N+2)/(2df+1)) * 1e6),
    term score = (idf_micro * 22*tf*T) // (10*T*tf + 3*T + 9*dl*N)."""
    words = {i: [w.lower() for w in t.split()] for i, t in texts.items()}
    n = len(words)
    t_total = sum(len(w) for w in words.values())
    df: dict[str, int] = {}
    for ws in words.values():
        for term in set(ws):
            df[term] = df.get(term, 0) + 1
    out = []
    for qid, ws in words.items():
        if qid % BM25_QMOD != 0:
            continue
        qts = sorted(set(ws[:BM25_QW]))
        scores: dict[int, int] = {}
        for did, dws in words.items():
            if did == qid:
                continue
            s = 0
            dl = len(dws)
            for term in qts:
                tf = dws.count(term)
                if tf == 0:
                    continue
                idf = round(
                    math.log((2 * n + 2) / (2 * df[term] + 1)) * BM25_Q
                )
                s += (idf * (22 * tf * t_total)) // (
                    10 * t_total * tf + 3 * t_total + 9 * dl * n
                )
            if s > 0:
                scores[did] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        for rn, (did, s) in enumerate(ranked[:BM25_TOPK], start=1):
            out.append((qid, did, s, rn))
    return sorted(out)


def test_bm25_matches_python_reference(spark, tmp_path):
    texts = {
        i: t
        for i, t in enumerate(
            [
                "the quick brown fox jumps over the lazy dog",
                "a quick brown dog outpaces a lazy fox",
                "machine learning models train on large corpora",
                "the corpus of training data grows very large",
                "fox and dog stories repeat common words often",
                "entirely unrelated text about spark query engines",
                "query engines optimize large analytical workloads",
                "the the the repeated stopword heavy document",
                "brown fox brown fox brown fox term frequency",
                "large large corpora corpora training training",
            ]
            * 6,  # 60 docs -> query ids 0, 25, 50
            start=0,
        )
    }
    pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts.values()],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    got = sorted(
        (r["query_id"], r["doc_id"], r["score_micro"], r["rn"])
        for r in text_bm25_retrieval(spark, str(tmp_path)).collect()
    )
    expected = py_bm25(texts)
    assert got == expected
    assert all(q != d for q, d, _, _ in got)  # no self-matches
    assert {q for q, *_ in got} == {0, 25, 50}


def test_bm25_index_serve_equals_full_recompute(spark, tmp_path):
    """The persisted-index probe must return exactly what the
    from-text recompute returns for the fixed serve batch, and the
    second serve must REUSE the index parquet (no rebuild)."""
    import os

    texts = {
        i: t
        for i, t in enumerate(
            [
                "alpha beta gamma shared vocabulary document",
                "beta gamma delta overlapping words here",
                "completely different tokens nothing shared",
                "alpha alpha alpha high term frequency doc",
                "gamma delta epsilon the long tail of terms",
                "shared vocabulary document with alpha beta",
            ]
            * 10,  # 60 docs -> query ids 0, 25, 50 (all < SERVE_QMAX)
            start=0,
        )
    }
    pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts.values()],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    serve = sorted(
        (r["query_id"], r["doc_id"], r["score_micro"], r["rn"])
        for r in bm25_index_serve(spark, str(tmp_path)).collect()
    )
    assert serve == py_bm25(texts)
    root = bm25_index_path(spark, str(tmp_path))
    marker = os.path.join(root, "totals", "_SUCCESS")
    before = os.stat(marker).st_mtime_ns
    again = sorted(
        (r["query_id"], r["doc_id"], r["score_micro"], r["rn"])
        for r in bm25_index_serve(spark, str(tmp_path)).collect()
    )
    assert again == serve
    assert os.stat(marker).st_mtime_ns == before  # reused, not rebuilt


def test_bm25_delta_merge_equals_full_recompute(spark, tmp_path):
    """Segment-merge serving: the persisted old index + a tiny delta,
    merged at serve time (postings union, df and totals summed), must
    rank exactly like a from-scratch rebuild over the full corpus —
    including when the query docs themselves live in the delta — and
    the from_delta provenance flag must mark exactly the new docs."""
    base = [
        "alpha beta gamma shared vocabulary document",
        "beta gamma delta overlapping words here",
        "completely different tokens nothing shared",
        "alpha alpha alpha high term frequency doc",
        "gamma delta epsilon the long tail of terms",
        "shared vocabulary document with alpha beta",
    ]
    # ids 380..439: 20 docs BEFORE the delta window, 40 inside it —
    # queries (%25 == 0) are 400 and 425, both new-drop docs
    texts = {380 + i: base[i % len(base)] + f" pad{i % 7}" for i in range(60)}
    assert any(BM25_DELTA_LO <= i < BM25_DELTA_HI for i in texts)
    pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts.values()],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    got = sorted(
        (r["query_id"], r["doc_id"], r["score_micro"], r["rn"], r["from_delta"])
        for r in bm25_index_delta_serve(spark, str(tmp_path)).collect()
    )
    expected = sorted(
        (q, d, s, rn, int(BM25_DELTA_LO <= d < BM25_DELTA_HI))
        for q, d, s, rn in py_bm25(texts)
    )
    assert got == expected
    assert {q for q, *_ in got} == {400, 425}
    assert any(fd == 1 for *_, fd in got)  # new docs do win slots
