"""Semantics tests for corpus_source_overlap and text_readability_fk —
the former especially needs a hand corpus because the synthetic tables
have no cross-source exact duplicates (0 rows at sf0.01)."""

from __future__ import annotations

import re

import pandas as pd


def _write_docs(tmp_path, rows):
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": [r[2] for r in rows],
            "n_chars": [len(r[1]) for r in rows],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def test_source_overlap_matrix(spark, tmp_path):
    from k8s_log_etl_spark.queries.dedup import corpus_source_overlap

    rows = [
        # shared doc (canonicalization: case/whitespace-insensitive)
        (1, "The  Quick brown fox", "a"),
        (2, "the quick BROWN fox", "b"),
        (3, "the quick brown fox", "c"),
        # a<->b only
        (4, "hello world", "a"),
        (5, "hello   world", "b"),
        # uniques
        (6, "only in a", "a"),
        (7, "only in b", "b"),
        (8, "only in c number one", "c"),
        (9, "only in c number two", "c"),
        # duplicate WITHIN a source must not inflate distinct hashes
        (10, "hello world", "a"),
    ]
    d = _write_docs(tmp_path, rows)
    got = {
        (r.source_a, r.source_b): r.asDict()
        for r in corpus_source_overlap(spark, d).collect()
    }
    # distinct hashes: a = {fox, hello, onlya} = 3, b = 3, c = 3
    ab = got[("a", "b")]
    assert ab["n_shared"] == 2 and ab["n_hashes_a"] == 3 and ab["n_hashes_b"] == 3
    assert ab["containment_ppm"] == (2 * 1_000_000) // 3
    assert got[("a", "c")]["n_shared"] == 1
    assert got[("b", "c")]["n_shared"] == 1
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}


def py_fk(texts_by_source):
    out = {}
    for src, texts in texts_by_source.items():
        gs = []
        for t in texts:
            w = [x for x in t.strip().split() if x]
            if not w:
                continue
            ns = max(len([s for s in re.split(r"[.!?]+", t) if s.strip()]), 1)
            ny = sum(max(len(re.findall(r"[aeiouy]+", x.lower())), 1) for x in w)
            nw = len(w)
            gs.append((390 * nw) // ns + (11800 * ny) // nw - 15590)
        if gs:
            out[src] = (
                len(gs),
                min(gs),
                max(gs),
                round(sum(gs) / len(gs) / 1000, 6),
            )
    return out


def test_readability_matches_python_reference(spark, tmp_path):
    from k8s_log_etl_spark.queries.text import text_readability_fk

    texts_by_source = {
        "simple": ["The cat sat. The dog ran. It is fun!", "Go now. Be good."],
        "dense": [
            "Notwithstanding institutional heterogeneity, epistemological "
            "considerations necessitate comprehensive reconceptualization."
        ],
        "edge": ["no terminators here at all", "xyz qrt bcd", ""],
    }
    rows, i = [], 0
    for src, texts in texts_by_source.items():
        for t in texts:
            i += 1
            rows.append((i, t, src))
    d = _write_docs(tmp_path, rows)
    got = {
        r.source: (r.n_docs, r.min_grade_milli, r.max_grade_milli, r.avg_grade)
        for r in text_readability_fk(spark, d).collect()
    }
    assert got == py_fk(texts_by_source)
    # the defining property: polysyllabic prose grades far above simple text
    assert got["dense"][3] > got["simple"][3] + 5
    # empty doc contributes nothing ("edge" has 2 graded docs, not 3)
    assert got["edge"][0] == 2
