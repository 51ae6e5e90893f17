"""Hand-corpus semantics for corpus_source_overlap_neardup: an edited
cross-source copy lands in the matrix; a same-source near-dup pair is
excluded; the pair is ordered by source name."""

from __future__ import annotations

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


def test_neardup_source_matrix(spark, tmp_path):
    from k8s_log_etl_spark.queries.dedup import (
        corpus_source_overlap_neardup,
        dedup_minhash_lsh,
    )

    base = " ".join(f"tok{i}" for i in range(40))
    edited = base.replace("tok39", "changed")  # one-word edit
    rows = [
        (1, base, "zsrc"),
        (2, edited, "asrc"),          # cross-source near-dup of 1
        (3, base + " extra", "zsrc"),  # same-source near-dup of 1
        (4, "totally different text about other things entirely", "asrc"),
    ]
    d = _write_docs(tmp_path, rows)

    pairs = {(r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, d).collect()}
    assert (1, 2) in pairs and (1, 3) in pairs  # LSH finds both

    got = {
        (r.source_a, r.source_b): r.asDict()
        for r in corpus_source_overlap_neardup(spark, d).collect()
    }
    # ordered by source NAME: asrc < zsrc
    key = ("asrc", "zsrc")
    assert key in got
    m = got[key]
    # cross-source pairs only: (1,2) and possibly (2,3); never (1,3)
    assert m["n_pairs"] >= 1
    assert m["n_docs_a"] >= 1 and m["n_docs_b"] >= 1
    # no same-source pair leaks in as a matrix row
    assert all(a != b for a, b in got)
