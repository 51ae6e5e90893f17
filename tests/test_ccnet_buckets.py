"""corpus_ccnet_buckets: equal-count head/middle/tail per language,
perplexity ordering (head = lowest nll), exact integer scores vs a
pure-Python reference."""

from __future__ import annotations

import math

import pandas as pd

from k8s_log_etl_spark.queries.llmprep import (
    NLL_QUANT,
    corpus_ccnet_buckets,
)


def py_buckets(rows):
    """(doc_id, lang, text) -> {(lang, bucket): (n_docs, n_tokens)}."""
    toks = {i: [w.lower() for w in t.split() if w] for i, _, t in rows}
    vocab: dict[str, int] = {}
    for ws in toks.values():
        for w in ws:
            vocab[w] = vocab.get(w, 0) + 1
    n = sum(vocab.values())
    v = len(vocab)
    nll = {w: round(math.log((n + v) / (c + 1)) * NLL_QUANT) for w, c in vocab.items()}
    docs = []
    for i, lang, _ in rows:
        ws = toks[i]
        if not ws:
            continue
        docs.append((lang, i, sum(nll[w] for w in ws) // len(ws), len(ws)))
    out: dict[tuple, list] = {}
    for lang in {d[0] for d in docs}:
        ds = sorted(
            [d for d in docs if d[0] == lang], key=lambda d: (d[2], d[1])
        )
        nl = len(ds)
        for r, (lg, _i, _s, nt) in enumerate(ds, start=1):
            b = "head" if r * 3 <= nl else ("middle" if r * 3 <= 2 * nl else "tail")
            out.setdefault((lg, b), [0, 0])
            out[(lg, b)][0] += 1
            out[(lg, b)][1] += nt
    return {k: tuple(vv) for k, vv in out.items()}


def test_ccnet_buckets_match_reference(spark, tmp_path):
    rows = [
        (i, "en" if i % 2 == 0 else "de", f"word{i % 11} common text number {i} " * (1 + i % 4))
        for i in range(60)
    ]
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[2] for r in rows],
            "lang": [r[1] for r in rows],
            "source": ["s"] * len(rows),
            "n_chars": [len(r[2]) for r in rows],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    got = {
        (r["lang"], r["bucket"]): (r["n_docs"], r["n_tokens"])
        for r in corpus_ccnet_buckets(spark, str(tmp_path)).collect()
    }
    assert got == py_buckets(rows)
    # equal-count property: per lang, bucket sizes differ by at most 1
    for lang in ("en", "de"):
        sizes = [got[(lang, b)][0] for b in ("head", "middle", "tail")]
        assert max(sizes) - min(sizes) <= 1
