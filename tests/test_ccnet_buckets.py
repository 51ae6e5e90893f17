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


def test_quantile_grid_spreads_concentrated_values(spark):
    """Round-11 verdict watch item: a value-concentrated corpus (all
    nll_micro inside what one fixed-width range used to be) must still
    shard into bounded (lang, rb_lo, rb_hi, rb_d) windows — the
    corpus-quantile grid adapts to the distribution."""
    from k8s_log_etl_spark.queries.llmprep import (
        CCNET_GRID_Q,
        _ccnet_ranges,
    )

    n = 2000
    docs = spark.createDataFrame(
        [(i, "en", 10_000_000 + i) for i in range(n)],
        "doc_id long, lang string, nll_micro long",
    )
    b = _ccnet_ranges(docs)
    sizes = [
        r["c"]
        for r in b.groupBy("lang", "rb_lo", "rb_hi", "rb_d")
        .count()
        .withColumnRenamed("count", "c")
        .collect()
    ]
    assert len(sizes) >= CCNET_GRID_Q // 2  # genuinely sharded
    assert max(sizes) <= 4 * n // CCNET_GRID_Q  # bounded per window


def test_tie_class_splits_on_doc_grid(spark):
    """An all-one-value language (the grid's worst case: no value cut
    can split ties) must sub-shard on the doc_id grid instead, and the
    key must stay order-consistent with (nll_micro, doc_id)."""
    from k8s_log_etl_spark.queries.llmprep import (
        CCNET_TIE_DOC_W,
        _ccnet_ranges,
    )

    n, step = 2000, 1000  # doc ids span 20 CCNET_TIE_DOC_W sub-ranges
    docs = spark.createDataFrame(
        [(i * step, "en", 5_000_000) for i in range(n)],
        "doc_id long, lang string, nll_micro long",
    )
    b = _ccnet_ranges(docs)
    sizes = [
        r["c"]
        for r in b.groupBy("lang", "rb_lo", "rb_hi", "rb_d")
        .count()
        .withColumnRenamed("count", "c")
        .collect()
    ]
    assert len(sizes) == n * step // CCNET_TIE_DOC_W
    assert max(sizes) <= CCNET_TIE_DOC_W // step


def test_range_key_order_matches_value_order(spark):
    """The whole construction rests on (rb_lo, rb_hi, rb_d) being
    monotone in (nll_micro, doc_id) — check it on a mixed distribution
    with heavy ties, near-ties, and outliers."""
    from k8s_log_etl_spark.queries.llmprep import _ccnet_ranges

    rows = []
    did = 0
    for v, reps in [
        (100, 400),        # heavy tie class (swallows several cuts)
        (101, 3),
        (102, 3),
        (5_000_000, 200),  # second heavy class, far away
        (5_000_001, 50),
    ] + [(200_000 + 7 * k, 1) for k in range(300)]:
        for _ in range(reps):
            rows.append((did * 997, "en", v))  # spread doc ids
            did += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, nll_micro long"
    )
    got = _ccnet_ranges(docs).collect()
    by_key = sorted(
        got,
        key=lambda r: (r["rb_lo"], r["rb_hi"], r["rb_d"], r["nll_micro"], r["doc_id"]),
    )
    by_val = sorted(got, key=lambda r: (r["nll_micro"], r["doc_id"]))
    assert [(r["nll_micro"], r["doc_id"]) for r in by_key] == [
        (r["nll_micro"], r["doc_id"]) for r in by_val
    ]


def test_skewed_corpus_buckets_still_exact(spark, tmp_path):
    """End-to-end on a value-concentrated TEXT corpus: every doc draws
    from one shared word distribution (all nll_micro equal or
    near-equal — the old fixed grid would put the whole language in
    one window), with varying doc lengths so bucket token totals
    expose any tie-ordering error across doc_id sub-ranges."""
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (i, "en", (base + " ") * (1 + i % 5))
        for i in range(120)
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
