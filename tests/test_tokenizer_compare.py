"""tokenizer_compare must agree with the standalone family queries on
the same corpus (it adds metrics, not a fourth implementation), and
yield the documented NULL/0 rows on an empty corpus."""

from __future__ import annotations

import pandas as pd


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


def test_compare_consistent_with_family_queries(spark, tmp_path):
    from k8s_log_etl_spark.queries.llmprep import (
        bpe_encode_corpus,
        tokenizer_compare,
        wordpiece_encode_corpus,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "the five boxing wizards jump quickly",
    ] * 3
    d = _write_docs(tmp_path, texts)
    got = {r.family: r.asDict() for r in tokenizer_compare(spark, d).collect()}
    assert set(got) == {"bpe", "unigram", "wordpiece"}

    bpe_ct = bpe_encode_corpus(spark, d).collect()[0]["corpus_tokens"]
    assert got["bpe"]["corpus_tokens"] == bpe_ct
    wp_ct = wordpiece_encode_corpus(spark, d).collect()[0]["corpus_tokens"]
    assert got["wordpiece"]["corpus_tokens"] == wp_ct

    # fertility sanity: every family tokenizes a word into >= 1 piece,
    # and character-heavy early-merge tokenizers sit above 1000/kword
    nw = sum(len(t.split()) for t in texts)
    for fam, m in got.items():
        assert m["corpus_tokens"] >= nw // 3, fam
        assert m["tokens_per_kword"] == (m["corpus_tokens"] * 1000) // nw, fam
        assert m["pieces_used"] >= 1, fam


def test_compare_empty_corpus_rows(spark, tmp_path):
    from k8s_log_etl_spark.queries.llmprep import tokenizer_compare

    d = _write_docs(tmp_path, [])
    got = {r.family: r.asDict() for r in tokenizer_compare(spark, d).collect()}
    assert set(got) == {"bpe", "unigram", "wordpiece"}
    for m in got.values():
        assert m["corpus_tokens"] is None
        assert m["pieces_used"] == 0
        assert m["tokens_per_kword"] is None


def test_relation_scan_covers_comma_lists():
    """The cross-chain CTE guard's relation scanner (round-11 ADVICE):
    must see names after FROM/JOIN AND later entries of comma-separated
    FROM lists, and must NOT leak column/alias lists into relation
    position."""
    from k8s_log_etl_spark.queries.llmprep import _sql_relation_names

    rels = _sql_relation_names(
        "SELECT x FROM alpha a, other_chain_cte o JOIN beta ON a.x = o.x"
    )
    assert {"alpha", "other_chain_cte", "beta"} <= rels
    # column lists and clause keywords stay out of relation position
    rels2 = _sql_relation_names(
        "SELECT a, vocab FROM scored GROUP BY query_id, doc_id "
        "ORDER BY score, vocab"
    )
    assert "scored" in rels2
    assert "vocab" not in rels2 and "doc_id" not in rels2


def test_relation_scan_skips_function_syntax_from():
    """SQL-standard function syntax (round-12 ADVICE) puts a COLUMN
    after FROM — extract(YEAR FROM ts), substring(s FROM 1), trim(BOTH
    ' ' FROM name) — and must not enter relation position (a spurious
    import-time AssertionError if the column spells another chain's
    CTE name). Bare parens (CTE bodies, subqueries) must keep their
    relations visible — an absolute-depth skip would vacate the lint."""
    from k8s_log_etl_spark.queries.llmprep import _sql_relation_names

    assert _sql_relation_names(
        "SELECT extract(YEAR FROM ts) FROM orders"
    ) == {"orders"}
    assert _sql_relation_names(
        "w AS (SELECT trim(BOTH ' ' FROM name), substring(s FROM 1 FOR 2) "
        "FROM emp e, dept d)"
    ) == {"emp", "dept"}
    # relations inside CTE bodies and subqueries still count
    assert _sql_relation_names(
        "a AS (SELECT * FROM b_tab JOIN c_tab ON 1=1), "
        "x AS (SELECT * FROM (SELECT * FROM inner_t) q)"
    ) == {"b_tab", "c_tab", "inner_t"}
