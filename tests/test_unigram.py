"""Unigram-LM tokenizer (round-8 verdict #6): hand-corpus semantics for
the Viterbi DP + EM pricing. The driver row / test_oracle_parity pin
the full cross-engine EM replay; these tests pin that the SEGMENTATION
itself does what Kudo 2018's unigram model promises on inputs small
enough to verify by hand."""

from __future__ import annotations

from pyspark.sql import functions as F

import k8s_log_etl_spark.queries.llmprep as L


def _segment(spark, term: str, costs: dict[str, int]) -> list[str]:
    cmap = L._uni_cmap(sorted(costs.items()))
    df = spark.createDataFrame([(term,)], "term string").select(
        L._uni_dp_pieces(F.col("term"), cmap).alias("p")
    )
    return sorted(df.collect()[0]["p"])


def test_viterbi_prefers_cheaper_path(spark):
    """'abab' with cost(ab)=2, cost(a)=cost(b)=1: two 'ab' pieces cost
    4 < a+b+a+b = 4? equal — tie at the last position breaks to the
    SHORTER piece via the cost*8+len encoding, so the single-char path
    wins; with cost(ab)=1 the multi-char path must win."""
    tie = _segment(spark, "abab", {"a": 1, "b": 1, "ab": 2})
    assert tie == ["a", "a", "b", "b"]
    cheap = _segment(spark, "abab", {"a": 1, "b": 1, "ab": 1})
    assert cheap == ["ab", "ab"]


def test_viterbi_falls_back_to_chars(spark):
    """A term none of whose multi-char substrings are in the vocabulary
    segments into single characters."""
    assert _segment(spark, "xyz", {"x": 1, "y": 2, "z": 3, "ab": 1}) == [
        "x",
        "y",
        "z",
    ]


def test_viterbi_uses_longest_affordable_piece(spark):
    """cost(abcd) below the sum of any split must yield the whole-word
    piece (UNI_MAX_PIECE = 4 reachable)."""
    costs = {"a": 5, "b": 5, "c": 5, "d": 5, "ab": 8, "cd": 8, "abcd": 9}
    assert _segment(spark, "abcd", {**costs}) == ["abcd"]
    # and when the 4-gram is overpriced, the two bigrams win
    costs["abcd"] = 99
    assert _segment(spark, "abcd", {**costs}) == ["ab", "cd"]


def test_em_favors_frequent_whole_words(spark, tmp_path):
    """A corpus dominated by one repeated word: after UNI_ROUNDS of EM
    the whole word (<= 4 chars) must be the top piece by usage — the
    re-pricing loop concentrates mass on pieces Viterbi actually uses."""
    docs = [(i, "qqxz " * 30, "en", "s", 150) for i in range(20)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = L.unigram_tokenize_corpus(spark, str(tmp_path)).collect()
    assert out[0]["piece"] == "qqxz"
    # 20 docs x 30 occurrences, one piece per occurrence
    assert out[0]["usage"] == 600
    # costs are the add-one-smoothed micro-nat prices over the vocab
    assert all(r["cost_q"] >= 0 for r in out)


def test_empty_and_null_corpus(spark, tmp_path):
    """Empty documents table and NULL-text rows must yield an empty /
    well-typed result, not a crash (the round-7 sweep contract)."""
    spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    assert L.unigram_tokenize_corpus(spark, str(tmp_path)).collect() == []
    spark.createDataFrame(
        [(1, None, "en", "s", 0), (2, "ok go", "en", "s", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = L.unigram_tokenize_corpus(spark, str(tmp_path)).collect()
    assert {r["piece"] for r in rows} >= {"ok", "go"}
