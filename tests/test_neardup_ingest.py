"""Near-dup-suppressing ingest (streaming/ingest.py
ingest_batch_neardup): the kept corpus must equal the batch-mode rule
"drop any doc with a verified pair to a smaller ingested doc_id"
(derived independently from dedup_minhash_lsh's pair set), must be
INDEPENDENT of how the stream is cut into micro-batches, and must
replay idempotently.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from k8s_log_etl_spark.queries.dedup import dedup_minhash_lsh
from k8s_log_etl_spark.streaming import ingest as IN

SF = "/root/testdata/sf0.01"


def _reference_kept(spark) -> set[int]:
    """Batch-mode reference: gated docs minus any doc whose verified
    pair partner with a smaller id was itself gated (= ingested)."""
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    gated = {r["doc_id"] for r in IN._gate(docs).select("doc_id").collect()}
    pairs = dedup_minhash_lsh(spark, SF).collect()
    suppressed = {
        r["doc_b"]
        for r in pairs
        if r["doc_a"] in gated and r["doc_b"] in gated
    }
    return gated - suppressed


def _run_split(spark, tmp_path, n_batches: int, tag: str) -> set[int]:
    docs = (
        spark.read.parquet(os.path.join(SF, "documents.parquet"))
        .orderBy("doc_id")
        .collect()
    )
    corpus = str(tmp_path / f"corpus_{tag}")
    index = str(tmp_path / f"index_{tag}")
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    per = (len(docs) + n_batches - 1) // n_batches
    for k in range(n_batches):
        chunk = docs[k * per : (k + 1) * per]
        if not chunk:
            continue
        bdf = spark.createDataFrame(
            [(r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"]) for r in chunk],
            schema,
        )
        IN.ingest_batch_neardup(spark, bdf, k, corpus, index)
    return {r["doc_id"] for r in spark.read.parquet(corpus).select("doc_id").collect()}


def test_kept_set_matches_batch_rule_and_is_split_invariant(spark, tmp_path):
    if not os.path.exists(os.path.join(SF, "documents.parquet")):
        pytest.skip("sf0.01 testdata not present")
    ref = _reference_kept(spark)
    assert ref  # non-degenerate
    one = _run_split(spark, tmp_path, 1, "b1")
    three = _run_split(spark, tmp_path, 3, "b3")
    seven = _run_split(spark, tmp_path, 7, "b7")
    assert one == ref
    assert three == ref
    assert seven == ref
    # the suppression actually fired at this SF
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    gated = IN._gate(docs).count()
    assert len(ref) < gated


def test_replay_idempotent_and_index_excludes_own_batch(spark, tmp_path):
    """Replaying the last micro-batch (the foreachBatch crash-replay
    path) must leave both stores unchanged — in particular the index
    read must exclude the replayed batch's own crashed-attempt rows,
    or every doc would suppress itself (self-match est = 1.0)."""
    texts = [
        (i, f"unique document number {i} with tokens alpha beta gamma delta", "en", "src", 1)
        for i in range(1, 21)
    ]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    b0 = spark.createDataFrame(texts[:10], schema)
    b1 = spark.createDataFrame(texts[10:], schema)
    IN.ingest_batch_neardup(spark, b0, 0, corpus, index)
    IN.ingest_batch_neardup(spark, b1, 1, corpus, index)
    before_c = sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect())
    before_i = spark.read.parquet(index).count()
    # replay batch 1 verbatim
    IN.ingest_batch_neardup(spark, b1, 1, corpus, index)
    assert sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect()) == before_c
    assert spark.read.parquet(index).count() == before_i
    # the near-identical texts (one token differs) correctly suppress
    # later twins; the first doc always survives
    assert before_c[0] == 1
    assert 0 < len(before_c) < len(texts)


def test_streaming_wrapper_drains_equivalently(spark, tmp_path):
    """ingest_corpus_neardup (the writeStream wiring) over a file
    stream must land the same corpus as direct batch calls."""
    texts = [
        (1, "the quick brown fox jumps over the lazy dog today", "en", "s", 1),
        (2, "the quick brown fox jumps over the lazy dog today", "en", "s", 1),
        (3, "completely different content about distributed systems and parquet files", "en", "s", 1),
    ]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    src = str(tmp_path / "src")
    spark.createDataFrame(texts, schema).coalesce(1).write.json(src)
    stream = spark.readStream.schema(schema).json(src)
    q = IN.ingest_corpus_neardup(
        spark,
        stream,
        str(tmp_path / "corpus"),
        str(tmp_path / "index"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    kept = sorted(
        r["doc_id"] for r in spark.read.parquet(str(tmp_path / "corpus")).collect()
    )
    assert kept == [1, 3]  # doc 2 is a verbatim near-dup of doc 1


def test_out_of_order_doc_ids_keep_smaller_id_doc(spark, tmp_path):
    """Round-6 ADVICE regression: the vs_index probe must carry the
    a.doc_id < b.doc_id predicate. If doc 10 (batch 0) and its twin
    doc 5 (batch 1) arrive out of order, the later-but-SMALLER-id doc 5
    must be KEPT — suppression is defined against smaller ingested ids
    only, and without the predicate doc 5 would be suppressed by the
    indexed doc 10, making the kept set depend on batch cuts."""
    twin = "the quick brown fox jumps over the lazy dog again and again today"
    other = "completely unrelated prose about parquet files and shuffle planning"
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    b0 = spark.createDataFrame([(10, twin, "en", "s", 1)], schema)
    b1 = spark.createDataFrame(
        [(5, twin, "en", "s", 1), (6, other, "en", "s", 1)], schema
    )
    IN.ingest_batch_neardup(spark, b0, 0, corpus, index)
    IN.ingest_batch_neardup(spark, b1, 1, corpus, index)
    kept = sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect())
    # doc 5 kept (no smaller-id twin); doc 10 stays (already durable);
    # doc 6 kept (no twin at all)
    assert kept == [5, 6, 10]
    # and a LARGER-id twin arriving later is still suppressed by the index
    b2 = spark.createDataFrame([(42, twin, "en", "s", 1)], schema)
    IN.ingest_batch_neardup(spark, b2, 2, corpus, index)
    kept2 = sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect())
    assert kept2 == [5, 6, 10]
