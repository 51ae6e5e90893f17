"""Quality-gated streaming ingest (streaming/ingest.py
ingest_batch_quality): the kept corpus must equal the batch
classifier's keep set (zq >= 0 under the persisted weights), be
independent of micro-batch cuts (the gate is stateless), and replay
idempotently."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

import k8s_log_etl_spark.queries.text as T
from k8s_log_etl_spark.streaming import ingest as IN
from k8s_log_etl_spark.tables import load_table

SF = "/root/testdata/sf0.01"


def _batch_keep_set(spark, weights_path) -> set[int]:
    w = spark.read.parquet(weights_path)
    scored = T.qc_score_with_weights(
        T._qc_features(load_table(spark, SF, "documents")), w
    )
    return {r["doc_id"] for r in scored.filter(F.col("zq") >= 0).collect()}


def _run_split(spark, tmp_path, weights_path, n_batches: int, tag: str) -> set[int]:
    docs = (
        load_table(spark, SF, "documents").orderBy("doc_id").collect()
    )
    corpus = str(tmp_path / f"corpus_{tag}")
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
        IN.ingest_batch_quality(spark, bdf, k, corpus, weights_path)
    return {r["doc_id"] for r in spark.read.parquet(corpus).select("doc_id").collect()}


def test_kept_set_matches_batch_gate_and_is_split_invariant(spark, tmp_path):
    weights_path = T.qc_weights_path(spark, SF)
    ref = _batch_keep_set(spark, weights_path)
    assert ref and len(ref) < 500  # the gate actually drops something
    one = _run_split(spark, tmp_path, weights_path, 1, "b1")
    three = _run_split(spark, tmp_path, weights_path, 3, "b3")
    assert one == ref
    assert three == ref
    # replay the last batch of the 3-way run verbatim — idempotent
    docs = load_table(spark, SF, "documents").orderBy("doc_id").collect()
    per = (len(docs) + 2) // 3
    chunk = docs[2 * per :]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    bdf = spark.createDataFrame(
        [(r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"]) for r in chunk],
        schema,
    )
    corpus = str(tmp_path / "corpus_b3")
    IN.ingest_batch_quality(spark, bdf, 2, corpus, weights_path)
    again = {r["doc_id"] for r in spark.read.parquet(corpus).select("doc_id").collect()}
    assert again == ref


def test_streaming_wrapper_drains_equivalently(spark, tmp_path):
    weights_path = T.qc_weights_path(spark, SF)
    ref = _batch_keep_set(spark, weights_path)
    docs = load_table(spark, SF, "documents").collect()
    src = str(tmp_path / "src")
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    spark.createDataFrame(
        [(r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"]) for r in docs],
        schema,
    ).coalesce(1).write.json(src)
    stream = spark.readStream.schema(schema).json(src)
    q = IN.ingest_corpus_quality(
        spark, stream, str(tmp_path / "corpus"), weights_path, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    kept = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "corpus")).select("doc_id").collect()
    }
    assert kept == ref
