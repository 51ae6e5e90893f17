"""BM25 index-maintaining ingest (streaming/ingest.ingest_batch_bm25):
the merged segment index must be VALUE-IDENTICAL to one-shot batch
stats regardless of how the stream is cut into micro-batches (the
additive segment-merge law bm25_index_delta_serve proves for 2
segments, here pinned N-way), must match the oracle-verified
build-once index, and must replay idempotently.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from k8s_log_etl_spark.queries.llmprep import bm25_doc_stats, bm25_index_path
from k8s_log_etl_spark.streaming import ingest as IN

SF = "/root/testdata/sf0.01"

SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _merged_tuples(spark, index_dir):
    """Canonical value view of the merged index: sorted tuples of all
    three tables (postings rows, per-term df, the single totals row)."""
    postings, terms, totals = IN.bm25_read_merged(spark, index_dir)
    p = sorted(
        (r["doc_id"], r["term"], r["tf"], r["dl"]) for r in postings.collect()
    )
    t = sorted((r["term"], r["df"]) for r in terms.collect())
    n = [(r["n"], r["t"]) for r in totals.collect()]
    return p, t, n


def _run_split(spark, tmp_path, n_batches: int, tag: str) -> str:
    docs = (
        spark.read.parquet(os.path.join(SF, "documents.parquet"))
        .orderBy("doc_id")
        .collect()
    )
    index = str(tmp_path / f"bm25idx_{tag}")
    per = (len(docs) + n_batches - 1) // n_batches
    for k in range(n_batches):
        chunk = docs[k * per : (k + 1) * per]
        if not chunk:
            continue
        bdf = spark.createDataFrame(
            [
                (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
                for r in chunk
            ],
            SCHEMA,
        )
        IN.ingest_batch_bm25(spark, bdf, k, index)
    return index


def test_merged_index_is_split_invariant_and_matches_batch_build(
    spark, tmp_path
):
    """1/3/7-batch cuts must merge to the same three tables, and those
    must equal the build-once index bm25_index_path persists — the one
    the bm25_index_serve driver row proves equal to full recompute, so
    transitively the streamed index serves oracle-exact probes."""
    if not os.path.exists(os.path.join(SF, "documents.parquet")):
        pytest.skip("sf0.01 testdata not present")
    one = _merged_tuples(spark, _run_split(spark, tmp_path, 1, "b1"))
    three = _merged_tuples(spark, _run_split(spark, tmp_path, 3, "b3"))
    seven = _merged_tuples(spark, _run_split(spark, tmp_path, 7, "b7"))
    assert one == three == seven
    root = bm25_index_path(spark, SF)
    built_p = sorted(
        (r["doc_id"], r["term"], r["tf"], r["dl"])
        for r in spark.read.parquet(os.path.join(root, "postings")).collect()
    )
    built_t = sorted(
        (r["term"], r["df"])
        for r in spark.read.parquet(os.path.join(root, "terms")).collect()
    )
    built_n = [
        (r["n"], r["t"])
        for r in spark.read.parquet(os.path.join(root, "totals")).collect()
    ]
    assert one == (built_p, built_t, built_n)
    assert one[2][0][0] > 0  # non-degenerate: documents were indexed


def test_replay_rewrites_own_segment_idempotently(spark, tmp_path):
    """Replaying a micro-batch (the foreachBatch crash-replay path)
    must leave all three tables unchanged: dynamic partition overwrite
    keyed on ingest_batch rewrites only the replayed segment, and the
    stats are a pure function of the batch's rows."""
    texts = [
        (1, "alpha beta gamma delta epsilon zeta", "en", "s", 1),
        (2, "alpha alpha beta something else entirely", "en", "s", 1),
        (3, "unrelated prose about parquet files and shuffles", "en", "s", 1),
        (4, "more prose about columnar scans and broadcast joins", "en", "s", 1),
    ]
    index = str(tmp_path / "bm25idx_replay")
    b0 = spark.createDataFrame(texts[:2], SCHEMA)
    b1 = spark.createDataFrame(texts[2:], SCHEMA)
    IN.ingest_batch_bm25(spark, b0, 0, index)
    IN.ingest_batch_bm25(spark, b1, 1, index)
    before = _merged_tuples(spark, index)
    IN.ingest_batch_bm25(spark, b1, 1, index)  # replay
    assert _merged_tuples(spark, index) == before
    # the replay touched only its own segment: batch 0's partition
    # still holds exactly batch 0's doc ids
    seg0 = (
        spark.read.parquet(os.path.join(index, "postings"))
        .filter(F.col("ingest_batch") == 0)
        .select("doc_id")
        .distinct()
        .collect()
    )
    assert sorted(r["doc_id"] for r in seg0) == [1, 2]


def test_streaming_wrapper_drains_equivalently(spark, tmp_path):
    """ingest_corpus_bm25 (the writeStream wiring) over a file stream
    must land the same merged index as direct batch calls."""
    texts = [
        (1, "the quick brown fox jumps over the lazy dog", "en", "s", 1),
        (2, "a second document with the word fox and more words", "en", "s", 1),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(texts, SCHEMA).coalesce(1).write.json(src)
    stream = spark.readStream.schema(SCHEMA).json(src)
    q = IN.ingest_corpus_bm25(
        spark, stream, str(tmp_path / "bm25idx_s"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    direct = str(tmp_path / "bm25idx_d")
    IN.ingest_batch_bm25(spark, spark.createDataFrame(texts, SCHEMA), 0, direct)
    assert _merged_tuples(spark, str(tmp_path / "bm25idx_s")) == _merged_tuples(
        spark, direct
    )


def test_empty_micro_batch_is_harmless(spark, tmp_path):
    """A gated stream can deliver an EMPTY micro-batch; it must write
    NOTHING (additive identity — skipping the segment writes is
    equally replay-safe and keeps all-empty indexes readable) and
    replay harmlessly."""
    texts = [
        (1, "alpha beta gamma delta epsilon zeta", "en", "s", 1),
        (2, "unrelated prose about parquet files and shuffles", "en", "s", 1),
    ]
    index = str(tmp_path / "bm25idx_empty")
    b0 = spark.createDataFrame(texts[:1], SCHEMA)
    b_empty = spark.createDataFrame([], SCHEMA)
    b2 = spark.createDataFrame(texts[1:], SCHEMA)
    IN.ingest_batch_bm25(spark, b0, 0, index)
    IN.ingest_batch_bm25(spark, b_empty, 1, index)
    IN.ingest_batch_bm25(spark, b2, 2, index)
    with_empty = _merged_tuples(spark, index)
    direct = str(tmp_path / "bm25idx_noempty")
    IN.ingest_batch_bm25(spark, spark.createDataFrame(texts, SCHEMA), 0, direct)
    assert with_empty == _merged_tuples(spark, direct)
    IN.ingest_batch_bm25(spark, b_empty, 1, index)  # replay the empty
    assert _merged_tuples(spark, index) == with_empty
    # the empty batch landed no segment: only batches 0 and 2 exist
    segs = (
        spark.read.parquet(os.path.join(index, "totals"))
        .select("ingest_batch")
        .distinct()
        .collect()
    )
    assert sorted(r["ingest_batch"] for r in segs) == [0, 2]


def test_all_empty_index_reads_as_typed_empty(spark, tmp_path):
    """An index fed ONLY empty micro-batches has no data files at all;
    bm25_read_merged must return the typed empty index (zero postings
    and terms, one n=0/t=0 totals row) instead of dying on parquet
    schema inference — the round-11 ADVICE case."""
    index = str(tmp_path / "bm25idx_allempty")
    b_empty = spark.createDataFrame([], SCHEMA)
    IN.ingest_batch_bm25(spark, b_empty, 0, index)
    IN.ingest_batch_bm25(spark, b_empty, 1, index)
    postings, terms, totals = IN.bm25_read_merged(spark, index)
    assert postings.columns == ["doc_id", "term", "tf", "dl"]
    assert terms.columns == ["term", "df"]
    assert postings.count() == 0 and terms.count() == 0
    assert [(r["n"], r["t"]) for r in totals.collect()] == [(0, 0)]


def test_compaction_preserves_merged_index(spark, tmp_path):
    """bm25_compact_segments must fold N segments into ONE whose merged
    view is value-identical (the N-way additive law applied durably),
    and ingest must keep working on top of the compacted index with
    strictly-increasing batch ids."""
    if not os.path.exists(os.path.join(SF, "documents.parquet")):
        pytest.skip("sf0.01 testdata not present")
    index = _run_split(spark, tmp_path, 7, "compact7")
    before = _merged_tuples(spark, index)
    folded = IN.bm25_compact_segments(spark, index)
    assert folded == 7
    assert _merged_tuples(spark, index) == before
    segs = sorted(
        e for e in os.listdir(os.path.join(index, "totals"))
        if e.startswith("ingest_batch=")
    )
    assert len(segs) == 1 and segs[0] == "ingest_batch=6"
    # a second pass is a no-op (single segment already)
    assert IN.bm25_compact_segments(spark, index) == 0
    assert _merged_tuples(spark, index) == before
    # new batches land ABOVE the folded id and merge additively
    extra = [(999_901, "entirely new words appended after compaction",
              "en", "s", 1)]
    IN.ingest_batch_bm25(spark, spark.createDataFrame(extra, SCHEMA), 7, index)
    p, t, n = _merged_tuples(spark, index)
    assert n[0][0] == before[2][0][0] + 1
    assert any(r[0] == 999_901 for r in p)


def test_compaction_crash_recovery(spark, tmp_path):
    """The three interrupted-swap shapes must all repair to a readable,
    value-identical index: stale stage beside a live index (pre-swap),
    complete stage with live missing (roll forward), incomplete stage
    with live missing (roll back)."""
    texts = [
        (1, "alpha beta gamma delta epsilon zeta", "en", "s", 1),
        (2, "unrelated prose about parquet files and shuffles", "en", "s", 1),
        (3, "more prose about columnar scans and broadcast joins", "en", "s", 1),
    ]
    index = str(tmp_path / "bm25idx_crash")
    for k, row in enumerate(texts):
        IN.ingest_batch_bm25(spark, spark.createDataFrame([row], SCHEMA), k, index)
    before = _merged_tuples(spark, index)
    stage, old = index + ".compact_stage", index + ".compact_old"

    # (a) crash before the swap: stale stage, live index untouched
    os.makedirs(os.path.join(stage, "postings"))
    assert IN.bm25_recover_compaction(index) is True
    assert not os.path.exists(stage)
    assert _merged_tuples(spark, index) == before

    # (b) crash mid-swap with a COMPLETE stage: roll forward
    IN.bm25_compact_segments(spark, index)  # produce a real folded index
    folded = _merged_tuples(spark, index)
    assert folded == before
    os.rename(index, stage)  # complete stage (has totals/_SUCCESS)
    os.makedirs(old)
    assert IN.bm25_recover_compaction(index) is True
    assert _merged_tuples(spark, index) == before
    assert not os.path.exists(old) and not os.path.exists(stage)

    # (c) crash mid-swap with an INCOMPLETE stage: roll back the old
    os.rename(index, old)
    os.makedirs(os.path.join(stage, "totals"))  # no _SUCCESS marker
    assert IN.bm25_recover_compaction(index) is True
    assert _merged_tuples(spark, index) == before
    assert not os.path.exists(old) and not os.path.exists(stage)


def _fake_checkpoint(tmp_path, tag, committed_ids):
    """Materialize the commit-log shape Structured Streaming leaves at
    <checkpoint>/commits/<batchId> (one file per committed batch)."""
    ckpt = str(tmp_path / f"ckpt_{tag}")
    os.makedirs(os.path.join(ckpt, "commits"), exist_ok=True)
    for k in committed_ids:
        with open(os.path.join(ckpt, "commits", str(k)), "w") as fh:
            fh.write("v1\n{}")
    return ckpt


def test_compaction_replay_guard_folds_committed_only(spark, tmp_path):
    """The round-12 ADVICE replay hazard: the last segment's batch may
    not have committed, so folding it would let a restart's replay
    (dynamic partition overwrite on its id) replace the whole folded
    index with one batch's stats. With a checkpoint whose commit log
    stops short of the last segment, compaction must fold ONLY the
    committed prefix, carry the uncommitted segment untouched, keep
    the merged view value-identical — and survive an actual replay of
    the uncommitted batch afterwards."""
    texts = [
        (1, "alpha beta gamma delta epsilon zeta", "en", "s", 1),
        (2, "unrelated prose about parquet files and shuffles", "en", "s", 1),
        (3, "more prose about columnar scans and broadcast joins", "en", "s", 1),
        (4, "a late batch that has not committed yet", "en", "s", 1),
    ]
    index = str(tmp_path / "bm25idx_guard")
    for k, row in enumerate(texts):
        IN.ingest_batch_bm25(spark, spark.createDataFrame([row], SCHEMA), k, index)
    before = _merged_tuples(spark, index)
    # batches 0-2 committed; batch 3's segment exists but did NOT commit
    ckpt = _fake_checkpoint(tmp_path, "guard", [0, 1, 2])
    folded = IN.bm25_compact_segments(spark, index, checkpoint_dir=ckpt)
    assert folded == 3
    assert _merged_tuples(spark, index) == before
    segs = sorted(
        int(e.split("=", 1)[1])
        for e in os.listdir(os.path.join(index, "totals"))
        if e.startswith("ingest_batch=")
    )
    assert segs == [2, 3]  # fold lands on highest COMMITTED id; 3 carried
    # the replay the guard exists for: batch 3 reruns on restart and
    # rewrites ONLY its own partition — the folded index is untouched
    IN.ingest_batch_bm25(
        spark, spark.createDataFrame([texts[3]], SCHEMA), 3, index
    )
    assert _merged_tuples(spark, index) == before


def test_compaction_guard_no_commit_and_sidecar_discovery(spark, tmp_path):
    """With a checkpoint that has never committed, nothing is safe to
    fold (0). The sidecar ingest_corpus_bm25 drops must be discovered
    automatically (no checkpoint_dir argument), must bound the fold
    the same way, and must survive the compaction swap."""
    texts = [
        (1, "alpha beta gamma", "en", "s", 1),
        (2, "delta epsilon zeta", "en", "s", 1),
        (3, "eta theta iota", "en", "s", 1),
    ]
    index = str(tmp_path / "bm25idx_sidecar")
    for k, row in enumerate(texts):
        IN.ingest_batch_bm25(spark, spark.createDataFrame([row], SCHEMA), k, index)
    before = _merged_tuples(spark, index)
    # empty commit log: refuse to fold anything
    ckpt_none = _fake_checkpoint(tmp_path, "none", [])
    assert IN.bm25_compact_segments(spark, index, checkpoint_dir=ckpt_none) == 0
    # sidecar auto-discovery (what ingest_corpus_bm25 writes)
    ckpt = _fake_checkpoint(tmp_path, "side", [0, 1])
    with open(os.path.join(index, IN._BM25_CHECKPOINT_SIDECAR), "w") as fh:
        fh.write(ckpt)
    assert IN.bm25_compact_segments(spark, index) == 2
    assert _merged_tuples(spark, index) == before
    segs = sorted(
        int(e.split("=", 1)[1])
        for e in os.listdir(os.path.join(index, "totals"))
        if e.startswith("ingest_batch=")
    )
    assert segs == [1, 2]
    # the sidecar rode through the swap; after batch 2 commits, the
    # same no-argument call folds the rest
    with open(os.path.join(ckpt, "commits", "2"), "w") as fh:
        fh.write("v1\n{}")
    assert IN.bm25_compact_segments(spark, index) == 2
    assert _merged_tuples(spark, index) == before
