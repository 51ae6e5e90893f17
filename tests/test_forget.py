"""Keyed delete propagation (operators/forget.py): only partitions
containing forget keys are rewritten, deletions are exact, untouched
partitions stay byte-identical, the pass is idempotent, and a crash
mid-swap is repaired by the shared recover_compaction protocol."""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from k8s_log_etl_spark.operators import forget as FG

SF_DIR = "/root/testdata/sf0.1"


def _file_hashes(base):
    out = {}
    for entry in os.listdir(base):
        if not entry.startswith("source="):
            continue
        for fn in os.listdir(os.path.join(base, entry)):
            p = os.path.join(base, entry, fn)
            out[f"{entry}/{fn}"] = hashlib.md5(open(p, "rb").read()).hexdigest()
    return out


def test_forget_rewrites_only_affected_partitions(spark, tmp_path):
    if not os.path.exists(os.path.join(SF_DIR, "documents.parquet")):
        pytest.skip("sf0.1 testdata not present")
    base = str(tmp_path / "corpus")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs.write.partitionBy("source").parquet(base)

    sources = sorted(r["source"] for r in docs.select("source").distinct().collect())
    assert len(sources) >= 3
    hit, spared = sources[0], sources[1]

    # forget keys: every 5th doc of the hit source (a partial delete)
    keys = (
        docs.filter((F.col("source") == hit) & (F.col("doc_id") % 5 == 0))
        .select("doc_id")
    )
    n_keys = keys.count()
    assert n_keys > 0
    before_hashes = _file_hashes(base)
    before_total = spark.read.parquet(base).count()

    todo = FG.plan_forget(spark, base, "source", keys, "doc_id")
    assert todo == [f"source={hit}"]

    done = FG.apply_forget(spark, base, "source", keys, "doc_id")
    assert done == {"partitions": 1, "rows_deleted": n_keys}

    after = spark.read.parquet(base)
    assert after.count() == before_total - n_keys
    assert after.join(keys, "doc_id", "leftsemi").count() == 0
    # spared partitions byte-identical
    after_hashes = _file_hashes(base)
    untouched = {k: v for k, v in before_hashes.items() if not k.startswith(f"source={hit}/")}
    assert {k: v for k, v in after_hashes.items() if k in untouched} == untouched
    # surviving rows of the hit partition are intact
    hit_left = after.filter(F.col("source") == hit).count()
    assert hit_left == docs.filter(
        (F.col("source") == hit) & (F.col("doc_id") % 5 != 0)
    ).count()
    # no swap sidecars or markers left behind
    assert not [e for e in os.listdir(base) if e.startswith("_compact_")]
    assert not os.path.exists(os.path.join(base, f"source={hit}", "_SUCCESS"))

    # idempotent: nothing left to do
    assert FG.plan_forget(spark, base, "source", keys, "doc_id") == []
    assert FG.apply_forget(spark, base, "source", keys, "doc_id") == {
        "partitions": 0,
        "rows_deleted": 0,
    }
    # the spared partition still serves its full row count
    assert after.filter(F.col("source") == spared).count() == docs.filter(
        F.col("source") == spared
    ).count()


def test_forget_crash_midswap_recovers(spark, tmp_path):
    """A forget interrupted between the two renames (live dir missing,
    old present, tmp carrying the _SUCCESS completeness proof) must
    roll FORWARD on the next pass — the deletion that provably
    completed sticks, and the pass finishes with nothing to do."""
    if not os.path.exists(os.path.join(SF_DIR, "documents.parquet")):
        pytest.skip("sf0.1 testdata not present")
    base = str(tmp_path / "corpus")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs.write.partitionBy("source").parquet(base)
    hit = sorted(r["source"] for r in docs.select("source").distinct().collect())[0]
    keys = (
        docs.filter((F.col("source") == hit) & (F.col("doc_id") % 5 == 0))
        .select("doc_id")
    )
    n_keys = keys.count()

    entry = f"source={hit}"
    pdir = os.path.join(base, entry)
    tmp = os.path.join(base, f"_compact_tmp_{entry}")
    old = os.path.join(base, f"_compact_old_{entry}")
    # manufacture the crash state: completed tmp rewrite, live renamed
    # away, process died before tmp -> live
    kept = spark.read.parquet(pdir).join(F.broadcast(keys), "doc_id", "left_anti")
    kept.write.parquet(tmp)
    assert os.path.exists(os.path.join(tmp, "_SUCCESS"))
    os.rename(pdir, old)

    done = FG.apply_forget(spark, base, "source", keys, "doc_id")
    # recovery rolled the completed rewrite forward; the plan then saw
    # a store already clean of the keys
    assert done == {"partitions": 0, "rows_deleted": 0}
    assert os.path.exists(pdir) and not os.path.exists(old) and not os.path.exists(tmp)
    assert not os.path.exists(os.path.join(pdir, "_SUCCESS"))
    store = spark.read.parquet(base)
    assert store.join(keys, "doc_id", "leftsemi").count() == 0
    assert store.filter(F.col("source") == hit).count() == docs.filter(
        (F.col("source") == hit) & (F.col("doc_id") % 5 != 0)
    ).count()


def test_forget_entire_partition(spark, tmp_path):
    """Forgetting every key of a partition leaves it empty (schema-
    readable), not broken."""
    base = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)], "id long, p string, v long"
    )
    df.write.partitionBy("p").parquet(base)
    keys = spark.createDataFrame([(1,), (2,)], "id long")
    done = FG.apply_forget(spark, base, "p", keys, "id")
    assert done == {"partitions": 1, "rows_deleted": 2}
    store = spark.read.parquet(base)
    assert [tuple(r) for r in store.orderBy("id").select("id", "p", "v").collect()] == [
        (3, "b", 30)
    ]


def test_forget_escaped_partition_values(spark, tmp_path):
    """Partition values carrying Hive-special characters ('/', '%',
    '=') and NULL are URL-escaped / defaulted in directory names;
    plan_forget must compute the same names Spark wrote (round-5
    ADVICE — a raw f-string entry fails mid-swap with
    FileNotFoundError on such stores)."""
    base = str(tmp_path / "tbl")
    rows = [
        (1, "a/b", 10), (2, "a/b", 20),
        (3, "50%", 30), (4, "x=y", 40), (5, None, 50),
    ]
    df = spark.createDataFrame(rows, "id long, p string, v long")
    df.write.partitionBy("p").parquet(base)
    on_disk = {e for e in os.listdir(base) if e.startswith("p=")}
    assert on_disk == {
        "p=a%2Fb", "p=50%25", "p=x%3Dy", "p=__HIVE_DEFAULT_PARTITION__"
    }

    keys = spark.createDataFrame([(1,), (3,), (4,), (5,)], "id long")
    todo = FG.plan_forget(spark, base, "p", keys, "id")
    assert todo == sorted(on_disk)
    done = FG.apply_forget(spark, base, "p", keys, "id")
    assert done == {"partitions": 4, "rows_deleted": 4}
    left = spark.read.parquet(base)
    assert [tuple(r) for r in left.select("id", "p", "v").orderBy("id").collect()] == [
        (2, "a/b", 20)
    ]
    assert not [e for e in os.listdir(base) if e.startswith("_compact_")]


def test_forget_ingested_crash_between_stores_converges(spark, tmp_path):
    """The cross-store pair is idempotent ONLY index-first (round-5
    ADVICE): crash after the index pass but before the corpus pass,
    then re-run — the victim is still in the corpus, so its digest
    re-derives, the index delete is a no-op, and the corpus delete
    completes. No orphan digest, and identical content re-ingests."""
    from k8s_log_etl_spark.operators import forget as fgmod
    from k8s_log_etl_spark.streaming import ingest as IN

    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    LONG = "the quick brown fox jumps over the lazy dog again and again"
    IN.ingest_batch(
        spark,
        spark.createDataFrame(
            [(1, LONG + " alpha"), (2, LONG + " beta")], "doc_id long, text string"
        ),
        0, corpus, index,
    )

    real_apply = fgmod.apply_forget
    calls: list[str] = []

    def crash_after_first(spark_, path, *a, **kw):
        calls.append(path)
        out = real_apply(spark_, path, *a, **kw)
        if len(calls) == 1:
            raise RuntimeError("injected crash between stores")
        return out

    fgmod.apply_forget = crash_after_first
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            IN.forget_ingested(
                spark, corpus, index, spark.createDataFrame([(1,)], "doc_id long")
            )
    finally:
        fgmod.apply_forget = real_apply
    # the pass that ran first must have been the INDEX pass
    assert calls == [index]
    assert spark.read.parquet(index).count() == 1  # victim digest gone
    assert spark.read.parquet(corpus).count() == 2  # victim still present

    # re-run converges: corpus delete completes, index delete no-ops
    done = IN.forget_ingested(
        spark, corpus, index, spark.createDataFrame([(1,)], "doc_id long")
    )
    assert done["corpus_rows_deleted"] == 1
    assert done["index_rows_deleted"] == 0
    assert spark.read.parquet(corpus).count() == 1
    assert spark.read.parquet(index).count() == 1

    # and erasure semantics hold: the same bytes re-enter as fresh
    IN.ingest_batch(
        spark,
        spark.createDataFrame([(9, LONG + " alpha")], "doc_id long, text string"),
        1, corpus, index,
    )
    assert {r["doc_id"] for r in spark.read.parquet(corpus).collect()} == {2, 9}


def test_forget_ingested_erasure_allows_reingest(spark, tmp_path):
    """The corpus+index pair: forgetting a document removes its rows
    from BOTH stores, and — the semantic point — byte-identical
    content can then legitimately re-enter (erasure, not tombstone)."""
    from k8s_log_etl_spark.streaming import ingest as IN

    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    LONG = "the quick brown fox jumps over the lazy dog again and again"
    b0 = [(1, LONG + " alpha"), (2, LONG + " beta")]
    IN.ingest_batch(spark, spark.createDataFrame(b0, "doc_id long, text string"), 0, corpus, index)
    assert spark.read.parquet(corpus).count() == 2

    done = IN.forget_ingested(
        spark, corpus, index, spark.createDataFrame([(1,)], "doc_id long")
    )
    assert done["corpus_rows_deleted"] == 1
    assert done["index_rows_deleted"] == 1
    left = spark.read.parquet(corpus)
    assert [r["doc_id"] for r in left.collect()] == [2]
    assert spark.read.parquet(index).count() == 1

    # identical content re-ingests as a fresh document (would be
    # silently suppressed forever if the digest had stayed indexed)
    IN.ingest_batch(
        spark,
        spark.createDataFrame([(9, LONG + " alpha")], "doc_id long, text string"),
        1, corpus, index,
    )
    got = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert got == {2, 9}
    assert spark.read.parquet(index).count() == 2
    # while a still-indexed duplicate stays suppressed
    IN.ingest_batch(
        spark,
        spark.createDataFrame([(10, LONG + " beta")], "doc_id long, text string"),
        2, corpus, index,
    )
    assert {r["doc_id"] for r in spark.read.parquet(corpus).collect()} == {2, 9}
