"""streaming/upsert.py: the versioned MERGE sink must (1) reproduce the
batch fold of the same change sequence, (2) be idempotent under batch
replay (crash-before-checkpoint), and (3) let a deleted key re-enter
in a later batch."""

from __future__ import annotations

import json
import os

from k8s_log_etl_spark.streaming.upsert import (
    merge_batch,
    read_store,
    start_merge_stream,
)

BATCHES = [
    # b0: initial load
    [
        {"k": 1, "v": "a1", "is_delete": False},
        {"k": 2, "v": "b1", "is_delete": False},
        {"k": 3, "v": "c1", "is_delete": False},
    ],
    # b1: update 1, delete 2, insert 4
    [
        {"k": 1, "v": "a2", "is_delete": False},
        {"k": 2, "v": None, "is_delete": True},
        {"k": 4, "v": "d1", "is_delete": False},
    ],
    # b2: re-insert 2 after its delete, delete 4, unmatched delete 9
    [
        {"k": 2, "v": "b2", "is_delete": False},
        {"k": 4, "v": None, "is_delete": True},
        {"k": 9, "v": None, "is_delete": True},
    ],
]

EXPECTED = {(1, "a2"), (2, "b2"), (3, "c1")}

SCHEMA = "k long, v string, is_delete boolean"


def _store_rows(spark, store):
    df = read_store(spark, store)
    return {(r["k"], r["v"]) for r in df.collect()}


def test_stream_merge_matches_batch_fold(spark, tmp_path):
    in_dir = str(tmp_path / "changes_in")
    os.makedirs(in_dir)
    for i, batch in enumerate(BATCHES):
        p = os.path.join(in_dir, f"b{i}.jsonl")
        with open(p, "w") as f:
            for row in batch:
                f.write(json.dumps(row) + "\n")
        os.utime(p, (1_700_000_000 + i * 60,) * 2)

    store = str(tmp_path / "store")
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(in_dir)
    )
    q = start_merge_stream(
        spark, stream, store, str(tmp_path / "ckpt"), keys=["k"]
    )
    q.awaitTermination(120)
    assert _store_rows(spark, store) == EXPECTED

    # batch fold of the same sequence through merge_batch directly
    store2 = str(tmp_path / "store2")
    for i, batch in enumerate(BATCHES):
        bdf = spark.createDataFrame(
            [(r["k"], r["v"], r["is_delete"]) for r in batch], SCHEMA
        )
        merge_batch(spark, bdf, i, store2, keys=["k"])
    assert _store_rows(spark, store2) == EXPECTED


def test_replayed_batch_rewrites_identically(spark, tmp_path):
    store = str(tmp_path / "store")
    dfs = [
        spark.createDataFrame(
            [(r["k"], r["v"], r["is_delete"]) for r in batch], SCHEMA
        )
        for batch in BATCHES
    ]
    for i, bdf in enumerate(dfs):
        merge_batch(spark, bdf, i, store, keys=["k"])
    before = _store_rows(spark, store)
    # crash-before-checkpoint: the last batch replays in full
    merge_batch(spark, dfs[-1], len(dfs) - 1, store, keys=["k"])
    assert _store_rows(spark, store) == before == EXPECTED


def test_retention_keeps_parent_and_head_only(spark, tmp_path):
    store = str(tmp_path / "store")
    for i, batch in enumerate(BATCHES):
        bdf = spark.createDataFrame(
            [(r["k"], r["v"], r["is_delete"]) for r in batch], SCHEMA
        )
        merge_batch(spark, bdf, i, store, keys=["k"])
    vs = sorted(
        int(n.split("=")[1]) for n in os.listdir(store) if n.startswith("v=")
    )
    assert vs == [1, 2]


def test_time_travel_reads_prior_version(spark, tmp_path):
    store = str(tmp_path / "store")
    for i, batch in enumerate(BATCHES):
        bdf = spark.createDataFrame(
            [(r["k"], r["v"], r["is_delete"]) for r in batch], SCHEMA
        )
        merge_batch(spark, bdf, i, store, keys=["k"])
    # as-of the middle batch: 1 updated, 2 deleted, 4 inserted
    at1 = {
        (r["k"], r["v"]) for r in read_store(spark, store, as_of=1).collect()
    }
    assert at1 == {(1, "a2"), (3, "c1"), (4, "d1")}
    # head unchanged; as-of before retention horizon yields nothing
    assert _store_rows(spark, store) == EXPECTED
    assert read_store(spark, store, as_of=0) is None
