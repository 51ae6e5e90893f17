"""Semantics tests for the round-8 additions dedup_cdc_chunks and
corpus_ngram_saturation, on corpora small enough that the expected
answer is computable by hand (in pure Python, sharing only the md5
definition with the engine)."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest


def md5_long(s: str) -> int:
    """Pure-Python mirror of functions.xengine.md5_long."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def py_cdc_chunks(text: str, g: int = 8) -> list[str]:
    """Reference CDC chunker: a word whose md5_long % g == 0 closes the
    current chunk; trailing words form a final chunk."""
    words = [w for w in text.strip().split() if w]
    chunks, cur = [], []
    for w in words:
        cur.append(w)
        if md5_long(w) % g == 0:
            chunks.append(" ".join(cur))
            cur = []
    if cur:
        chunks.append(" ".join(cur))
    return chunks


def _write_docs(tmp_path, rows):
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": [r[2] for r in rows],
            "n_chars": [len(r[1]) if r[1] else 0 for r in rows],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def test_cdc_chunker_matches_python_reference(spark, tmp_path):
    """The exploded chunk stream must equal the sequential reference
    chunker on a corpus with known boundary words (found by hashing)."""
    from k8s_log_etl_spark.queries.dedup import CDC_G, _cdc_chunks_col

    # find a couple of real boundary words so the test corpus has
    # interior boundaries, not just the trailing chunk
    boundary = [f"b{i}" for i in range(200) if md5_long(f"b{i}") % CDC_G == 0]
    assert len(boundary) >= 2, "hash universe too small for the test"
    text1 = f"alpha beta {boundary[0]} gamma delta {boundary[1]} tail words"
    text2 = f"{boundary[0]} solo"            # boundary as FIRST word
    text3 = f"plain words no boundary here"  # single trailing chunk
    text4 = boundary[1]                      # boundary as ONLY word
    d = _write_docs(
        tmp_path, [(1, text1, "a"), (2, text2, "a"), (3, text3, "b"), (4, text4, "b")]
    )

    from pyspark.sql import functions as F

    got = (
        spark.read.parquet(f"{d}/documents.parquet")
        .select("doc_id", F.explode(_cdc_chunks_col()).alias("chunk"))
        .collect()
    )
    got_by_doc: dict[int, list[str]] = {}
    for r in got:
        got_by_doc.setdefault(r.doc_id, []).append(r.chunk)
    for doc_id, text in [(1, text1), (2, text2), (3, text3), (4, text4)]:
        assert sorted(got_by_doc.get(doc_id, [])) == sorted(
            py_cdc_chunks(text, CDC_G)
        ), f"doc {doc_id}"


def test_cdc_dedup_attributes_shared_chunk_to_first_doc(spark, tmp_path):
    """A chunk shared across sources counts in BOTH sources' totals but
    only the min-doc_id source's first_chunks/first_bytes."""
    from k8s_log_etl_spark.queries.dedup import CDC_G, dedup_cdc_chunks

    boundary = next(
        f"b{i}" for i in range(200) if md5_long(f"b{i}") % CDC_G == 0
    )
    # filler words verified NON-boundary, so the chunk count is exactly
    # "shared chunk + one trailing chunk" per doc by construction
    filler = [f"f{i}" for i in range(200) if md5_long(f"f{i}") % CDC_G != 0]
    shared = f"{filler[0]} {filler[1]} {filler[2]} {boundary}"
    d = _write_docs(
        tmp_path,
        [
            (1, f"{shared} {filler[3]} {filler[4]}", "src_a"),
            (2, f"{shared} {filler[5]} {filler[6]}", "src_b"),
            (3, None, "src_b"),  # NULL text: counted doc, zero chunks
        ],
    )
    rows = {r.source: r for r in dedup_cdc_chunks(spark, d).collect()}
    a, b = rows["src_a"], rows["src_b"]
    assert a.n_docs == 1 and b.n_docs == 2
    # each non-null doc = shared chunk + one trailing chunk
    assert a.n_chunks == 2 and b.n_chunks == 2
    # src_a owns the shared chunk (doc_id 1 < 2) plus its own tail;
    # src_b's shared chunk is a DUP, so it only "stores" its tail
    assert a.first_chunks == 2
    assert b.first_chunks == 1
    assert a.first_bytes == a.chunk_bytes
    assert b.first_bytes == b.chunk_bytes - len(shared)


def test_cdc_insertion_robustness(spark, tmp_path):
    """The CDC property fixed-width chunking lacks: an edit near the
    START of a doc must not re-chunk content after the next boundary —
    downstream chunks re-align and still dedupe against the original."""
    from k8s_log_etl_spark.queries.dedup import CDC_G, _cdc_chunks_col

    boundary = next(
        f"b{i}" for i in range(200) if md5_long(f"b{i}") % CDC_G == 0
    )
    base = f"intro words {boundary} stable shared suffix content"
    edited = f"INSERTED {base}"
    d = _write_docs(tmp_path, [(1, base, "a"), (2, edited, "a")])

    from pyspark.sql import functions as F

    got = (
        spark.read.parquet(f"{d}/documents.parquet")
        .select("doc_id", F.explode(_cdc_chunks_col()).alias("chunk"))
        .collect()
    )
    chunks1 = {r.chunk for r in got if r.doc_id == 1}
    chunks2 = {r.chunk for r in got if r.doc_id == 2}
    # the suffix chunk (after the boundary) is IDENTICAL in both docs
    assert "stable shared suffix content" in chunks1 & chunks2


def test_saturation_duplicate_shards_add_no_new_grams(spark, tmp_path):
    """Two textually identical docs hashed into different shards: the
    later shard's grams are all already-seen -> new_grams == 0 there,
    and the invariants sum(new)==cum[-1]==|distinct grams| hold."""
    from k8s_log_etl_spark.queries.llmprep import (
        SAT_SHARDS,
        corpus_ngram_saturation,
    )

    text = " ".join(f"tok{i}" for i in range(8))  # 4 distinct 5-grams
    # pick doc ids landing in two DIFFERENT shards
    ids = list(range(1, 400))
    shard_of = {i: md5_long(str(i)) % SAT_SHARDS for i in ids}
    lo = next(i for i in ids if shard_of[i] == 2)
    hi = next(i for i in ids if shard_of[i] == 7)
    d = _write_docs(tmp_path, [(lo, text, "a"), (hi, text, "a")])

    rows = sorted(corpus_ngram_saturation(spark, d).collect(), key=lambda r: r.shard)
    by_shard = {r.shard: r for r in rows}
    assert by_shard[2].new_grams == 4 and by_shard[2].shard_grams == 4
    assert by_shard[7].new_grams == 0 and by_shard[7].shard_grams == 4
    assert by_shard[7].novelty_ppm == 0
    assert rows[-1].cum_grams == sum(r.new_grams for r in rows) == 4
    cums = [r.cum_grams for r in rows]
    assert cums == sorted(cums)


def test_saturation_matches_python_reference_on_mixed_corpus(spark, tmp_path):
    """End-to-end exact check vs a pure-Python recomputation on a
    corpus mixing fresh, repeated and short (gram-less) docs."""
    from k8s_log_etl_spark.queries.llmprep import (
        SAT_NGRAM,
        SAT_SHARDS,
        corpus_ngram_saturation,
    )

    docs = [(i, f"w{i} x{i} common body text tail{i % 3} end", "s") for i in range(1, 15)]
    docs += [(100, "tiny", "s"), (101, "", "s")]
    d = _write_docs(tmp_path, docs)

    # python reference
    per_shard_grams: dict[int, set] = {}
    n_docs: dict[int, int] = {}
    for doc_id, text, _ in docs:
        sh = md5_long(str(doc_id)) % SAT_SHARDS
        n_docs[sh] = n_docs.get(sh, 0) + 1
        w = [x for x in text.strip().split() if x]
        grams = {
            " ".join(w[i : i + SAT_NGRAM])
            for i in range(len(w) - SAT_NGRAM + 1)
        }
        per_shard_grams.setdefault(sh, set()).update(md5_long(g) for g in grams)
    seen: set = set()
    expect = {}
    for sh in sorted(n_docs):
        grams = per_shard_grams.get(sh, set())
        new = grams - seen
        seen |= grams
        expect[sh] = (n_docs[sh], len(grams), len(new), len(seen))

    rows = sorted(corpus_ngram_saturation(spark, d).collect(), key=lambda r: r.shard)
    got = {
        r.shard: (r.n_docs, r.shard_grams, r.new_grams, r.cum_grams) for r in rows
    }
    assert got == expect
