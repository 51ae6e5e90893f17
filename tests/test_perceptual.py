"""Perceptual near-dup (dedup_perceptual_ahash): the manufactured
re-encoded twins are exactly the rows the digest path cannot pair —
every twin must appear at Hamming 0 with digest_equal=False, the
banded pigeonhole join must be lossless at the reported radius, and
signatures must be invariant to low-nibble (re-encode) noise.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from k8s_log_etl_spark.operators import multimodal as MM
from k8s_log_etl_spark.queries.multimodal import dedup_perceptual_ahash

SF = "/root/testdata/sf0.01"


def test_every_manufactured_twin_caught_and_digest_misses_it(spark):
    if not os.path.exists(os.path.join(SF, "documents.parquet")):
        pytest.skip("sf0.01 testdata not present")
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    expected_twins = {
        r["doc_id"]
        for r in docs.filter(F.col("doc_id") % MM.PHASH_VARIANT_MOD == 0)
        .select("doc_id")
        .collect()
    }
    rows = dedup_perceptual_ahash(spark, SF).collect()
    twin_pairs = {
        r["doc_a"]
        for r in rows
        if r["doc_b"] == r["doc_a"] + MM.PHASH_VARIANT_OFFSET
    }
    # lossless: EVERY re-encoded twin is paired with its original
    assert twin_pairs == expected_twins
    # and for each, the perceptual hash matched while the digest differs
    for r in rows:
        if r["doc_b"] == r["doc_a"] + MM.PHASH_VARIANT_OFFSET:
            assert r["hamming"] == 0
            assert r["digest_equal"] is False
    # radius contract: nothing beyond PHASH_MAX_HAMMING is reported
    assert all(r["hamming"] <= MM.PHASH_MAX_HAMMING for r in rows)


def test_signature_invariant_to_low_nibble_noise_only(spark):
    """aHash must ignore the noise channel (low nibbles) and respond
    to the perceptual channel (high nibbles): a low-nibble rewrite
    hashes identically with a new digest; a single high-nibble change
    moves at least one band or bit."""
    base = bytes(range(16))
    noisy = bytes((b & 0xF0) | 0x07 for b in base)
    percept = bytes([base[0] ^ 0xF0]) + base[1:]
    df = spark.createDataFrame(
        [(1, base), (2, noisy), (3, percept)], "doc_id long, payload binary"
    )
    sigs = {r["doc_id"]: r for r in MM.ahash_signatures(df).collect()}
    b = lambda r: (r["b0"], r["b1"], r["b2"], r["b3"])  # noqa: E731
    assert b(sigs[1]) == b(sigs[2])
    assert sigs[1]["digest"] != sigs[2]["digest"]
    assert b(sigs[1]) != b(sigs[3])


def test_capped_bands_drops_hot_buckets_only(spark):
    """PHASH_BUCKET_CAP: a (band, value) bucket holding more than CAP
    docs is dropped wholesale from candidate generation; buckets at or
    under the cap pass through untouched (the POSTING_CAP discipline —
    mirrored by the HAVING clause in both perceptual oracles)."""
    from k8s_log_etl_spark.queries.multimodal import _capped_bands

    hot = [(i, 0, 7) for i in range(MM.PHASH_BUCKET_CAP + 1)]
    cool = [(1, 1, 9), (2, 1, 9)]
    df = spark.createDataFrame(
        hot + cool, "doc_id long, band_idx int, val int"
    )
    got = _capped_bands(df).collect()
    assert len(got) == 2
    assert all(r["band_idx"] == 1 and r["val"] == 9 for r in got)
    # exactly at the cap: kept
    at_cap = [(i, 2, 5) for i in range(MM.PHASH_BUCKET_CAP)]
    df2 = spark.createDataFrame(at_cap, "doc_id long, band_idx int, val int")
    assert _capped_bands(df2).count() == MM.PHASH_BUCKET_CAP


def test_variant_rows_are_flatmap_of_originals(spark):
    """with_reencoded_variants: originals pass through byte-identical,
    twins appear only for doc_id % mod == 0, offset by the constant."""
    rows = [(i, bytes([i * 3 % 251] * 16)) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: bytes(r["payload"]) for r in MM.with_reencoded_variants(df).collect()}
    originals = {i: p for i, p in rows}
    twins = {
        i + MM.PHASH_VARIANT_OFFSET
        for i in originals
        if i % MM.PHASH_VARIANT_MOD == 0
    }
    assert set(got) == set(originals) | twins
    for i, p in originals.items():
        assert got[i] == p
    for t in twins:
        orig = originals[t - MM.PHASH_VARIANT_OFFSET]
        assert got[t] != orig
        assert [x & 0xF0 for x in got[t]] == [x & 0xF0 for x in orig]
