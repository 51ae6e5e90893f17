"""dedup_perceptual_phash_dct: the integer-DCT kernel must match a
pure-Python reference bit-for-bit, and re-encoded twins must surface
at Hamming 0 with digest_equal false."""

from __future__ import annotations

import hashlib

import pandas as pd

from k8s_log_etl_spark.operators.multimodal import (
    DCT_BASIS_Q,
    PHASH_BANDS,
    PHASH_PIXELS,
    PHASH_VARIANT_MOD,
    PHASH_VARIANT_OFFSET,
)


def py_block_sums(payload: bytes) -> list[int]:
    """Independent pure-Python reference of decoded_block_sums: 32x32
    stub decode (md5 block digests off the high-nibble channel) + 4x4
    block sums — no numpy, loop-indexed like the DuckDB oracle."""
    hh = "".join("%x" % (x >> 4) for x in payload[:16])
    px: list[int] = []
    for blk in range(64):
        px.extend(hashlib.md5(f"{hh}:{blk}".encode()).digest())
    return [
        sum(
            px[((i // 8) * 4 + t // 4) * 32 + (i % 8) * 4 + t % 4]
            for t in range(16)
        )
        for i in range(PHASH_PIXELS)
    ]


def py_dct_bands(payload: bytes) -> list[int]:
    p = py_block_sums(payload)
    f = [
        sum(
            DCT_BASIS_Q[i // 8][x] * DCT_BASIS_Q[i % 8][y] * p[8 * x + y]
            for x in range(8)
            for y in range(8)
        )
        for i in range(64)
    ]
    med = sorted(f[1:])[31]
    bits = [1 if c > med else 0 for c in f]
    return [
        sum(bit << j for j, bit in enumerate(bits[16 * k : 16 * k + 16]))
        for k in range(PHASH_BANDS)
    ]


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


def test_dct_kernel_matches_python_reference(spark, tmp_path):
    from k8s_log_etl_spark.operators.multimodal import (
        attach_payload,
        dct_phash_signatures,
    )
    from k8s_log_etl_spark.tables import load_table

    texts = [f"document number {i} with text" for i in range(12)]
    d = _write_docs(tmp_path, texts)
    docs = load_table(spark, d, "documents")
    got = {
        r.doc_id: (r.b0, r.b1, r.b2, r.b3)
        for r in dct_phash_signatures(attach_payload(docs)).collect()
    }
    for i, t in enumerate(texts, start=1):
        payload = hashlib.md5(t.encode()).digest()
        assert got[i] == tuple(py_dct_bands(payload)), f"doc {i}"
    # DC bit (bit 0 of band 0) is structurally 1: DC >= every AC coef
    assert all(b0 & 1 for b0, *_ in got.values())


def test_dct_twins_surface_at_hamming_zero(spark, tmp_path):
    from k8s_log_etl_spark.queries.multimodal import dedup_perceptual_phash_dct

    texts = [f"different text payload {i}" for i in range(1, 16)]
    d = _write_docs(tmp_path, texts)
    rows = dedup_perceptual_phash_dct(spark, d).collect()
    twins = {
        (r.doc_a, r.doc_b): r
        for r in rows
        if r.doc_b == r.doc_a + PHASH_VARIANT_OFFSET
    }
    expected = {i for i in range(1, 16) if i % PHASH_VARIANT_MOD == 0}
    assert {a for a, _ in twins} == expected
    for r in twins.values():
        assert r.hamming == 0 and r.digest_equal is False
