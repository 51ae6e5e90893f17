"""Multimodal column plumbing (§2c charter).

Media payloads are opaque ``binary`` columns with a typed metadata
struct alongside. Real decoders (image/audio libs) are not available in
this environment, so the decode step is a clearly-marked deterministic
fake — but the Spark-side plumbing is real: Arrow-batched
``mapInPandas`` with an explicit output schema, binary-safe batches,
and partition-preserving iteration. Swapping ``_fake_decode`` for PIL /
torchaudio is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_pixels", LongType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a deterministic binary payload column (md5 digest of
    the text) standing in for real media bytes."""
    return df.withColumn("payload", F.unhex(F.md5(F.col(text_col))))


def _drop_null_payloads(df: DataFrame) -> DataFrame:
    """The decode gate's NULL policy (round-7 NULL-text sweep): a NULL
    payload is an undecodable blob — a real decoder would dead-letter
    it; every stub kernel drops it BEFORE the Python worker so the
    Arrow batches never carry None. Oracles mirror with
    `WHERE text IS NOT NULL` (payload is md5(text))."""
    return df.filter(F.col("payload").isNotNull()).select("doc_id", "payload")


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """STUB decoder — NOT a real image decode. Reads the first two
    payload bytes as (width, height). Replace with a real decoder
    (PIL.Image.open etc.) outside this environment."""
    if payload is None or len(payload) < 2:
        raise ValueError("payload too short for fake decode")
    return payload[0], payload[1]


def decode_metadata(df: DataFrame) -> DataFrame:
    """Arrow-batched mapInPandas decode: one Python worker pass per
    partition, batch-columnar transfer, no row-at-a-time pickling. The
    output schema is fixed so downstream stays fully typed."""

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            decoded = pdf["payload"].map(_fake_decode)
            pdf = pdf[["doc_id", "payload"]].copy()
            pdf["width"] = decoded.map(lambda wh: wh[0]).astype("int32")
            pdf["height"] = decoded.map(lambda wh: wh[1]).astype("int32")
            pdf["n_pixels"] = (pdf["width"].astype("int64") * pdf["height"]).astype("int64")
            yield pdf

    return _drop_null_payloads(df).mapInPandas(fn, DECODE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("thumb", BinaryType()),
    ]
)


def resize_thumbnails(df: DataFrame, max_dim: int = 64) -> DataFrame:
    """STUB resize — NOT a real image op. Scales the fake (width,
    height) to fit max_dim and emits a deterministic fake thumbnail
    payload (truncated md5 bytes). The mapInPandas plumbing — binary in,
    binary out, fixed schema, batch shape — is the real part; swap the
    body for PIL's Image.thumbnail outside this environment."""

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "thumb": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h = _fake_decode(payload)
                scale = max_dim / max(w, h, 1)
                scale = min(scale, 1.0)
                out["doc_id"].append(doc_id)
                out["width"].append(int(w * scale))
                out["height"].append(int(h * scale))
                out["thumb"].append(bytes(payload[:4]))
            import pandas as pd

            pdf_out = pd.DataFrame(out)
            pdf_out["width"] = pdf_out["width"].astype("int32")
            pdf_out["height"] = pdf_out["height"].astype("int32")
            yield pdf_out

    return _drop_null_payloads(df).mapInPandas(fn, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(df: DataFrame, every_nth: int = 4) -> DataFrame:
    """STUB frame sampler — treats the payload as a fake "video" of
    1-byte frames and emits every Nth as its own row (a 1:N flatMap in
    mapInPandas — the shape a real ffmpeg-backed sampler would have)."""

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for idx in range(0, len(payload), every_nth):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame"].append(bytes(payload[idx : idx + 1]))
            pdf_out = pd.DataFrame(out)
            pdf_out["frame_idx"] = pdf_out["frame_idx"].astype("int32")
            yield pdf_out

    return _drop_null_payloads(df).mapInPandas(fn, FRAME_SCHEMA)


FEATURE_DIMS = 8
FEATURE_QUANT = 1_000_000  # per-image feature norm quantized to micro-units

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("norm_q", LongType()),
    ]
)


def extract_features(df: DataFrame) -> DataFrame:
    """STUB feature extractor — NOT a real vision model. Maps the first
    FEATURE_DIMS payload bytes to [0,1] floats (a stand-in for an
    image-embedding forward pass) and emits the L2 norm of that vector,
    quantized to integer micro-units so any downstream aggregate is
    exact and order-free. The Arrow mapInPandas plumbing — batch
    columnar in, fixed typed schema out — is the real part; swap the
    body for a real encoder (CLIP/ResNet forward) outside this
    environment. The arithmetic is a sequential Python float fold,
    bit-identical to the DuckDB oracle's list_reduce."""

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import math

        import pandas as pd

        for pdf in batches:
            norms = []
            for payload in pdf["payload"]:
                acc = 0.0
                for i in range(FEATURE_DIMS):
                    x = payload[i] / 255.0
                    acc = acc + x * x
                # floor(x + 0.5): explicit half-away-from-zero for the
                # non-negative norm — Python round() is half-to-even and
                # would diverge from the DuckDB oracle's round() on an
                # exact .5 product.
                norms.append(int(math.floor(math.sqrt(acc) * FEATURE_QUANT + 0.5)))
            out = pd.DataFrame({"doc_id": pdf["doc_id"], "norm_q": norms})
            out["norm_q"] = out["norm_q"].astype("int64")
            yield out

    return _drop_null_payloads(df).mapInPandas(fn, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# perceptual near-dup: re-encoded variants + aHash signatures
# ---------------------------------------------------------------------------

PHASH_VARIANT_MOD = 5          # every mod-th doc gets a re-encoded twin
PHASH_VARIANT_OFFSET = 10_000_000
PHASH_DECODE_SIDE = 32         # stub decode emits a 32x32 pixel field
PHASH_PIXELS = 64              # 8x8 block sums fed to aHash / the DCT
PHASH_BANDS = 4                # 4 x 16-bit bands over the 64 hash bits
PHASH_MAX_HAMMING = 3          # pigeonhole-lossless with 4 bands
# Hot-bucket cap (the POSTING_CAP discipline from dedup_minhash_lsh):
# a (band, value) bucket holding more docs than this is dropped from
# candidate generation on BOTH engines. Bounds the per-bucket pair
# blowup sum C(k,2) that saturated the skewed round-8 DCT bands
# (SCALE.md cliff #7); the lossless pigeonhole guarantee weakens to
# "lossless unless EVERY band a pair shares is over-cap" — with the
# full-entropy 32x32 decode below, buckets at 1M images average ~16
# docs and the cap is a skew safety net, not a recall tax (twin
# coverage re-measured after the cap landed — see the query tests).
PHASH_BUCKET_CAP = 64


def decoded_block_sums(payload: bytes) -> "list[int]":
    """STUB 32x32 decode + exact 8x8 downscale — the perceptual
    channel both hash kernels and both DuckDB oracles share.

    Decode (fake, honestly marked): a real decoder would emit a 32x32
    luminance field whose entropy is the image's, invariant to
    re-encoding bytes. The stub mirrors both properties from the
    16-byte payload: the HIGH nibbles (the re-encode-invariant
    channel; low-nibble noise is the fake compression error) seed 64
    md5 block digests — md5(hh || ':' || blk), blk 0..63 — whose 1024
    bytes are the pixels. Full-entropy pixels are what kill round-8's
    band-saturation cliff: the old 16-nibble mixing confined the 64
    DCT coefficients to a 16-dim subspace, so band values skewed and
    the pigeonhole buckets saturated near ~1M images (SCALE.md cliff
    #7, measured 18.2x on the second decade).

    Downscale: 4x4 block SUMS (exact int64; both aHash's mean
    threshold and the DCT median threshold are scale-invariant, so
    sums == means without a division). Swap this function for a real
    decode + box-filter outside this environment; everything
    downstream is the real operator."""
    return [int(v) for v in decoded_block_sums_batch([payload])[0]]


# hoisted ":<blk>" byte suffixes — measured 30% off the per-image
# decode cost vs per-call f-string formatting (64 md5 calls/image are
# the floor either way)
_BLOCK_SUFFIXES = tuple(f":{b}".encode() for b in range(PHASH_PIXELS))


def decoded_block_sums_batch(payloads) -> "np.ndarray":
    """Batch form of decoded_block_sums: (n, 64) int64 block sums for
    a sequence of payloads. The 64 md5 calls per image are the
    irreducible Python floor; everything after them (frombuffer,
    reshape, the 4x4 block sums) runs ONCE per Arrow batch instead of
    once per image — per-image numpy overhead was the dominant cost of
    the perceptual kernels at synth-sf10."""
    import hashlib

    import numpy as np

    n = len(payloads)
    side = PHASH_DECODE_SIDE
    if n == 0:
        return np.empty((0, PHASH_PIXELS), dtype=np.int64)
    raw = b"".join(
        hashlib.md5(hhb + suf).digest()
        for hhb in (bytes(p)[:16].hex()[0::2].encode() for p in payloads)
        for suf in _BLOCK_SUFFIXES
    )
    px = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
    return (
        px.reshape(n, side // 4, 4, side // 4, 4)
        .sum(axis=(2, 4))
        .reshape(n, PHASH_PIXELS)
    )

VARIANT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def with_reencoded_variants(df: DataFrame, mod: int = PHASH_VARIANT_MOD) -> DataFrame:
    """Manufacture the corpus condition perceptual dedup exists for:
    every mod-th document gains a "re-encoded" twin — byte-DIFFERENT
    payload (every low nibble replaced by deterministic noise, the fake
    analogue of compression/quantization error) whose HIGH nibbles (the
    fake decoder's perceptual channel) are untouched. The twin's digest
    differs from the original's, so exact payload dedup
    (multimodal_curation_pipeline's digest hash-agg) can never pair
    them; a perceptual hash over decoded features must. 1:N flatMap in
    Arrow mapInPandas (the sample_frames shape)."""

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, pays = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                ids.append(doc_id)
                pays.append(b)
                if doc_id % mod == 0:
                    ids.append(doc_id + PHASH_VARIANT_OFFSET)
                    pays.append(
                        bytes(
                            (x & 0xF0) | ((doc_id + j) % 16)
                            for j, x in enumerate(b)
                        )
                    )
            yield pd.DataFrame({"doc_id": ids, "payload": pays})

    return _drop_null_payloads(df).mapInPandas(fn, VARIANT_SCHEMA)


AHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("digest", StringType()),
        StructField("b0", IntegerType()),
        StructField("b1", IntegerType()),
        StructField("b2", IntegerType()),
        StructField("b3", IntegerType()),
    ]
)


def ahash_signatures(df: DataFrame) -> DataFrame:
    """aHash (average-hash) over the decoded-channel block sums, NOT a
    real image hash (the decode itself is the honestly-marked stub —
    see decoded_block_sums; everything downstream is the real
    operator). Decode: 32x32 full-entropy pixels from the payload's
    re-encode-invariant high-nibble channel; downscale: exact 4x4
    block sums. aHash: bit_i = 1 iff 64*q_i >= sum(q) — the
    integer-exact form of "block above mean" (sums == means under a
    scale-invariant threshold). Signature = 4 x 16-bit band ints
    (b0..b3), avoiding 64-bit sign games in either engine; digest =
    payload hex (byte identity). Low-nibble noise never moves any
    pixel, so a re-encoded twin hashes IDENTICALLY; Hamming <=
    PHASH_MAX_HAMMING is caught by the 4-band pigeonhole (d+1 bands
    catch any d-bit difference), lossless up to the documented
    PHASH_BUCKET_CAP hot-bucket drop."""

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        bw = np.array([1 << j for j in range(16)], dtype=np.int32)
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            q = decoded_block_sums_batch(payloads)  # (n, 64) int64
            s = q.sum(axis=1, keepdims=True)
            bits = 64 * q >= s  # (n, 64) bool — exact integer compare
            pdf_out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "digest": [p.hex() for p in payloads],
                }
            )
            for k in range(PHASH_BANDS):
                band = bits[:, 16 * k : 16 * k + 16].astype(np.int32)
                pdf_out[f"b{k}"] = band @ bw
            yield pdf_out

    return _drop_null_payloads(df).mapInPandas(fn, AHASH_SCHEMA)


# ---------------------------------------------------------------------------
# DCT perceptual hash (pHash — Zauner 2010) over the same fake-decoded
# pixel channel as ahash_signatures
# ---------------------------------------------------------------------------

# Integer DCT-II basis, round(cos(pi*(2x+1)*u/16) * 1024): hardcoded so
# the Python kernel and the DuckDB oracle share the EXACT same
# literals — every coefficient is then pure int64 arithmetic
# (block sums <= 16*255, so |F| <= 4080*64*1024^2 ~ 2.7e11, far
# inside int64).
DCT_BASIS_Q = [
    [1024, 1024, 1024, 1024, 1024, 1024, 1024, 1024],
    [1004, 851, 569, 200, -200, -569, -851, -1004],
    [946, 392, -392, -946, -946, -392, 392, 946],
    [851, -200, -1004, -569, 569, 1004, 200, -851],
    [724, -724, -724, 724, 724, -724, -724, 724],
    [569, -1004, 200, 851, -851, -200, 1004, -569],
    [392, -946, 946, -392, -392, 946, -946, 392],
    [200, -569, 851, -1004, 1004, -851, 569, -200],
]

# Flattened Kronecker weight table W[64*i + j] with i = 8u+v, j = 8x+y:
# F_i = sum_j W[64*i+j] * p_j — the form both the numpy kernel's
# B @ P @ B.T and the oracle's list fold compute.
DCT_W_FLAT = [
    DCT_BASIS_Q[i // 8][j // 8] * DCT_BASIS_Q[i % 8][j % 8]
    for i in range(64)
    for j in range(64)
]


def dct_phash_signatures(df: DataFrame) -> DataFrame:
    """DCT perceptual hash (the pHash shape, Zauner 2010) over the
    SAME stub pixel channel as ahash_signatures — the robust member of
    the perceptual family: aHash thresholds pixels against their mean
    (cheap, brittle to global luminance), pHash thresholds DCT
    COEFFICIENTS against their AC median, so the 64 bits encode the
    image's low-frequency structure. All-integer: the 8x8 DCT-II basis
    is quantized to 1/1024 units (DCT_BASIS_Q), F = B.P.Bt is exact
    int64 matmul, and the threshold is the 32nd-smallest of the 63 AC
    coefficients (strict >, so the DC bit is structurally 1 and ~half
    the AC bits set). Same 4 x 16-bit band signature and NULL-payload
    gate as aHash; low-nibble re-encode noise never moves a pixel, so
    twins hash identically here too.

    Round-9 decode rework (SCALE.md cliff #7): the former 16-nibble
    mixed channel confined the 64 DCT coefficients to a 16-dim
    subspace — bits co-varied, band values skewed (2.6k-5.3k distinct
    per band at 6k images; three disjoint 4-partitions of the bits
    were measured and contiguous was already the best), and the
    pigeonhole join went 18.2x super-linear on the second decade as
    buckets saturated. The full-entropy 32x32 decode
    (decoded_block_sums) decorrelates the coefficients at the root;
    PHASH_BUCKET_CAP bounds whatever residual skew remains."""

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        B = np.array(DCT_BASIS_Q, dtype=np.int64)
        bw = np.array([1 << j for j in range(16)], dtype=np.int32)
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            Q = decoded_block_sums_batch(payloads).reshape(-1, 8, 8)
            # batched exact int64 DCT: (8,8) @ (n,8,8) @ (8,8)
            f = np.matmul(np.matmul(B, Q), B.T).reshape(-1, 64)
            med = np.sort(f[:, 1:], axis=1)[:, 31]  # 32nd smallest of 63 AC
            bits = f > med[:, None]
            pdf_out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "digest": [p.hex() for p in payloads],
                }
            )
            for k in range(PHASH_BANDS):
                band = bits[:, 16 * k : 16 * k + 16].astype(np.int32)
                pdf_out[f"b{k}"] = band @ bw
            yield pdf_out

    return _drop_null_payloads(df).mapInPandas(fn, AHASH_SCHEMA)
