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
PHASH_PIXELS = 64
PHASH_BANDS = 4                # 4 x 16-bit bands over the 64 aHash bits
PHASH_MAX_HAMMING = 3          # pigeonhole-lossless with 4 bands

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
    """STUB perceptual hash — the aHash (average-hash) shape over the
    fake decoder's pixel channel, NOT a real image hash. Decode: the
    16 payload high nibbles are the stable "pixels" a real decoder
    would produce regardless of encoding; 64 fake pixels are mixed
    nibble pairs p_i = h[i mod 16]*16 + h[(3i + i div 16) mod 16]
    (the second index is aperiodic over the 64 positions, so the four
    bands below carry distinct bits). aHash: bit_i = 1 iff
    64*p_i >= sum(p) — the integer-exact form of "pixel above mean".
    Signature = 4 x 16-bit band ints (b0..b3), avoiding 64-bit sign
    games in either engine; digest = payload hex (byte identity).
    Swap the pixel derivation for a real decode + 8x8 downscale
    outside this environment; everything downstream (banding, the
    pigeonhole join, Hamming verify) is the real operator. Low-nibble
    noise never moves any pixel, so a re-encoded twin hashes
    IDENTICALLY; Hamming <= PHASH_MAX_HAMMING is caught losslessly by
    the 4-band pigeonhole (d+1 bands catch any d-bit difference)."""

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "digest": [], "b0": [], "b1": [], "b2": [], "b3": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                h = [x >> 4 for x in b[:16]]
                p = [
                    h[i % 16] * 16 + h[(3 * i + i // 16) % 16]
                    for i in range(PHASH_PIXELS)
                ]
                s = sum(p)
                bits = [1 if 64 * px >= s else 0 for px in p]
                out["doc_id"].append(doc_id)
                out["digest"].append(b.hex())
                for k in range(PHASH_BANDS):
                    out[f"b{k}"].append(
                        sum(bit << j for j, bit in enumerate(bits[16 * k : 16 * k + 16]))
                    )
            pdf_out = pd.DataFrame(out)
            for k in range(PHASH_BANDS):
                pdf_out[f"b{k}"] = pdf_out[f"b{k}"].astype("int32")
            yield pdf_out

    return _drop_null_payloads(df).mapInPandas(fn, AHASH_SCHEMA)


# ---------------------------------------------------------------------------
# DCT perceptual hash (pHash — Zauner 2010) over the same fake-decoded
# pixel channel as ahash_signatures
# ---------------------------------------------------------------------------

# Integer DCT-II basis, round(cos(pi*(2x+1)*u/16) * 1024): hardcoded so
# the Python kernel and the DuckDB oracle share the EXACT same
# literals — every coefficient is then pure int64 arithmetic
# (|F| <= 255*64*1024^2 ~ 1.7e10, far inside int64).
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
    twins hash identically here too. Swap the pixel derivation for a
    real decode + 32x32 downscale outside this environment."""

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        B = np.array(DCT_BASIS_Q, dtype=np.int64)
        for pdf in batches:
            out = {"doc_id": [], "digest": [], "b0": [], "b1": [], "b2": [], "b3": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                h = [x >> 4 for x in b[:16]]
                p = [
                    h[i % 16] * 16 + h[(3 * i + i // 16) % 16]
                    for i in range(PHASH_PIXELS)
                ]
                P = np.array(p, dtype=np.int64).reshape(8, 8)
                f = (B @ P @ B.T).reshape(64)
                med = int(np.sort(f[1:])[31])  # 32nd smallest of 63 AC
                bits = [1 if int(c) > med else 0 for c in f]
                out["doc_id"].append(doc_id)
                out["digest"].append(b.hex())
                # Contiguous banding, MEASURED as the least-skewed
                # disjoint 4-partition of these bits (5.3k/4.6k/2.9k/
                # 3.7k distinct values per band at 6k images vs 1.0k-
                # 1.7k interleaved, 1.7k-4.6k row-paired): DCT bits of
                # the structured stub pixels co-vary, so every
                # partition is skewed vs aHash's 4.7k and the
                # candidate join saturates near ~1M images (SCALE.md
                # cliff) — the lever is a richer decode (real 32x32
                # pixels) and log(n)-wide bands, not the partition.
                for k in range(PHASH_BANDS):
                    out[f"b{k}"].append(
                        sum(bit << j for j, bit in enumerate(bits[16 * k : 16 * k + 16]))
                    )
            pdf_out = pd.DataFrame(out)
            for k in range(PHASH_BANDS):
                pdf_out[f"b{k}"] = pdf_out[f"b{k}"].astype("int32")
            yield pdf_out

    return _drop_null_payloads(df).mapInPandas(fn, AHASH_SCHEMA)
