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

    return df.select("doc_id", "payload").mapInPandas(fn, DECODE_SCHEMA)


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

    return df.select("doc_id", "payload").mapInPandas(fn, RESIZE_SCHEMA)


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

    return df.select("doc_id", "payload").mapInPandas(fn, FRAME_SCHEMA)


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

    return df.select("doc_id", "payload").mapInPandas(fn, FEATURE_SCHEMA)
