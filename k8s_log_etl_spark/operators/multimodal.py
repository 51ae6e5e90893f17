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
