"""JSONL sources (reference O1: scan of a file or stdin —
cmd/etl/main.go:570-579, 340-356).

Batch and streaming readers share the same downstream lineage
(operators.lognorm.run_pipeline is mode-agnostic). The streaming reader
is the Structured Streaming file source: drop JSONL files into a
directory and each micro-batch picks up new ones — the idiomatic
replacement for the reference's tail-a-file/stdin loop, with
``maxFilesPerTrigger`` as the backpressure knob (reference O24's
bounded queue).

stdin has no Spark source; ``read_stdin_lines`` materializes stdin to a
temp file first (driver-side, bounded by local disk, documented as the
dev/debug path — production inputs are files or a message bus).
"""

from __future__ import annotations

import os
import sys
import tempfile

from pyspark.sql import DataFrame, SparkSession


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Batch: one `value: string` row per line, splittable by file and
    byte range."""
    return spark.read.text(path)


def read_jsonl_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming: file-source over a directory of JSONL files."""
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.text(path)


def read_stdin_lines(spark: SparkSession) -> DataFrame:
    """Dev/debug: spool stdin to a temp file, then batch-read it."""
    tmp = tempfile.NamedTemporaryFile(
        "w", suffix=".jsonl", prefix="stdin_", delete=False, encoding="utf-8"
    )
    with tmp:
        for line in sys.stdin:
            tmp.write(line)
    return spark.read.text(os.path.abspath(tmp.name))
