"""Shared text/n-gram column helpers used by the dedup and text-analysis
query modules."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ngram_indices(w: Column, n: int) -> Column:
    """Start indices 0..size(w)-n (inclusive) of the n-grams of token
    array `w`; EMPTY for documents shorter than n tokens.

    The naive `sequence(0, size(w)-n)` is wrong for short docs: Spark's
    sequence() steps DOWNWARD when start > stop (sequence(0,-1) =
    [0,-1], not []), and the subsequent w[i+n-1] access then throws
    INVALID_ARRAY_INDEX under Spark 4's default ANSI mode — any 1-2
    token document would abort the whole query. The DuckDB oracles'
    range(greatest(len(w)-(n-1), 0)) is empty for short docs; this
    matches.
    """
    return F.when(F.size(w) >= n, F.sequence(F.lit(0), F.size(w) - n)).otherwise(
        F.array().cast("array<int>")
    )
