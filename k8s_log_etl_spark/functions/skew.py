"""Skew-handling join helper (charter: "skewed keys hurt … salting for
skew").

`salted_join` spreads a hot key's rows across SALT buckets: the large
(skewed) side gets a random salt in [0, SALT); the small side is
exploded SALT× with every salt value; the join key becomes
(key, salt). Row multiplicity is unchanged — results are exactly equal
to the unsalted join — but the hot key's shuffle partition is split
SALT ways. AQE's skew-join splitting handles sort-merge joins
automatically; explicit salting remains the tool for skewed
*aggregations* and for engines/paths AQE does not cover, so it lives
here as a first-class operator with an equivalence test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join `large ⋈ small` on `key` with `salt`-way hot-key spreading.

    `small` is exploded salt×, so keep it the dimension side. Output
    columns = large's columns + small's non-key columns (the salt
    plumbing is dropped).
    """
    lcol = f"__salt_{key}"
    big = large.withColumn(lcol, (F.rand(seed=42) * salt).cast("int"))
    rep = small.withColumn(lcol, F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    joined = big.join(rep, on=[key, lcol], how=how)
    return joined.drop(lcol)
