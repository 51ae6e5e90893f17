"""Cross-engine deterministic primitives.

Helpers whose results are bit-identical between Spark and the DuckDB
oracle, so hash/minhash/similarity queries can be verified value-exactly:

* ``md5_long`` — a 60-bit integer hash of a string via md5 hex digits
  (both engines agree on md5; 15 hex digits < 2^60 avoids sign issues).
* ``minhash_perm`` — universal-hash permutations ``(a*h + b) mod p`` on
  top of ``md5_long``, kept under 2^63 to avoid overflow divergence.
* ``dot / cosine`` — double-precision sequential dot products via
  ``zip_with`` + ``aggregate`` (same left-to-right order DuckDB's
  ``list_`` functions use is NOT guaranteed, so oracles spell the same
  explicit summation).

Spark expressions stay in whole-stage codegen; the module also emits
the equivalent DuckDB SQL snippet for each primitive so query and
oracle share one definition.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^31 - 1, Mersenne prime: a*h stays < 2^63 for a < ~4e9.
MERSENNE31 = 2_147_483_647


def md5_long(c: Column) -> Column:
    """60-bit non-negative integer hash of a string column."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def md5_long_sql(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def minhash_perm(h: Column, a: int, b: int) -> Column:
    """Universal hash permutation of an md5_long value."""
    return (h % MERSENNE31) * a % MERSENNE31 + b


def minhash_perm_sql(h_expr: str, a: int, b: int) -> str:
    return f"(({h_expr}) % {MERSENNE31}) * {a} % {MERSENNE31} + {b}"


def dot(u: Column, v: Column) -> Column:
    """Sequential double-precision dot product of two array columns."""
    return F.aggregate(
        F.zip_with(u, v, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_sql(u: str, v: str) -> str:
    """DuckDB: same sequential summation (list_reduce is left-to-right)."""
    return (
        f"list_reduce(list_prepend(0.0, "
        f"list_transform(list_zip({u}, {v}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), "
        f"(acc, x) -> acc + x)"
    )


def dot_fixed_sql(u: str, v: str, dim: int) -> str:
    """Spark-SQL string for `dot` UNROLLED over a known, fixed
    dimensionality (round-13, guide §4.1): `zip_with` + `aggregate`
    lambdas evaluate INTERPRETED, outside whole-stage codegen — per-row
    higher-order dispatch was measured 2.6-5.5x slower than codegen'd
    expressions elsewhere in this repo. The unrolled left-associated
    chain `((0.0 + u1*v1) + u2*v2) + ...` performs the exact additions
    of `aggregate`'s sequential fold in the same order on the same
    doubles, so results are bit-identical; it only becomes codegen'able.
    The ingest contract is arrays of exactly `dim` elements; on a row
    that VIOLATES it, try_element_at (round-13 ADVICE: ANSI-mode
    element_at would fail the whole job on one malformed vector)
    yields NULL past the end, the NULL propagates through the chain,
    and the row scores NULL — byte-for-byte the old zip_with/aggregate
    fold's behavior, which load_vectors' sq_norm > 0 ingest guard then
    drops (pinned in tests/test_fixed_dim_contract.py). Emitted as ONE
    SQL string so plan construction is one JVM parse, not O(dim) py4j
    calls."""
    terms = " + ".join(
        f"(CAST(try_element_at({u}, {i + 1}) AS DOUBLE)"
        f" * CAST(try_element_at({v}, {i + 1}) AS DOUBLE))"
        for i in range(dim)
    )
    return f"(CAST(0.0 AS DOUBLE) + {terms})"


def cosine_fixed_sql(u: str, v: str, dim: int) -> str:
    """Unrolled-codegen twin of `cosine` for fixed-dim arrays — same
    sequential summation per dot, so bit-identical to the lambda form."""
    return (
        f"({dot_fixed_sql(u, v, dim)} / "
        f"(sqrt({dot_fixed_sql(u, u, dim)}) * sqrt({dot_fixed_sql(v, v, dim)})))"
    )


def dot_fixed(u: str, v: str, dim: int) -> Column:
    return F.expr(dot_fixed_sql(u, v, dim))


def cosine_fixed(u: str, v: str, dim: int) -> Column:
    return F.expr(cosine_fixed_sql(u, v, dim))


def l2norm(u: Column) -> Column:
    return F.sqrt(dot(u, u))


def l2norm_sql(u: str) -> str:
    return f"sqrt({dot_sql(u, u)})"


def cosine(u: Column, v: Column) -> Column:
    return dot(u, v) / (l2norm(u) * l2norm(v))


def cosine_sql(u: str, v: str) -> str:
    return f"({dot_sql(u, v)} / ({l2norm_sql(u)} * {l2norm_sql(v)}))"
