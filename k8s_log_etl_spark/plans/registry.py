"""Query registry powering __spark_entry__.py.

Each operator from SURVEY.md §2 registers a named query: a callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB
oracle SQL string computing the same result on the same inputs. The
driver hash-compares the two at sf0.01.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: Optional[str] = None
    tags: tuple[str, ...] = ()
    bench: bool = False  # include in bench.py's headline set


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = QuerySpec(name, fn, oracle, tuple(tags), bench)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (imports trigger registration)."""
    from k8s_log_etl_spark.queries import (  # noqa: F401
        dedup,
        log_queries,
        multimodal,
        relational,
        similarity,
        streaming_batch,
        text,
    )

    return dict(_QUERIES)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle}


def bench_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in load_all().items() if spec.bench}
