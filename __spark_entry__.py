"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over k8s_log_etl_spark.plans.registry: every implemented
operator from SURVEY.md §2 registers a named (spark, sf_dir) -> DataFrame
query and (when SQL-expressible) a DuckDB oracle SQL string.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from k8s_log_etl_spark.plans import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full log-ETL pipeline
    (scan → parse → normalize → filter → redact) over JSONL synthesized
    from the events table."""
    from k8s_log_etl_spark.queries.log_queries import pipeline_events

    return pipeline_events(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
