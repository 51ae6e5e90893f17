"""k8s_log_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference k8s-log-etl pipeline
(normalize / filter / redact / aggregate over K8s JSONL logs), re-expressed
Spark-first, plus the relational + LLM-data-pipeline query surface
(joins, windows, dedup, similarity search, text analysis) required for
100 TB-scale training-data work.

Layout:
  session     — SparkSession builder tuned for local[N] and cluster use
  tables      — parquet table loaders / temp-view registration
  fixtures    — deterministic JSONL log fixture shared with the DuckDB oracle
  config      — pipeline configuration (filter/redact rules)
  operators/  — DataFrame→DataFrame operators (lognorm, relational, dedup, …)
  oracles/    — DuckDB oracle SQL builders mirroring each operator
  plans/      — query registry powering __spark_entry__.py
  sinks/      — foreachBatch writers (retry/backoff, DLQ, rotation, HTTP)
  streaming/  — Structured Streaming pipelines and windowed aggregations
"""

__version__ = "0.1.0"
