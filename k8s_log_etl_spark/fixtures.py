"""Deterministic JSONL log fixture shared between the Spark queries and the
DuckDB oracle.

The same raw lines are materialized two ways:
  * :func:`fixture_df` — a Spark DataFrame ``(line_id int, value string)``;
  * :func:`fixture_values_cte` — a SQL ``VALUES`` list for a DuckDB CTE.

Coverage follows the reference's unit/integration cases
(k8s-log-etl ``internal/stages/normalize_test.go``,
``examples/k8s_logs.jsonl``): alias forms, the kubernetes nested block,
top-level-override conflicts, PII fields, rejection rows (missing/invalid
timestamp, missing msg/level), non-string canonical values, whitespace
trim asymmetry, malformed JSON, non-object JSON, and blank lines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

LOG_LINES: list[tuple[int, str]] = [
    (0, '{"ts":"2025-12-14T19:25:12.345Z","level":"INFO","msg":"request started","service":"orders",'
        '"namespace":"prod","pod":"orders-api-6f4c9b7c8d-xp9k2","node":"ip-10-0-2-15","trace_id":"a1",'
        '"path":"/checkout","status":200}'),
    (1, '{"ts":"2025-12-14T19:25:12.412Z","level":"WARN","msg":"slow upstream","service":"orders",'
        '"namespace":"prod","pod":"orders-api-6f4c9b7c8d-xp9k2","node":"ip-10-0-2-15","trace_id":"a1",'
        '"latency_ms":1843,"user_email":"jane@example.com"}'),
    (2, '{"ts":"2025-12-14T19:25:13.001Z","level":"ERROR","msg":"payment declined","service":"payments",'
        '"namespace":"prod","pod":"payments-7c9f","node":"ip-10-0-2-16","trace_id":"b7",'
        '"token":"sk-live-abc123","amount":49.99,"ok":false}'),
    # alias form: time/severity/message/app + kubernetes block + trace
    (3, '{"time":"2025-12-14T19:25:14Z","severity":"error","message":"timeout contacting auth",'
        '"app":"gateway","kubernetes":{"namespace_name":"edge","pod_name":"gw-1","node_name":"ip-10-0-3-9",'
        '"container":"proxy"},"trace":"c9","client_ip":"10.2.3.4"}'),
    # component fallback + hostname fallback + top-level namespace overriding the k8s block
    (4, '{"ts":"2025-12-14T19:25:15Z","level":"debug","msg":"cache hit","component":"cache",'
        '"hostname":"node-7","namespace":"prod","kubernetes":{"namespace_name":"ignored-ns","pod_name":"cache-0"},'
        '"nested":{"k": 87},"tags":[1,2,"x"],"flag":true,"empty":null}'),
    # whitespace: ts/level/msg/service/node/trace trimmed; namespace/pod NOT trimmed
    (5, '{"ts":"  2025-12-14T19:25:16Z  ","level":"  warn ","msg":"  padded  ","service":" SvcA ",'
        '"namespace":" padded-ns ","pod":" pod-x ","node":" n1 ","trace_id":" t1 "}'),
    # timezone-offset timestamp
    (6, '{"ts":"2025-12-14T19:25:17+02:00","level":"INFO","msg":"offset ts","service":"orders"}'),
    # rejection rows
    (7, '{"level":"INFO","msg":"missing ts","service":"orders"}'),
    (8, '{"ts":"not-a-date","level":"INFO","msg":"bad ts"}'),
    (9, '{"ts":"","level":"INFO","msg":"empty ts"}'),
    (10, '{"ts":"2025-12-14T19:25:18Z","msg":"missing level"}'),
    (11, '{"ts":"2025-12-14T19:25:19Z","level":"INFO"}'),
    (12, '{"ts":"2025-12-14T19:25:20Z","level":"INFO","msg":""}'),
    # non-string canonical values: ignored for extraction AND excluded from fields
    (13, '{"ts": 123, "level":"INFO","msg":"non-string ts"}'),
    (14, '{"ts":"2025-12-14T19:25:21Z","level":42,"msg":"non-string level"}'),
    # malformed JSON / non-object JSON (reference unmarshals into a map: non-objects fail)
    (15, 'not valid json {'),
    (16, ''),
    (17, '   '),
    (18, '[1,2,3]'),
    (19, '"just a string"'),
    # PII-heavy row and a service-alias row that passes the default filter
    (20, '{"ts":"2025-12-14T19:25:22Z","level":"ERROR","msg":"deep fields","service":"payments",'
        '"user_email":"bob@x.io","token":"t-1","db_host":"db-3","phone":"+1-555","retry":3}'),
    (21, '{"ts":"2025-12-14T19:25:23Z","level":"WARN","msg":"svc via app","app":"Payments","namespace":"prod"}'),
]


def fixture_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(LOG_LINES, "line_id int, value string")


def fixture_values_cte() -> str:
    """``(VALUES (0, '...'), ...)`` body for a DuckDB ``raw(line_id, value)`` CTE."""
    rows = ", ".join(
        f"({line_id}, '" + value.replace("'", "''") + "')" for line_id, value in LOG_LINES
    )
    return f"(VALUES {rows})"
