"""DuckDB oracle SQL mirroring operators/lognorm.py.

Builds ANSI-ish SQL (DuckDB dialect) that recomputes the normalize /
filter / redact / report pipeline over the same raw JSONL lines, so the
driver can hash-compare Spark vs DuckDB results. The raw source is a
pluggable SQL fragment producing ``(line_id BIGINT, value VARCHAR)`` —
either the in-repo fixture VALUES list or JSON lines synthesized from the
``events`` table (see queries/log_queries.py).

Engine-equivalence notes (verified empirically):
  * Spark ``schema_of_variant(...) == 'STRING'`` ⇔ DuckDB
    ``json_type(j, path) = 'VARCHAR'``;
  * Spark ``from_json(value,'map<string,string>')[k]`` ⇔ DuckDB
    ``json_extract_string(j, k)`` — both unquote strings and compact
    nested objects/arrays;
  * Spark ``unix_micros(try_to_timestamp(s))`` with a UTC session ⇔
    DuckDB ``epoch_us(TRY_CAST(s AS TIMESTAMPTZ))`` (UTC default).
"""

from __future__ import annotations

from k8s_log_etl_spark.config import PipelineConfig
from k8s_log_etl_spark.operators.lognorm import (
    ERR_MISSING_LEVEL,
    ERR_MISSING_MSG,
    ERR_MISSING_TS,
    EXCLUDED_KEYS,
    GO_SPACE_CLASS,
    RFC3339_RE,
)


def _gotrim(expr: str) -> str:
    """strings.TrimSpace parity — plain SQL trim() strips only ASCII
    space, but Go trims the full Unicode White_Space set (the literal
    char class is shared with the Spark side)."""
    return (
        f"regexp_replace({expr}, "
        f"'^{GO_SPACE_CLASS}+|{GO_SPACE_CLASS}+$', '', 'g')"
    )


def _sql_str_list(values: tuple[str, ...]) -> str:
    return ", ".join("'" + v.replace("'", "''") + "'" for v in values)


def _sget(path: str) -> str:
    """String-typed JSON extraction (Go `v.(string)` type assertion)."""
    return f"CASE WHEN json_type(j, '{path}') = 'VARCHAR' THEN j ->> '{path}' END"


def _trimmed_chain(*paths: str) -> str:
    parts = ", ".join(f"nullif({_gotrim(_sget(p))}, '')" for p in paths)
    return f"coalesce({parts}, '')"


def norm_cte(raw_sql: str, cfg: PipelineConfig | None = None) -> str:
    """WITH-chain ending in CTE ``norm`` (one row per parsed JSON object,
    canonical columns + norm_error + drop_reason) and ``nonblank`` /
    ``parsed`` for line-level accounting."""
    cfg = cfg or PipelineConfig()
    levels = cfg.levels_upper
    services = cfg.services_lower

    keep_level = "TRUE" if not levels else f"upper(level) IN ({_sql_str_list(levels)})"
    keep_service = "TRUE" if not services else f"lower(service) IN ({_sql_str_list(services)})"

    # Regexp: DuckDB uses RE2; the Spark pattern is RE2-compatible.
    ts_re = RFC3339_RE
    trimv = _gotrim("value")
    trimnode = _gotrim("j ->> '$.node'")

    return f"""
WITH raw(line_id, value) AS ({raw_sql}),
nonblank AS (
  SELECT line_id, value FROM raw WHERE {trimv} <> ''
),
parsed AS (
  SELECT line_id, value, TRY_CAST(value AS JSON) AS j,
         (TRY_CAST(value AS JSON) IS NOT NULL
          AND json_type(TRY_CAST(value AS JSON)) = 'OBJECT') AS json_ok
  FROM nonblank
),
norm0 AS (
  SELECT line_id, value, j,
    {_trimmed_chain("$.ts", "$.time")} AS ts_str,
    {_trimmed_chain("$.level", "$.severity")} AS level_raw,
    {_trimmed_chain("$.msg", "$.message")} AS message,
    {_trimmed_chain("$.service", "$.app", "$.component")} AS service,
    coalesce(CASE WHEN json_type(j, '$.namespace') = 'VARCHAR' THEN j ->> '$.namespace'
                  ELSE {_sget("$.kubernetes.namespace_name")} END, '') AS namespace,
    coalesce(CASE WHEN json_type(j, '$.pod') = 'VARCHAR' THEN j ->> '$.pod'
                  ELSE {_sget("$.kubernetes.pod_name")} END, '') AS pod,
    coalesce(
      nullif(CASE WHEN json_type(j, '$.node') = 'VARCHAR' THEN {trimnode}
                  ELSE {_sget("$.kubernetes.node_name")} END, ''),
      nullif({_gotrim(_sget('$.hostname'))}, ''),
      '') AS node,
    {_trimmed_chain("$.trace_id", "$.trace")} AS trace_id
  FROM parsed WHERE json_ok
),
norm1 AS (
  SELECT *,
    CASE WHEN regexp_matches(ts_str, '{ts_re}')
         THEN epoch_us(TRY_CAST(ts_str AS TIMESTAMPTZ)) END AS ts_us,
    upper(level_raw) AS level
  FROM norm0
),
norm AS (
  SELECT *,
    CASE WHEN ts_str = '' THEN '{ERR_MISSING_TS}'
         WHEN ts_us IS NULL THEN 'invalid timestamp "' || ts_str || '": expected RFC3339'
         WHEN message = '' THEN '{ERR_MISSING_MSG}'
         WHEN level_raw = '' THEN '{ERR_MISSING_LEVEL}'
    END AS norm_error,
    CASE WHEN ts_str <> '' AND ts_us IS NOT NULL AND message <> '' AND level_raw <> ''
         THEN CASE WHEN NOT ({keep_level}) THEN 'level'
                   WHEN NOT ({keep_service}) THEN 'service' END
    END AS drop_reason
  FROM norm1
)"""


def fields_sql(raw_sql: str, cfg: PipelineConfig | None = None, redacted: bool = False) -> str:
    """Exploded residual-fields map for normalize-OK records; with
    ``redacted`` the written records' post-redaction view."""
    cfg = cfg or PipelineConfig()
    excl = _sql_str_list(EXCLUDED_KEYS)
    where = "n.norm_error IS NULL"
    if redacted:
        where += " AND n.drop_reason IS NULL"
        if cfg.redact_keys:
            excl += ", " + _sql_str_list(cfg.redact_keys)
    return f"""{norm_cte(raw_sql, cfg)}
SELECT n.line_id, t.k AS key, json_extract_string(n.j, t.k) AS val
FROM norm n, unnest(json_keys(n.j)) AS t(k)
WHERE {where} AND t.k NOT IN ({excl})
"""


def normalize_sql(raw_sql: str, cfg: PipelineConfig | None = None) -> str:
    return f"""{norm_cte(raw_sql, cfg)}
SELECT line_id, ts_us, level, service, namespace, pod, node, message, trace_id
FROM norm WHERE norm_error IS NULL
"""


def errors_sql(raw_sql: str, cfg: PipelineConfig | None = None) -> str:
    return f"""{norm_cte(raw_sql, cfg)}
SELECT line_id, norm_error AS reason FROM norm WHERE norm_error IS NOT NULL
"""


def scan_sql(raw_sql: str) -> str:
    trimv = _gotrim("value")
    return f"""
WITH raw(line_id, value) AS ({raw_sql})
SELECT line_id, length(value) AS n_bytes FROM raw WHERE {trimv} <> ''
"""


def parse_sql(raw_sql: str, cfg: PipelineConfig | None = None) -> str:
    return f"""{norm_cte(raw_sql, cfg)}
SELECT line_id, json_ok FROM parsed
"""


def written_sql(raw_sql: str, cfg: PipelineConfig | None = None) -> str:
    return f"""{norm_cte(raw_sql, cfg)}
SELECT line_id, ts_us, level, service, namespace, pod, node, message, trace_id
FROM norm WHERE norm_error IS NULL AND drop_reason IS NULL
"""


def filter_sql(raw_sql: str, reason: str, cfg: PipelineConfig | None = None) -> str:
    """line_ids surviving the level (or level+service) filter stage."""
    cond = "drop_reason IS NULL" if reason == "all" else f"(drop_reason IS NULL OR drop_reason <> '{reason}')"
    return f"""{norm_cte(raw_sql, cfg)}
SELECT line_id FROM norm WHERE norm_error IS NULL AND {cond}
"""


def agg_by_level_sql(raw_sql: str, cfg: PipelineConfig | None = None) -> str:
    return f"""{norm_cte(raw_sql, cfg)}
SELECT level, count(*) AS cnt FROM norm WHERE norm_error IS NULL GROUP BY level
"""


def agg_by_service_sql(raw_sql: str, cfg: PipelineConfig | None = None) -> str:
    return f"""{norm_cte(raw_sql, cfg)}
SELECT service, count(*) AS cnt FROM norm
WHERE norm_error IS NULL AND service <> '' GROUP BY service
"""


def agg_filter_reason_sql(raw_sql: str, cfg: PipelineConfig | None = None) -> str:
    return f"""{norm_cte(raw_sql, cfg)}
SELECT drop_reason AS reason, count(*) AS cnt FROM norm
WHERE norm_error IS NULL AND drop_reason IS NOT NULL GROUP BY drop_reason
"""


def report_summary_sql(raw_sql: str, cfg: PipelineConfig | None = None) -> str:
    return f"""{norm_cte(raw_sql, cfg)}
SELECT
  (SELECT count(*) FROM parsed) AS total_lines,
  (SELECT count(*) FILTER (WHERE json_ok) FROM parsed) AS json_parsed,
  (SELECT count(*) FILTER (WHERE NOT json_ok) FROM parsed) AS json_failed,
  count(*) FILTER (WHERE norm_error IS NULL) AS normalized_ok,
  count(*) FILTER (WHERE norm_error IS NOT NULL) AS normalized_failed,
  count(*) FILTER (WHERE norm_error IS NULL AND drop_reason IS NULL) AS written_ok,
  count(*) FILTER (WHERE norm_error IS NULL AND drop_reason = 'level') AS filtered_by_level,
  count(*) FILTER (WHERE norm_error IS NULL AND drop_reason = 'service') AS filtered_by_service
FROM norm
"""
