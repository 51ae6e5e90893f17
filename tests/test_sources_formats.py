"""Input-format robustness of the source layer: the JSONL reader must
accept gzip-compressed input transparently (Spark's text source handles
.gz via its codec chain — no code change, but the contract deserves a
test because compressed files are NOT splittable and a 100 TB drop of
.gz files caps per-file parallelism at 1), and the same log pipeline
must run off a CSV drop with corrupt-record accounting equivalent to
the JSONL path's parse-error accounting.
"""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from k8s_log_etl_spark.config import PipelineConfig
from k8s_log_etl_spark.operators import lognorm
from k8s_log_etl_spark.sources.jsonl import read_jsonl

LINES = [
    '{"ts":"2024-01-01T00:00:01Z","level":"warn","msg":"disk low","service":"api"}',
    '{"ts":"2024-01-01T00:00:02Z","level":"error","msg":"oom","service":"api"}',
    "",
    '{"ts":"2024-01-01T00:00:03Z","level":"info","msg":"ok","service":"web"}',
]


def test_jsonl_reader_handles_gzip(spark, tmp_path):
    plain = tmp_path / "logs.jsonl"
    plain.write_text("\n".join(LINES) + "\n", encoding="utf-8")
    gz = tmp_path / "logs.jsonl.gz"
    with gzip.open(gz, "wt", encoding="utf-8") as f:
        f.write("\n".join(LINES) + "\n")

    cfg = PipelineConfig()

    def run(path):
        df = lognorm.run_pipeline(read_jsonl(spark, path), cfg).drop("line_id")
        # compare only plain string/bool columns: variant cells
        # (VariantVal) don't define value equality
        scalar = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName() in ("string", "boolean")
        ]
        rows = df.select(*scalar).collect()
        return sorted((tuple(r) for r in rows), key=str)

    out_plain = run(str(plain))
    out_gz = run(str(gz))
    assert out_plain == out_gz and len(out_gz) > 0


def test_csv_source_with_corrupt_record_accounting(spark, tmp_path):
    """CSV drop of pre-normalized records: explicit schema, PERMISSIVE
    mode, corrupt rows routed to a _corrupt column — the same
    accounting split (ok vs parse-failed) the JSONL path gives us via
    the raw-line parse."""
    p = tmp_path / "logs.csv"
    p.write_text(
        "ts,level,service,message\n"
        "2024-01-01T00:00:01Z,WARN,api,disk low\n"
        '2024-01-01T00:00:02Z,ERROR,api,"oom, killed"\n'
        "2024-01-01T00:00:03Z,INFO\n"  # short row -> corrupt under FAILFAST-ish schema
        "2024-01-01T00:00:04Z,DEBUG,web,fine\n",
        encoding="utf-8",
    )
    df = (
        spark.read.option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .schema("ts string, level string, service string, message string, _corrupt string")
        .csv(str(p))
    )
    df = df.cache()
    ok = df.filter(F.col("_corrupt").isNull() & F.col("message").isNotNull())
    bad = df.filter(F.col("_corrupt").isNotNull() | F.col("message").isNull())
    assert ok.count() == 3
    assert bad.count() == 1
    # quoted comma survives CSV parsing
    assert ok.filter(F.col("message") == "oom, killed").count() == 1


def test_orc_roundtrip_preserves_events(spark, sf_dir, tmp_path):
    """ORC is the other columnar format Spark ships natively — a
    corpus drop in ORC must read back identically (schema + values) to
    the parquet source of truth."""
    from k8s_log_etl_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_orc")
    ev.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == ev.schema
    a = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.hash("event_id", "user_id", "event_type")).alias("h"),
    ).collect()[0]
    b = back.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.hash("event_id", "user_id", "event_type")).alias("h"),
    ).collect()[0]
    assert (a["n"], a["h"]) == (b["n"], b["h"]) and a["n"] > 0


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """A long-lived corpus gains columns across drops; mergeSchema
    reading yields the union schema with NULLs where old files lack the
    column — the standard 100 TB schema-evolution posture (per-file
    footers carry their own schema; no rewrite of history)."""
    p = str(tmp_path / "evo")
    spark.createDataFrame(
        [(1, "alpha")], "doc_id long, text string"
    ).write.parquet(p + "/drop=1")
    spark.createDataFrame(
        [(2, "beta", "en")], "doc_id long, text string, lang string"
    ).write.parquet(p + "/drop=2")

    df = spark.read.option("mergeSchema", "true").parquet(p)
    assert {"doc_id", "text", "lang", "drop"} <= set(df.columns)
    rows = {r["doc_id"]: (r["text"], r["lang"]) for r in df.collect()}
    assert rows[1] == ("alpha", None)
    assert rows[2] == ("beta", "en")
