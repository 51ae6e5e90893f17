"""Local mimic of the driver's correctness gate.

Runs every registered query through Spark AND its DuckDB oracle on the
same inputs, then compares row count, column names, and an
order-insensitive stringified-value multiset. Catching a mismatch here is
strictly cheaper than catching it in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from k8s_log_etl_spark.plans.registry import load_all
from k8s_log_etl_spark.tables import TABLE_NAMES

SPECS = {name: spec for name, spec in load_all().items() if spec.oracle}


def _duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon(value):
    if value is None:
        return "<null>"
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return repr(round(value, 9))
    return str(value)


def _rows_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted("|".join(_canon(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, sf_dir, name):
    spec = SPECS[name]
    sdf = spec.fn(spark, sf_dir)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = sdf.collect()

    con = _duck_con(sf_dir)
    cur = con.execute(spec.oracle)
    d_cols = [d[0].lower() for d in cur.description]
    d_rows = cur.fetchall()
    con.close()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"

    s_set = _rows_multiset([[r[c] for c in sdf.columns] for r in s_rows], s_cols)
    d_set = _rows_multiset(d_rows, d_cols)
    mismatches = [(a, b) for a, b in zip(s_set, d_set) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:5]}"
