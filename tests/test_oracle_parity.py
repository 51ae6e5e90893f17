"""Local mimic of the driver's correctness gate.

Runs every registered query through Spark AND its DuckDB oracle on the
same inputs, then compares row count, column names, and an
order-insensitive stringified-value multiset. Catching a mismatch here is
strictly cheaper than catching it in CORRECTNESS_r{N}.json.

Round-4 hardening: the comparison goes through PANDAS frames with
exactly tools/drive_entry.py's canonicalizer — the driver renders both
sides via pandas, where DuckDB's HUGEINT (e.g. any windowed sum of
integers) coerces to float64 and prints '5.0' against Spark's '5'. The
earlier fetchall()-based compare silently passed that class of
divergence (events_sessionize's session_seq slipped through CI and was
caught only by the drive_entry sweep).
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
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


def _canon_cell(v):
    # keep bit-for-bit in sync with tools/drive_entry.py::_canon_cell
    if v is None:
        return "<null>"
    if isinstance(v, (list, tuple, dict, np.ndarray)):
        raise TypeError(
            f"unhashable type: {type(v).__name__} (driver canon crashes on array cells)"
        )
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "<null>"
        return repr(round(f, 9))
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if v is pd.NaT:
        return "<null>"
    return str(v)


def _multiset(pdf: pd.DataFrame) -> list[str]:
    pdf = pdf[sorted(pdf.columns)]
    return sorted(
        "|".join(_canon_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )


@pytest.fixture(scope="session")
def spark_results(spark, sf_dir, request):
    """Spark-side results for every parametrized parity test in this
    run, computed CONCURRENTLY once (round-14, guide §2.6): the serial
    loop's wall-clock was ~237 × per-query driver latency — the
    overlap-independent-jobs case exactly. Per-query comparison,
    assertions, and failure attribution stay in the individual tests
    (an execution error is re-raised inside that query's own test).
    Only the names actually collected this run are computed, so
    `-k one_query` stays cheap."""
    from conftest import run_surface

    names = sorted(
        {
            item.callspec.params["name"]
            for item in request.session.items
            if getattr(item, "callspec", None) is not None
            and "name" in item.callspec.params
            and item.function.__name__ == "test_query_matches_oracle"
        }
    )

    def one(n):
        pdf = SPECS[n].fn(spark, sf_dir).toPandas()
        pdf.columns = [c.lower() for c in pdf.columns]
        return pdf

    return run_surface(names, one)


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, sf_dir, name, spark_results):
    spec = SPECS[name]
    ok, val = spark_results[name]
    if not ok:
        raise val  # this query's Spark execution failed — attribute here
    s_pdf = val

    con = _duck_con(sf_dir)
    d_pdf = con.execute(spec.oracle).df()
    con.close()
    d_pdf.columns = [c.lower() for c in d_pdf.columns]

    assert sorted(s_pdf.columns) == sorted(d_pdf.columns), (
        f"{name}: column mismatch {list(s_pdf.columns)} vs {list(d_pdf.columns)}"
    )
    assert len(s_pdf) == len(d_pdf), f"{name}: row count {len(s_pdf)} vs {len(d_pdf)}"

    s_set, d_set = _multiset(s_pdf), _multiset(d_pdf)
    mismatches = [(a, b) for a, b in zip(s_set, d_set) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:5]}"
