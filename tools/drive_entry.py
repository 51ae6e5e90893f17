"""Drive the driver contract end-to-end like the round harness does:
1. smoke: entry(spark) at sf0.001, collect rows
2. correctness: every queries() entry vs oracle_sql() via DuckDB at
   sf0.01 (row count, column names, order-insensitive canonicalized
   value multiset).

Canonicalization goes through pandas on BOTH sides (Spark `toPandas()`,
DuckDB `.df()`) because that is what the round driver does — round 1
proved the difference matters: Spark DECIMAL survives pandas as
Decimal('256.00') while DuckDB DECIMAL coerces to float64 256.0, and
DuckDB sum(BIGINT) returns HUGEINT → float64 vs Spark's int64. A raw
collect()+str() mimic missed all 8 of those hash mismatches. Array /
list cells raise (the driver's canonicalizer crashes on them — scalar
output columns only).
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as E
from k8s_log_etl_spark.session import get_spark
from k8s_log_etl_spark.tables import TABLE_NAMES

SF = os.environ.get("DRIVE_SF_DIR", "/root/testdata/sf0.01")


def _canon_cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, (list, tuple, dict, np.ndarray)):
        raise TypeError(f"unhashable type: {type(v).__name__} (driver canon crashes on array cells)")
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
        "|".join(_canon_cell(v) for v in row) for row in pdf.itertuples(index=False, name=None)
    )


def main() -> int:
    only = set(sys.argv[1:])
    # DRIVE_CPUS lets a robustness pass re-run the whole sweep under a
    # different parallelism — catches partition-order-dependent float
    # aggregation that a single fixed layout would hide.
    cpus = int(os.environ.get("DRIVE_CPUS", "8"))
    spark = get_spark(
        app_name="verify-drive", master=f"local[{cpus}]", shuffle_partitions=cpus
    )

    df = E.entry(spark)
    rows = df.collect()
    print(f"SMOKE entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    qs = E.queries()
    oracles = E.oracle_sql()
    print(f"{len(qs)} queries, {len(oracles)} oracles")

    fails = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            s_pdf = fn(spark, SF).toPandas()
            s_pdf.columns = [c.lower() for c in s_pdf.columns]
            if name not in oracles:
                # still exercise the canon so array cells are caught
                _multiset(s_pdf)
                print(f"  {name}: rows-only, {len(s_pdf)} rows")
                continue
            d_pdf = con.execute(oracles[name]).df()
            d_pdf.columns = [c.lower() for c in d_pdf.columns]
            ok_cols = sorted(s_pdf.columns) == sorted(d_pdf.columns)
            ok_cnt = len(s_pdf) == len(d_pdf)
            ok_vals = ok_cols and _multiset(s_pdf) == _multiset(d_pdf)
        except Exception as exc:  # mimic the driver's per-query err slot
            fails.append(name)
            print(f"  {name}: ERR {type(exc).__name__}: {exc}")
            continue
        status = "OK" if (ok_cols and ok_cnt and ok_vals) else "MISMATCH"
        if status != "OK":
            fails.append(name)
            if ok_cols and not ok_vals:
                sm, dm = _multiset(s_pdf), _multiset(d_pdf)
                diff = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
                for a, b in diff:
                    print(f"    spark : {a}\n    oracle: {b}")
        print(
            f"  {name}: {status} spark={len(s_pdf)} oracle={len(d_pdf)} "
            f"cols_ok={ok_cols} vals_ok={ok_vals}"
        )

    print("FAILURES:", fails if fails else "none")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
