"""Drive the driver contract end-to-end like the round harness does:
1. smoke: entry(spark) at sf0.001, collect rows
2. correctness: every queries() entry vs oracle_sql() via DuckDB at
   sf0.01 (row count, column names, order-insensitive canonicalized
   value multiset — same normalization as tests/test_oracle_parity.py).
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as E
from k8s_log_etl_spark.session import get_spark
from k8s_log_etl_spark.tables import TABLE_NAMES

SF = "/root/testdata/sf0.01"


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


def _multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon(r[i]) for i in order) for r in rows)


def main() -> int:
    spark = get_spark(app_name="verify-drive", master="local[8]", shuffle_partitions=8)

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
        sdf = fn(spark, SF)
        s_cols = [c.lower() for c in sdf.columns]
        s_rows = [[row[c] for c in sdf.columns] for row in sdf.collect()]
        if name not in oracles:
            print(f"  {name}: rows-only, {len(s_rows)} rows")
            continue
        cur = con.execute(oracles[name])
        d_cols = [d[0].lower() for d in cur.description]
        d_rows = cur.fetchall()
        ok_cols = sorted(s_cols) == sorted(d_cols)
        ok_cnt = len(s_rows) == len(d_rows)
        ok_vals = ok_cols and _multiset(s_rows, s_cols) == _multiset(d_rows, d_cols)
        status = "OK" if (ok_cols and ok_cnt and ok_vals) else "MISMATCH"
        if status != "OK":
            fails.append(name)
        print(
            f"  {name}: {status} spark={len(s_rows)} oracle={len(d_rows)} "
            f"cols_ok={ok_cols} vals_ok={ok_vals}"
        )

    print("FAILURES:", fails if fails else "none")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
