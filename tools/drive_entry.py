"""Drive the driver contract end-to-end like the round harness does:
1. smoke: entry(spark) at sf0.001, collect rows
2. correctness: every queries() entry vs oracle_sql() via DuckDB at sf0.01
"""
import sys, hashlib
sys.path.insert(0, "/root/repo")
import duckdb
import __spark_entry__ as E
from k8s_log_etl_spark.session import get_spark

spark = get_spark(app_name="verify-drive", master="local[8]", shuffle_partitions=8)

# 1. smoke
df = E.entry(spark)
rows = df.collect()
print(f"SMOKE entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")
assert len(rows) >= 0

# 2. correctness at sf0.01
SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

qs = E.queries()
oracles = E.oracle_sql()
print(f"{len(qs)} queries, {len(oracles)} oracles")

def norm_hash(rows, cols):
    cols_sorted = sorted(cols)
    lines = sorted(",".join(repr(r[c]) for c in cols_sorted) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()

fails = []
for name, fn in sorted(qs.items()):
    sdf = fn(spark, SF)
    srows = [r.asDict() for r in sdf.collect()]
    if name not in oracles:
        print(f"  {name}: rows-only, {len(srows)} rows")
        continue
    orows = con.execute(oracles[name]).fetchdf().to_dict("records")
    scols = sorted(sdf.columns)
    ocols = sorted(con.execute(oracles[name]).fetchdf().columns)
    ok_cnt = len(srows) == len(orows)
    ok_cols = scols == ocols
    # value compare via string repr (approximate the driver's hash)
    sh = norm_hash(srows, sdf.columns)
    oh = norm_hash(orows, ocols) if ok_cols else None
    status = "OK" if (ok_cnt and ok_cols and sh == oh) else "MISMATCH"
    if status != "OK":
        fails.append(name)
    print(f"  {name}: {status} spark={len(srows)} oracle={len(orows)} cols_ok={ok_cols} hash={'=' if sh==oh else '!'}")

print("FAILURES:", fails if fails else "none")
spark.stop()
sys.exit(1 if fails else 0)
