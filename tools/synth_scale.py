"""Synthesize a larger scale factor from the driver's sf0.1 tables.

The driver provides sf0.001/0.01/0.1; at sf0.1 most headline queries
are still fixed-overhead-bound, so the scaling curves say little about
the data-linear regime. This tool manufactures a ~FACTOR× dataset in
/tmp by unioning key-shifted replicas of sf0.1:

* join keys (custkey/orderkey/partkey/suppkey, user_id/event_id,
  doc_id/vec_id) shift by replica × (max+1) consistently across tables,
  so every join has exactly the same per-key cardinality as the source
  — the data grows, the join semantics don't;
* region/nation stay fixed (they are fixed-size dims at any SF);
* document text is word-salted per replica (every word suffixed _r<k>)
  so replicas share NO shingles — otherwise every doc would acquire
  9 artificial near-duplicates and the dedup operators would measure a
  pathological pair explosion instead of scaling;
* embeddings get a small deterministic per-replica offset so replicas
  are not exact duplicate vectors.

Timestamps are left as-is: time-windowed queries keep their window
sizes and date-filter selectivities, with FACTOR× rows per window —
which is what data growth looks like to them.

Usage:
    python tools/synth_scale.py [--factor 10] [--src /root/testdata/sf0.1]
                                [--out /tmp/synth_sf1]
Then:
    SCALE_SFS="/root/testdata/sf0.01,/root/testdata/sf0.1,/tmp/synth_sf1" \
        python tools/scaling_curve.py <queries...>
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from k8s_log_etl_spark.session import get_spark

# table -> columns to shift by replica * (max(col over the table that
# OWNS the key) + 1); the owner is listed first wherever a key appears
# in several tables so every table shifts by the same stride.
KEY_OWNERS = {
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}

COPY_AS_IS = ["region", "nation"]
SCALED = ["customer", "supplier", "part", "orders", "lineitem", "events",
          "documents", "embeddings"]


def _strides(spark: SparkSession, src: str) -> dict[str, int]:
    strides: dict[str, int] = {}
    for col, (table, owner_col) in KEY_OWNERS.items():
        if owner_col not in strides:
            mx = (
                spark.read.parquet(os.path.join(src, f"{table}.parquet"))
                .agg(F.max(owner_col))
                .collect()[0][0]
            )
            strides[owner_col] = int(mx) + 1
        strides[col] = strides[KEY_OWNERS[col][1]]
    return strides


def _replica(df: DataFrame, table: str, k: int, strides: dict[str, int]) -> DataFrame:
    out = df
    for col in df.columns:
        if col in KEY_OWNERS:
            out = out.withColumn(col, F.col(col) + F.lit(k * strides[col]))
    if table == "documents" and k > 0:
        out = out.withColumn(
            "text", F.regexp_replace("text", r"(\S+)", f"$1_r{k}")
        ).withColumn("n_chars", F.length("text"))
    if table == "embeddings" and k > 0:
        out = out.withColumn(
            "embedding",
            F.transform("embedding", lambda x: x + F.lit(k * 1e-3).cast("float")),
        )
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/synth_sf1")
    args = ap.parse_args()

    spark = get_spark(app_name="synth-scale")
    os.makedirs(args.out, exist_ok=True)
    strides = _strides(spark, args.src)

    for t in COPY_AS_IS:
        df = spark.read.parquet(os.path.join(args.src, f"{t}.parquet"))
        df.write.mode("overwrite").parquet(os.path.join(args.out, f"{t}.parquet"))
        print(f"{t}: copied {df.count()} rows")

    for t in SCALED:
        src_df = spark.read.parquet(os.path.join(args.src, f"{t}.parquet"))
        parts = [_replica(src_df, t, k, strides) for k in range(args.factor)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # spread the write so downstream scans start parallel
        out.repartition(32).write.mode("overwrite").parquet(
            os.path.join(args.out, f"{t}.parquet")
        )
        n = spark.read.parquet(os.path.join(args.out, f"{t}.parquet")).count()
        print(f"{t}: {n} rows ({args.factor}x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
