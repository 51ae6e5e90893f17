"""snapshot_diff (CDC-style) and scd2_apply (type-2 history fold):
added/removed/changed classification, history invariants across two
folds, and point-in-time reads."""

from __future__ import annotations

from pyspark.sql import functions as F

from k8s_log_etl_spark.operators import snapshots as S


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, name string, city string")


def test_snapshot_diff_classifies(spark):
    old = _df(spark, [(1, "ann", "rome"), (2, "bob", "oslo"), (3, "cy", "lima")])
    new = _df(spark, [(1, "ann", "rome"), (2, "bob", "cairo"), (4, "dee", "kiev")])
    got = {
        (r["id"], r["change_type"])
        for r in S.snapshot_diff(old, new, ["id"]).collect()
    }
    assert got == {(2, "changed"), (3, "removed"), (4, "added")}


def test_snapshot_diff_null_attr_not_confused_with_empty(spark):
    old = _df(spark, [(1, None, "rome")])
    new = _df(spark, [(1, "", "rome")])
    got = [tuple(r) for r in S.snapshot_diff(old, new, ["id"]).collect()]
    assert got == [(1, "changed")]


def test_snapshot_diff_null_attr_not_confused_with_nul_byte(spark):
    """Round-3 ADVICE: a sentinel-string fingerprint made NULL and a
    literal '\\x00' value hash identically, silently classifying a
    NULL<->'\\x00' change as unchanged. The explicit per-column is-null
    flag must see it as 'changed'."""
    old = _df(spark, [(1, None, "rome")])
    new = _df(spark, [(1, "\x00", "rome")])
    got = [tuple(r) for r in S.snapshot_diff(old, new, ["id"]).collect()]
    assert got == [(1, "changed")]
    # and the reverse direction, plus a genuinely unchanged NULL
    old2 = _df(spark, [(1, "\x00", "rome"), (2, None, "oslo")])
    new2 = _df(spark, [(1, None, "rome"), (2, None, "oslo")])
    got2 = [tuple(r) for r in S.snapshot_diff(old2, new2, ["id"]).collect()]
    assert got2 == [(1, "changed")]


def test_scd2_two_folds_and_point_in_time(spark):
    t0, t1, t2 = "2024-01-01 00:00:00", "2024-02-01 00:00:00", "2024-03-01 00:00:00"
    hist = S.scd2_init(
        _df(spark, [(1, "ann", "rome"), (2, "bob", "oslo")]), t0
    )
    # fold 1: bob moves, cy appears
    hist = S.scd2_apply(
        hist,
        _df(spark, [(1, "ann", "rome"), (2, "bob", "cairo"), (3, "cy", "lima")]),
        ["id"],
        t1,
    )
    # fold 2: ann vanishes
    hist = S.scd2_apply(
        hist, _df(spark, [(2, "bob", "cairo"), (3, "cy", "lima")]), ["id"], t2
    )
    rows = {
        (r["id"], r["city"], str(r["valid_from"]), str(r["valid_to"]))
        for r in hist.collect()
    }
    assert rows == {
        (1, "rome", t0, t2),                 # ann closed at t2, no successor
        (2, "oslo", t0, t1),                 # bob's first version closed at t1
        (2, "cairo", t1, "9999-12-31 00:00:00"),
        (3, "lima", t1, "9999-12-31 00:00:00"),
    }

    # exactly one current row per live key
    current = hist.filter(F.col("valid_to") == F.lit("9999-12-31 00:00:00").cast("timestamp"))
    assert current.groupBy("id").count().filter("count > 1").count() == 0

    # point-in-time read at t1+epsilon reconstructs that day's snapshot
    asof = hist.filter(
        (F.col("valid_from") <= F.lit(t1).cast("timestamp"))
        & (F.col("valid_to") > F.lit(t1).cast("timestamp"))
    )
    assert {(r["id"], r["city"]) for r in asof.collect()} == {
        (1, "rome"), (2, "cairo"), (3, "lima")
    }


def test_snapshot_diff_added_column(spark):
    """Schema evolution between drops (round-4 verdict #6): a column
    ADDED in the new snapshot null-aligns against the old one — NULL
    values in it leave rows unchanged, a non-NULL value alone flags
    'changed'."""
    old = _df(spark, [(1, "ann", "rome"), (2, "bob", "oslo")])
    new = spark.createDataFrame(
        [(1, "ann", "rome", None), (2, "bob", "oslo", 9)],
        "id long, name string, city string, score int",
    )
    got = {
        (r["id"], r["change_type"])
        for r in S.snapshot_diff(old, new, ["id"]).collect()
    }
    assert got == {(2, "changed")}


def test_snapshot_diff_dropped_column(spark):
    """A column DROPPED in the new snapshot: rows where it was NULL are
    unchanged; rows where it carried a value are changed (value -> the
    implicit NULL)."""
    old = spark.createDataFrame(
        [(1, "ann", None), (2, "bob", "x")], "id long, name string, tag string"
    )
    new = spark.createDataFrame([(1, "ann"), (2, "bob")], "id long, name string")
    got = {
        (r["id"], r["change_type"])
        for r in S.snapshot_diff(old, new, ["id"]).collect()
    }
    assert got == {(2, "changed")}


def test_scd2_fold_across_added_column(spark):
    """scd2_apply with a snapshot whose schema gained a column since
    the history opened: the history accretes the schema union
    (pre-evolution rows carry NULL), unchanged-with-NULL keys stay
    open from T0, and a value in the new column closes/reopens."""
    t0, t1 = "2024-01-01 00:00:00", "2024-02-01 00:00:00"
    hist = S.scd2_init(_df(spark, [(1, "ann", "rome"), (2, "bob", "oslo")]), t0)
    hist = S.scd2_apply(
        hist,
        spark.createDataFrame(
            [(1, "ann", "rome", None), (2, "bob", "oslo", 7)],
            "id long, name string, city string, score int",
        ),
        ["id"],
        t1,
    )
    rows = {
        (r["id"], r["score"], str(r["valid_from"]), str(r["valid_to"]))
        for r in hist.collect()
    }
    assert rows == {
        (1, None, t0, "9999-12-31 00:00:00"),  # untouched, schema-united
        (2, None, t0, t1),                      # closed by the new value
        (2, 7, t1, "9999-12-31 00:00:00"),
    }
