"""operators.merge.merge_upsert semantics: all four actions, the
unmatched-delete no-op, and the one-join plan contract."""

from __future__ import annotations

from k8s_log_etl_spark.operators.merge import merge_upsert


def _frames(spark):
    target = spark.createDataFrame(
        [(1, "alpha", 10), (2, "beta", 20), (3, "gamma", 30)],
        "k long, v string, n long",
    )
    changes = spark.createDataFrame(
        [
            (2, "beta2", 21, False),   # matched upsert -> updated
            (3, None, None, True),     # matched delete -> deleted
            (4, "delta", 40, False),   # unmatched upsert -> inserted
            (5, None, None, True),     # unmatched delete -> no-op
        ],
        "k long, v string, n long, is_delete boolean",
    )
    return target, changes


def test_merge_actions(spark):
    target, changes = _frames(spark)
    rows = {
        r["k"]: (r["action"], r["v"], r["n"])
        for r in merge_upsert(target, changes, ["k"]).collect()
    }
    assert rows == {
        1: ("kept", "alpha", 10),
        2: ("updated", "beta2", 21),
        3: ("deleted", None, None),   # audited, values nulled
        4: ("inserted", "delta", 40),
        # 5 absent: unmatched delete is a MERGE no-op
    }


def test_next_version_filter(spark):
    target, changes = _frames(spark)
    nxt = merge_upsert(target, changes, ["k"]).filter("action != 'deleted'")
    assert sorted(r["k"] for r in nxt.collect()) == [1, 2, 4]


def test_merge_is_one_join(spark):
    target, changes = _frames(spark)
    plan = (
        merge_upsert(target, changes, ["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Join") == 1
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_null_delete_marker_is_not_a_delete(spark):
    """Round-6 ADVICE regression: a NULL is_delete must be treated as
    FALSE (the oracle's COALESCE semantics). Before the guard, an
    unmatched change row with NULL is_delete made every action branch
    NULL (in_s & ~NULL is NULL) and the row was silently DROPPED."""
    target = spark.createDataFrame([(1, "alpha", 10)], "k long, v string, n long")
    changes = spark.createDataFrame(
        [
            (1, "alpha2", 11, None),  # matched, NULL marker -> updated
            (9, "nine", 90, None),    # unmatched, NULL marker -> inserted
        ],
        "k long, v string, n long, is_delete boolean",
    )
    rows = {
        r["k"]: (r["action"], r["v"], r["n"])
        for r in merge_upsert(target, changes, ["k"]).collect()
    }
    assert rows == {
        1: ("updated", "alpha2", 11),
        9: ("inserted", "nine", 90),
    }
