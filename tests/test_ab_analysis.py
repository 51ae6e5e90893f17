"""events_ab_test_analysis on a manufactured experiment where arms
actually differ: z-statistic against a direct Python two-proportion
computation, deterministic arm assignment, exact cents."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from k8s_log_etl_spark.queries.streaming_batch import events_ab_test_analysis


def _md5_long(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _build_events():
    rows = []
    eid = 0
    for uid in range(40):
        rows.append((eid, pd.Timestamp("2024-01-02"), uid, "view", 0.0, "{}"))
        eid += 1
        # conversion depends on the ARM so the two proportions differ:
        # arm 0 converts on uid % 3 == 0, arm 1 on uid % 2 == 0
        arm = _md5_long(str(uid)) % 2
        converts = (uid % 3 == 0) if arm == 0 else (uid % 2 == 0)
        if converts:
            rows.append(
                (eid, pd.Timestamp("2024-01-03"), uid, "purchase", 10.00, "{}")
            )
            eid += 1
    return pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )


EVENTS = _build_events()


@pytest.fixture(scope="module")
def ab_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ab_events")
    EVENTS.to_parquet(d / "events.parquet", index=False)
    return str(d)


def test_z_statistic_matches_python(spark, ab_sf_dir):
    got = {r["arm"]: r for r in events_ab_test_analysis(spark, ab_sf_dir).collect()}
    assert set(got) == {0, 1}

    # python model
    arms = {0: [0, 0], 1: [0, 0]}  # [users, converted]
    for uid in range(40):
        arm = _md5_long(str(uid)) % 2
        arms[arm][0] += 1
        converts = (uid % 3 == 0) if arm == 0 else (uid % 2 == 0)
        arms[arm][1] += int(converts)
    n = arms[0][0] + arms[1][0]
    c = arms[0][1] + arms[1][1]
    p_pool = c / n
    assert 0 < p_pool < 1  # the non-degenerate branch is exercised
    for arm, (nu, nc) in arms.items():
        r = got[arm]
        assert (r["n_users"], r["n_converted"]) == (nu, nc)
        assert r["conversion_ppm"] == nc * 1_000_000 // nu
        assert r["revenue_cents"] == nc * 1000
        want_z = (nc / nu - p_pool) / math.sqrt(p_pool * (1 - p_pool) / nu)
        assert r["z_vs_pooled"] == pytest.approx(want_z, abs=1e-4)
    # opposite signs: one arm above the pooled rate, the other below
    assert got[0]["z_vs_pooled"] * got[1]["z_vs_pooled"] < 0
