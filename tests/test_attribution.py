"""events_attribution_last_touch semantics against a hand-written
sequence: the LAST prior touch wins, stale touches (outside 24 h) and
touchless purchases fall to 'unattributed', and purchases never look
forward."""

from __future__ import annotations

import pandas as pd
import pytest

from k8s_log_etl_spark.queries.streaming_batch import (
    events_attribution_last_touch,
)

T0 = pd.Timestamp("2024-01-01 00:00:00")
H = pd.Timedelta(hours=1)

EVENTS = pd.DataFrame(
    [
        # user 1: view then click then purchase -> credit the CLICK
        (1, T0, 1, "view", 0.0, "{}"),
        (2, T0 + H, 1, "click", 0.0, "{}"),
        (3, T0 + 2 * H, 1, "purchase", 10.00, "{}"),
        # user 2: touch 30 h before purchase -> stale, unattributed
        (4, T0, 2, "view", 0.0, "{}"),
        (5, T0 + 30 * H, 2, "purchase", 5.50, "{}"),
        # user 3: purchase first (no prior touch), view after
        (6, T0, 3, "purchase", 2.25, "{}"),
        (7, T0 + H, 3, "view", 0.0, "{}"),
        # user 4: two purchases share one touch -> both credit the view
        (8, T0, 4, "view", 0.0, "{}"),
        (9, T0 + H, 4, "purchase", 1.00, "{}"),
        (10, T0 + 2 * H, 4, "purchase", 3.00, "{}"),
    ],
    columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
)


@pytest.fixture(scope="module")
def attr_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("attr_events")
    EVENTS.to_parquet(d / "events.parquet", index=False)
    return str(d)


def test_last_touch_semantics(spark, attr_sf_dir):
    got = {
        r["channel"]: (r["n_purchases"], r["revenue_cents"])
        for r in events_attribution_last_touch(spark, attr_sf_dir).collect()
    }
    assert got == {
        "click": (1, 1000),          # user 1: last touch, not the view
        "view": (2, 400),            # user 4: one touch credits both
        "unattributed": (2, 775),    # stale (user 2) + touchless (user 3)
    }
