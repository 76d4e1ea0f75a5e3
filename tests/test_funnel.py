"""Funnel / retention semantics on hand-computed fixtures."""

from __future__ import annotations

import datetime as dt

import pytest

from tantalus_spark.datapipe.funnel import funnel, retention


def _t(d, h=0):
    return dt.datetime(2024, 1, d, h)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        # u1: full ordered funnel
        (1, _t(1), "view"), (1, _t(2), "click"), (1, _t(3), "purchase"),
        # u2: clicks BEFORE viewing -> stops at view
        (2, _t(2), "click"), (2, _t(3), "view"),
        # u3: view+click only
        (3, _t(1), "view"), (3, _t(5), "click"),
        # u4: purchase without click -> stops after view
        (4, _t(1), "view"), (4, _t(2), "purchase"),
        # u5: never views
        (5, _t(1), "click"), (5, _t(2), "purchase"),
        # u1 again 2 weeks later (retention)
        (1, _t(15), "view"),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


def test_funnel_strict_order(ev):
    out = {r["step"]: r["n_users"] for r in
           funnel(ev, ["view", "click", "purchase"]).collect()}
    assert out == {"view": 4, "click": 2, "purchase": 1}


def test_funnel_single_step(ev):
    out = funnel(ev, ["purchase"]).collect()
    assert out[0]["n_users"] == 3 and out[0]["step_idx"] == 0


def test_retention_weekly(ev):
    rows = {(r["cohort"].date(), r["k"]): r["n_users"]
            for r in retention(ev, period="week").collect()}
    # all 5 users first active in the week of Jan 1 2024 (Monday)
    wk0 = dt.date(2024, 1, 1)
    assert rows[(wk0, 0)] == 5
    # only u1 returns two weeks later
    assert rows[(wk0, 2)] == 1
    assert (wk0, 1) not in rows


def test_gap_fill_daily_grid_and_locf(spark):
    import datetime as dt
    from tantalus_spark.datapipe.funnel import gap_fill_daily

    def t(d, h=12):
        return dt.datetime(2024, 3, d, h)

    rows = [
        # user 1: events on day 1 (two) and day 4 — days 2,3 are gaps
        (1, t(1, 9), 1, 10.00), (2, t(1, 15), 1, 2.50), (3, t(4), 1, 5.00),
        # user 2: single day — no gaps
        (4, t(2), 2, 7.25),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double")
    out = {(r["user_id"], str(r["day"])): r
           for r in gap_fill_daily(df).collect()}
    # complete grid: user 1 has 4 rows, user 2 has 1
    assert len([k for k in out if k[0] == 1]) == 4
    assert len([k for k in out if k[0] == 2]) == 1
    d1 = out[(1, "2024-03-01")]
    assert d1["n_events"] == 2 and d1["day_cents"] == 1250
    # gap rows: zero events, null day total, forward-filled last total
    g = out[(1, "2024-03-02")]
    assert g["n_events"] == 0 and g["day_cents"] is None
    assert g["filled_cents"] == 1250
    assert out[(1, "2024-03-03")]["filled_cents"] == 1250
    # a new observation resets the fill
    assert out[(1, "2024-03-04")]["filled_cents"] == 500
    assert out[(2, "2024-03-02")]["day_cents"] == 725
