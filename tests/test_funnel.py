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
