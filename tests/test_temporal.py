"""Unit oracles for the temporal join operators (as-of join via window
carry-forward, range join via time-bin bucketing). DuckDB hash parity at
sf0.01 is additionally enforced by the driver gate (q32/q33)."""

from __future__ import annotations

import datetime as dt

import pytest

from ocr_redaction_engine_spark.analytics.temporal import (
    asof_last_event,
    range_join_count,
)


def _ts(minute, second=0, micro=0):
    return dt.datetime(2024, 1, 1, 0, minute, second, micro)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (0, _ts(0), 1, "error", 0.0, "{}"),
        (1, _ts(2), 1, "click", 1.0, "{}"),      # last error = 0
        (2, _ts(2), 1, "error", 0.0, "{}"),      # same-ts as click 1, higher id → not visible to it
        (3, _ts(9), 1, "click", 1.0, "{}"),      # last error = 2
        (4, _ts(1), 2, "click", 1.0, "{}"),      # no prior error → null
        (5, _ts(30), 2, "error", 0.0, "{}"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")


def test_asof_last_event(events):
    got = {r["event_id"]: r["last_ref_id"] for r in asof_last_event(events).collect()}
    assert got == {1: 0, 3: 2, 4: None}


def test_asof_same_ts_tiebreak(events):
    # event 2 (error) shares ts with click 1 but has a HIGHER event_id, so the
    # deterministic (ts, event_id) order makes it invisible to click 1 and
    # visible to click 3.
    got = {r["event_id"]: r["last_ref_id"] for r in asof_last_event(events).collect()}
    assert got[1] == 0 and got[3] == 2


def test_range_join_count(events):
    # 5-minute half-open window [ts-5m, ts), corpus-wide (ignores user_id):
    # ids at minutes: 0:[0], 1:[4], 2:[1,2], 9:[3], 30:[5]
    got = {r["event_id"]: r["n_prior"] for r in range_join_count(events, minutes=5).collect()}
    assert got == {0: 0, 4: 1, 1: 2, 2: 2, 3: 0, 5: 0}


def test_range_join_bin_boundary(spark):
    # b exactly window-start is included; b exactly at a's ts is excluded;
    # pairs straddling a bin boundary (minute 4→6) are still found.
    rows = [
        (0, _ts(6), 9, "x", 0.0, "{}"),
        (1, _ts(1), 9, "x", 0.0, "{}"),   # == window start of event 0 → counted
        (2, _ts(6), 9, "x", 0.0, "{}"),   # same ts as 0 → NOT counted for 0
        (3, _ts(4, 59), 9, "x", 0.0, "{}"),  # other side of the 5-min bin edge
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    got = {r["event_id"]: r["n_prior"] for r in range_join_count(events, minutes=5).collect()}
    assert got == {0: 2, 2: 2, 1: 0, 3: 1}


def test_funnel_strict_ordering(spark):
    """Funnel counts a step only when it happens STRICTLY after the prior
    step's earliest time; out-of-order conversions are dropped."""
    from ocr_redaction_engine_spark.analytics.temporal import funnel

    rows = [
        # user 1: full ordered funnel
        (0, _ts(0), 1, "signup", 0.0, "{}"),
        (1, _ts(1), 1, "click", 0.0, "{}"),
        (2, _ts(2), 1, "purchase", 0.0, "{}"),
        # user 2: purchase BEFORE click -> only 2 steps reached
        (3, _ts(0), 2, "signup", 0.0, "{}"),
        (4, _ts(5), 2, "click", 0.0, "{}"),
        (5, _ts(3), 2, "purchase", 0.0, "{}"),
        # user 3: click before signup doesn't count; later click does
        (6, _ts(2), 3, "click", 0.0, "{}"),
        (7, _ts(4), 3, "signup", 0.0, "{}"),
        (8, _ts(6), 3, "click", 0.0, "{}"),
        # user 4: never signed up -> absent from output
        (9, _ts(0), 4, "purchase", 0.0, "{}"),
        # user 5: same-ts click as signup is NOT strictly after -> 1 step
        (10, _ts(7), 5, "signup", 0.0, "{}"),
        (11, _ts(7), 5, "click", 0.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    got = {r["user_id"]: (r["steps_reached"], r["t1"], r["t2"], r["t3"])
           for r in funnel(events).collect()}
    e = lambda m: int(_ts(m).replace(tzinfo=dt.timezone.utc).timestamp())
    assert set(got) == {1, 2, 3, 5}
    assert got[1] == (3, e(0), e(1), e(2))
    assert got[2] == (2, e(0), e(5), None)
    assert got[3] == (2, e(4), e(6), None)
    assert got[5] == (1, e(7), None, None)
