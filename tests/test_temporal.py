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


def test_retention_cohorts_hand_computed(spark):
    """Two cohorts a week apart; retention cells match hand arithmetic."""
    from ocr_redaction_engine_spark.analytics.temporal import retention_cohorts

    def at(day):
        return dt.datetime(2024, 1, 1) + dt.timedelta(days=day)

    rows = [
        # cohort A (week of 2024-01-01): users 1,2 — user 1 returns week+1
        (0, at(0), 1, "view", 0.0, "{}"),
        (1, at(1), 2, "view", 0.0, "{}"),
        (2, at(8), 1, "view", 0.0, "{}"),
        # cohort B (next week): user 3 only, active twice the SAME week
        (3, at(8), 3, "view", 0.0, "{}"),
        (4, at(9), 3, "view", 0.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    got = {(r.cohort_week, r.week_offset): (r.n_active, r.cohort_size, r.retention_bp)
           for r in retention_cohorts(events).collect()}
    wk = (int(at(0).replace(tzinfo=dt.timezone.utc).timestamp()) // 86400) // 7
    wk3 = (int(at(8).replace(tzinfo=dt.timezone.utc).timestamp()) // 86400) // 7
    assert got[(wk, 0)] == (2, 2, 10000)
    assert got[(wk, wk3 - wk)] == (1, 2, 5000)
    assert got[(wk3, 0)] == (1, 1, 10000)
    assert len(got) == 3


def test_event_transitions_counts_and_shares(spark):
    """Per-user ordered lag pairs; same-ts ties break on event_id; shares
    are integer basis points of the prev-type row."""
    from ocr_redaction_engine_spark.analytics.temporal import event_transitions

    rows = [
        (0, _ts(0), 1, "a", 0.0, "{}"),
        (1, _ts(1), 1, "b", 0.0, "{}"),
        (2, _ts(2), 1, "a", 0.0, "{}"),
        # user 2: same-ts pair ordered by event_id: a(3) -> b(4)
        (3, _ts(5), 2, "a", 0.0, "{}"),
        (4, _ts(5), 2, "b", 0.0, "{}"),
        (5, _ts(9), 3, "c", 0.0, "{}"),   # lone event: no transition
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    got = {(r.prev_type, r.next_type): (r.n, r.share_bp)
           for r in event_transitions(events).collect()}
    assert got == {("a", "b"): (2, 10000), ("b", "a"): (1, 10000)}


def test_hourly_anomalies_planted_spike(spark):
    """24 calm hours then a 10x spike hour: only the spike is flagged, and
    hours with an incomplete trailing window are excluded."""
    from ocr_redaction_engine_spark.analytics.temporal import hourly_anomalies

    rows = []
    eid = 0
    for h in range(26):
        # calm: 3 events/hour with a tiny wobble; hour 25: 30 events
        n = 30 if h == 25 else (3 + (h % 2))
        for i in range(n):
            rows.append((eid, dt.datetime(2024, 1, 1) + dt.timedelta(hours=h, seconds=i),
                         1, "view", 0.0, "{}"))
            eid += 1
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    out = {r.hour: r.is_spike for r in hourly_anomalies(events, trailing=24, k=3).collect()}
    base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp()) // 3600
    assert set(out) == {base + 24, base + 25}  # first 24 hours lack a full window
    assert out[base + 25] is True and out[base + 24] is False


def test_value_trend_matches_numpy_lstsq(spark):
    """Distributed sufficient-statistic OLS equals numpy's polyfit slope and
    intercept on a planted linear-plus-step series."""
    import numpy as np
    from ocr_redaction_engine_spark.analytics.temporal import value_trend

    rows, eid = [], 0
    e0 = dt.datetime(2024, 1, 1)
    series = {"up": lambda i: 2.0 + 0.5 * i, "flat": lambda i: 7.25}
    for typ, f in series.items():
        for i in range(40):
            rows.append((eid, e0 + dt.timedelta(seconds=100 * i), 1, typ, f(i), "{}"))
            eid += 1
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    got = {r.event_type: (r.n, r.slope_e9, r.intercept_e9)
           for r in value_trend(events).collect()}
    epoch0 = 1704067200
    base = int(e0.replace(tzinfo=dt.timezone.utc).timestamp()) - epoch0
    for typ, f in series.items():
        xs = np.array([base + 100 * i for i in range(40)], dtype=float)
        ys = np.array([round(f(i), 2) for i in range(40)])
        slope, intercept = np.polyfit(xs, ys, 1)
        n, s9, i9 = got[typ]
        assert n == 40
        assert abs(s9 - round(slope * 1e9)) <= 1
        assert abs(i9 - round(intercept * 1e9)) <= 1
    assert got["flat"][1] == 0  # flat series: exactly zero slope


def test_type_correlation_matches_numpy_and_zero_fill(spark):
    """Pairwise corr equals numpy corrcoef on ZERO-FILLED series (the dense
    grid matters: type 'b' is absent in some hours), perfectly correlated
    planted series hit 1e6, anti-correlated hit -1e6."""
    import numpy as np
    from ocr_redaction_engine_spark.analytics.temporal import type_correlation

    rows, eid = [], 0
    e0 = dt.datetime(2024, 1, 1)
    # per hour h in 0..5: a: 2+h events; b: 8-h events but NONE in hours 4,5;
    # c: constant-free ramp equal to a (perfect correlation with a)
    counts = {"a": [2, 3, 4, 5, 6, 7], "b": [8, 7, 6, 0, 0, 0],
              "c": [4, 6, 8, 10, 12, 14]}
    for typ, per_hour in counts.items():
        for h, n in enumerate(per_hour):
            for i in range(n):
                rows.append((eid, e0 + dt.timedelta(hours=h, seconds=i), 1,
                             typ, 0.0, "{}"))
                eid += 1
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    got = {(r.type_a, r.type_b): (r.n_hours, r.corr_e6)
           for r in type_correlation(events).collect()}
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    for (ta, tb), (nh, c6) in got.items():
        assert nh == 6
        expect = np.corrcoef(np.array(counts[ta], dtype=float),
                             np.array(counts[tb], dtype=float))[0, 1]
        assert abs(c6 - round(expect * 1e6)) <= 1
    assert got[("a", "c")][1] == 1000000  # exact perfect correlation


def test_user_type_pivot_counts(spark):
    from ocr_redaction_engine_spark.analytics.temporal import user_type_pivot

    rows = [
        (0, _ts(0), 1, "click", 0.0, "{}"),
        (1, _ts(1), 1, "click", 0.0, "{}"),
        (2, _ts(2), 1, "error", 0.0, "{}"),
        (3, _ts(3), 2, "view", 0.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    got = {r.user_id: (r.click, r.error, r.purchase, r.signup, r.view, r.total)
           for r in user_type_pivot(events).collect()}
    assert got == {1: (2, 1, 0, 0, 0, 3), 2: (0, 0, 0, 0, 1, 1)}


def test_top_paths_ordering_and_truncation(spark):
    from ocr_redaction_engine_spark.analytics.temporal import top_paths

    rows = [
        # user 1 & 2: same path a>b ; user 3: same-ts tie broken by event_id
        (0, _ts(0), 1, "a", 0.0, "{}"), (1, _ts(1), 1, "b", 0.0, "{}"),
        (2, _ts(0), 2, "a", 0.0, "{}"), (3, _ts(1), 2, "b", 0.0, "{}"),
        (4, _ts(5), 3, "a", 0.0, "{}"), (5, _ts(5), 3, "b", 0.0, "{}"),
        # user 4: long history truncated at max_len
        *[(10 + i, _ts(10 + i), 4, "x", 0.0, "{}") for i in range(6)],
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    got = [(r.path, r.n_users) for r in top_paths(events, k=10, max_len=4).collect()]
    assert got[0] == ("a>b", 3)            # tie at _ts(5) broken by event_id 4<5
    assert ("x>x>x>x", 1) in got           # truncated to max_len
    assert len(got) == 2


def test_sax_symbols_planted_shape(spark):
    """A planted low/high step series yields 'a' letters in the quiet half
    and 'd' in the loud half, with exact integer PAA levels."""
    from ocr_redaction_engine_spark.analytics.temporal import sax_symbols

    rows, eid = [], 0
    e0 = dt.datetime(2024, 1, 1)
    for h in range(16):
        n = 2 if h < 8 else 10   # mean = 6 -> 2*2 < 6 ('a'), 10*2 > 18 ('d')
        for i in range(n):
            rows.append((eid, e0 + dt.timedelta(hours=h, seconds=i), 1,
                         "step", 0.0, "{}"))
            eid += 1
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    got = {r.segment: (r.n_hours, r.paa_e3, r.symbol)
           for r in sax_symbols(events, segments=8).collect()}
    assert set(got) == set(range(8))
    for s in range(4):
        assert got[s] == (2, 2000, "a")
    for s in range(4, 8):
        assert got[s] == (2, 10000, "d")


def test_active_users_sliding_distinct(spark):
    """WAU at day d counts users active in [d-6, d]; partial leading
    windows are dropped; stickiness is integer bp."""
    from ocr_redaction_engine_spark.analytics.temporal import active_users

    def at(day):
        return dt.datetime(2024, 1, 1) + dt.timedelta(days=day)

    rows = [
        (0, at(0), 1, "view", 0.0, "{}"),
        (1, at(0), 2, "view", 0.0, "{}"),
        (2, at(6), 1, "view", 0.0, "{}"),     # day 6: dau {1}; wau {1,2}
        (3, at(7), 3, "view", 0.0, "{}"),     # day 7: dau {3}; wau {1,3}
        (4, at(13), 4, "view", 0.0, "{}"),    # day 13: dau {4}; wau {3,4}
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    base = int(at(0).replace(tzinfo=dt.timezone.utc).timestamp()) // 86400
    got = {r.day - base: (r.dau, r.wau, r.stickiness_bp)
           for r in active_users(events, window_days=7).collect()}
    assert got[6] == (1, 2, 5000)
    assert got[7] == (1, 2, 5000)
    assert got[13] == (1, 2, 5000)
    assert min(got) == 6 and max(got) == 13  # days 0-5 (partial) dropped
    # gap days keep their row with dau=0 while the trailing window is
    # nonempty (ADVICE r2): days 8..12 see day-6/7 users in their window
    for d in range(8, 13):
        assert got[d] == (0, 2, 0), f"gap day {d} must not vanish"
    assert set(got) == set(range(6, 14))


def test_cohort_ltv_hand_computed(spark):
    from ocr_redaction_engine_spark.analytics.temporal import cohort_ltv
    import datetime as dt
    rows = [
        # cust 1: first 1994-01, buys again 1994-03
        (1, 1, "O", 10.00, dt.date(1994, 1, 5), "p"),
        (2, 1, "O", 5.00, dt.date(1994, 3, 9), "p"),
        # cust 2: same cohort, single order
        (3, 2, "O", 7.50, dt.date(1994, 1, 20), "p"),
        # cust 3: later cohort
        (4, 3, "O", 2.25, dt.date(1994, 2, 1), "p"),
    ]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate date, o_orderpriority string")
    m94_1 = 1994 * 12 + 0
    got = {(r.cohort_m, r.offset_m): (r.n_custs, r.rev_cents,
                                      r.cum_rev_cents, r.cum_per_cust_cents)
           for r in cohort_ltv(orders).collect()}
    assert got[(m94_1, 0)] == (2, 1750, 1750, 875)
    assert got[(m94_1, 2)] == (2, 500, 2250, 1125)
    assert got[(m94_1 + 1, 0)] == (1, 225, 225, 225)
    assert len(got) == 3


def test_volume_changepoints_planted_shift(spark):
    from ocr_redaction_engine_spark.analytics.temporal import volume_changepoints
    import datetime as dt
    rows, eid = [], 0
    # type A: 10/day for 5 days then 2/day for 5 days -> split after day 5
    for d in range(10):
        per = 10 if d < 5 else 2
        for _ in range(per):
            rows.append((eid, dt.datetime(2024, 3, 1 + d, 9), 1, "A", 0.0, "{}"))
            eid += 1
    # type B: flat 4/day
    for d in range(10):
        for _ in range(4):
            rows.append((eid, dt.datetime(2024, 3, 1 + d, 9), 1, "B", 0.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    got = {r.event_type: r for r in
           volume_changepoints(ev, min_delta_e6=3_000_000).collect()}
    a = got["A"]
    d5 = (dt.datetime(2024, 3, 5, 9) - dt.datetime(1970, 1, 1)).days
    assert a.split_day == d5 and a.shifted
    assert a.mean_before_e6 == 10_000_000 and a.mean_after_e6 == 2_000_000
    assert a.delta_e6 == 8_000_000
    assert not got["B"].shifted and got["B"].delta_e6 < 3_000_000


def test_seasonal_naive_backtest_weekly_pattern(spark):
    from ocr_redaction_engine_spark.analytics.temporal import seasonal_naive_backtest
    import datetime as dt
    rows, eid = [], 0
    # strong weekly pattern: weekday d%7 determines volume exactly
    pattern = [3, 5, 2, 8, 1, 4, 6]
    for d in range(21):
        for _ in range(pattern[d % 7]):
            rows.append((eid, dt.datetime(2024, 4, 1, 0) + dt.timedelta(days=d),
                         1, "W", 0.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    got = seasonal_naive_backtest(ev, season=7).collect()[0]
    # seasonal forecast is exact (period 7); naive-1 jumps around
    assert got.event_type == "W" and got.n_days == 14
    assert got.mae_seasonal_e6 == 0
    diffs = [abs(pattern[d % 7] - pattern[(d - 1) % 7]) for d in range(7, 21)]
    assert got.mae_naive_e6 == sum(diffs) * 1000000 // 14
    assert got.seasonal_wins
