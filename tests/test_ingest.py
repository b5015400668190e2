"""Units for dead-letter quarantine routing: each corruption class lands in
its lane, the parse happens once, and the valid lane carries the value."""

from __future__ import annotations

from ocr_redaction_engine_spark.analytics.ingest import (
    quarantine_events,
    synth_corrupt_props,
)


def test_quarantine_lanes(spark):
    rows = [
        (0, '{"k": 7}'),          # ok
        (1, '{"k": 7'),           # malformed (truncated)
        (2, '{"x": 7}'),          # missing field
        (3, '{"k": 99999}'),      # out of range
        (4, 'not json at all'),   # malformed
        (5, '{"k": 0}'),          # boundary ok
        (6, '{"k": 100}'),        # boundary ok
        (7, '{"k": -1}'),         # out of range (below)
    ]
    events = spark.createDataFrame(rows, "event_id long, props string")
    got = {r.event_id: (r.reason, r.valid, r.k)
           for r in quarantine_events(events).collect()}
    assert got == {
        0: ("ok", True, 7),
        1: ("malformed", False, None),
        2: ("missing_field", False, None),
        3: ("out_of_range", False, None),
        4: ("malformed", False, None),
        5: ("ok", True, 0),
        6: ("ok", True, 100),
        7: ("out_of_range", False, None),
    }


def test_quarantine_plan_is_map_only(spark):
    events = spark.createDataFrame([(0, '{"k": 1}')], "event_id long, props string")
    plan = quarantine_events(events)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_synth_corruption_classes_cover_all_lanes(spark):
    events = spark.createDataFrame(
        [(i, '{"k": %d}' % (i % 100)) for i in range(300)],
        "event_id long, props string")
    lanes = {r.reason for r in
             quarantine_events(synth_corrupt_props(events)).collect()}
    assert lanes == {"ok", "malformed", "missing_field", "out_of_range"}


def test_json_key_profile_null_safe_and_counts(spark):
    rows = [
        (0, '{"k": "1", "tag": "a"}'),
        (1, '{"k": "2"}'),
        (2, 'broken {'),            # contributes nothing
        (3, '{"tag": "a"}'),
    ]
    events = spark.createDataFrame(rows, "event_id long, props string")
    from ocr_redaction_engine_spark.analytics.ingest import json_key_profile
    got = {r.key: (r.n_rows, r.n_distinct, r.min_value, r.max_value)
           for r in json_key_profile(events).collect()}
    assert got == {"k": (2, 2, "1", "2"), "tag": (2, 1, "a", "a")}


def test_json_schema_drift_statuses(spark):
    from ocr_redaction_engine_spark.analytics.ingest import json_schema_drift
    import datetime as dt
    def ts(day): return dt.datetime(2024, 1, day, 12, 0, 0)
    rows = []
    eid = 0
    # day 1-2: key 'a' on all rows; day 3: 'a' vanishes. key 'k' always.
    for day, n_a in [(1, 2), (2, 2), (3, 0)]:
        for i in range(2):
            props = '{"k": 1, "a": 2}' if i < n_a else '{"k": 1}'
            rows.append((eid, ts(day), 1, "t", 0.0, props)); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    got = {(r.day, r.key): (r.n_rows, r.rate_bp, r.prev_rate_bp, r.status)
           for r in json_schema_drift(ev, shift_bp=2000).collect()}
    d1 = min(d for d, _ in got)
    # 'a': new on day1 (100%), stable day2, dropped day3
    assert got[(d1, "a")] == (2, 10000, None, "new")
    assert got[(d1 + 1, "a")] == (2, 10000, 10000, "stable")
    assert got[(d1 + 2, "a")] == (0, 0, 10000, "dropped")
    # 'k': always 100%
    assert got[(d1, "k")][3] == "new"
    assert got[(d1 + 1, "k")][3] == got[(d1 + 2, "k")][3] == "stable"


def test_json_schema_drift_shift_and_absent(spark):
    from ocr_redaction_engine_spark.analytics.ingest import json_schema_drift
    import datetime as dt
    def ts(day): return dt.datetime(2024, 2, day, 3, 0, 0)
    rows = []
    eid = 0
    # 'b' at 100% day1, 50% day2 (shift >= 2000bp), gone day3+4 (dropped, absent)
    plan = {1: (4, 4), 2: (2, 4), 3: (0, 4), 4: (0, 4)}
    for day, (n_b, n_tot) in plan.items():
        for i in range(n_tot):
            props = '{"k": 1, "b": 1}' if i < n_b else '{"k": 1}'
            rows.append((eid, ts(day), 1, "t", 0.0, props)); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    got = {(r.day, r.key): r.status for r in
           json_schema_drift(ev, shift_bp=2000).collect()}
    d1 = min(d for d, _ in got)
    assert got[(d1, "b")] == "new"
    assert got[(d1 + 1, "b")] == "shifted"
    assert got[(d1 + 2, "b")] == "dropped"
    assert got[(d1 + 3, "b")] == "absent"
