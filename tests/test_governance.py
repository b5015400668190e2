"""Units for warehouse governance: FK audit detects planted orphans and
reports utilization; SCD2 intervals compress runs and close correctly."""

from __future__ import annotations

from ocr_redaction_engine_spark.analytics.governance import (
    referential_audit,
    scd_intervals,
)


def test_referential_audit_detects_orphans(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 99), (5, 99), (6, 77),
         (7, None), (8, None)],
        "id long, fk long")
    parent = spark.createDataFrame([(10,), (20,), (30,)], "pk long")
    rows = referential_audit({"child.fk->parent": (child, "fk", parent, "pk")}).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.relationship == "child.fk->parent"
    assert r.child_rows == 8
    assert r.null_fk_rows == 2           # NULL fk is not a violation...
    assert r.orphan_rows == 3            # ...so orphans stay fks 99, 99, 77
    assert r.orphan_keys == 2            # {99, 77}
    assert r.parent_keys == 3
    assert r.referenced_keys == 2        # {10, 20}; 30 unused
    assert r.utilization_bp == 2 * 10000 // 3


def test_referential_audit_empty_pairs_raises(spark):
    import pytest
    with pytest.raises(ValueError, match="pairs is empty"):
        referential_audit({})


def test_scd_intervals_compress_and_close(spark):
    import datetime as dt

    def d(n):
        return dt.date(2024, 1, n)

    rows = [
        # cust 1: O,O,F,O -> three intervals (runs compressed)
        (1, 1, "O", d(1)), (2, 1, "O", d(2)), (3, 1, "F", d(5)), (4, 1, "O", d(9)),
        # cust 2: single status -> one open interval
        (5, 2, "P", d(3)), (6, 2, "P", d(4)),
        # cust 3: same-date change -> orderkey tiebreak (7 before 8)
        (7, 3, "O", d(6)), (8, 3, "F", d(6)),
    ]
    orders = spark.createDataFrame(
        [(k, c, s, dd, 0.0, "x") for k, c, s, dd in rows],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_orderdate date, o_totalprice double, o_orderpriority string")
    got = {(r.o_custkey, r.version): (r.o_orderstatus, r.valid_from, r.valid_to)
           for r in scd_intervals(orders).collect()}
    assert got == {
        (1, 1): ("O", "2024-01-01", "2024-01-05"),
        (1, 2): ("F", "2024-01-05", "2024-01-09"),
        (1, 3): ("O", "2024-01-09", None),
        (2, 1): ("P", "2024-01-03", None),
        (3, 1): ("O", "2024-01-06", "2024-01-06"),
        (3, 2): ("F", "2024-01-06", None),
    }


def test_rfm_segments_buckets_monotone_and_bounds(spark):
    """Buckets are 0..2 and monotone in the metric (higher metric -> same or
    higher bucket); recency is vs corpus max date; monetary exact cents."""
    import datetime as dt

    from ocr_redaction_engine_spark.analytics.governance import rfm_segments

    rows = []
    key = 0
    for cust in range(1, 31):
        # cust c has c orders, latest on day 100+c, each worth 10.50*c
        for j in range(cust):
            rows.append((key, cust, "O",
                         dt.datetime(2024, 1, 1) + dt.timedelta(days=100 + cust - j),
                         10.50 * cust, "p"))
            key += 1
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_orderdate timestamp, o_totalprice double, o_orderpriority string")
    got = {r.o_custkey: r for r in rfm_segments(orders).collect()}
    assert len(got) == 30
    mx = max(100 + c for c in range(1, 31))
    for c, r in got.items():
        assert r.recency_days == mx - (100 + c)
        assert r.frequency == c
        assert r.monetary_cents == 1050 * c * c
        for b in (r.r_bucket, r.f_bucket, r.m_bucket):
            assert 0 <= b <= 2
    # frequency buckets monotone in c
    fb = [got[c].f_bucket for c in range(1, 31)]
    assert fb == sorted(fb) and fb[0] == 0 and fb[-1] == 2


def test_basket_lift_matches_bruteforce(spark):
    """Lift values equal a pure-Python recompute on planted baskets; the
    always-together pair tops the anti-correlated one."""
    from collections import Counter
    from itertools import combinations

    from ocr_redaction_engine_spark.analytics.governance import basket_lift

    baskets = {
        1: [10, 20], 2: [10, 20], 3: [10, 20],   # 10-20 always together
        4: [30], 5: [30, 40], 6: [40, 50], 7: [50, 10],
    }
    rows = [(o * 100 + i, p, 1, i, 1.0, 1.0, 0.0, 0.0, "N", "O",
             None) for o, ps in baskets.items() for i, p in enumerate(ps)]
    li = spark.createDataFrame(
        [(r[0] // 100, r[1]) for r in rows], "l_orderkey long, l_partkey long")
    # widen to the lineitem columns the operator touches (only two)
    got = {(r.part_a, r.part_b): (r.n_ab, r.n_a, r.n_b, r.lift_e6)
           for r in basket_lift(li, top_k=50).collect()}

    n_orders = len(baskets)
    marg = Counter(p for ps in baskets.values() for p in set(ps))
    pair = Counter()
    for ps in baskets.values():
        for a, b in combinations(sorted(set(ps)), 2):
            pair[(a, b)] += 1
    expect = {ab: (n, marg[ab[0]], marg[ab[1]],
                   n * n_orders * 1000000 // (marg[ab[0]] * marg[ab[1]]))
              for ab, n in pair.items()}
    assert got == expect
    assert got[(10, 20)][3] > got[(10, 50)][3]
