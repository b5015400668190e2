"""Units for deletion-neighborhood (FastSS) blocked entity resolution.
DuckDB hash parity at sf0.01 additionally enforced by the driver gate
(er_blocked_match)."""

from __future__ import annotations

import hashlib

from ocr_redaction_engine_spark.analytics.er import (
    blocked_match,
    synth_dirty_names,
)
from ocr_redaction_engine_spark.analytics.search import deletion_variants
from pyspark.sql import functions as F


def _pos(custkey: int, name: str) -> int:
    h = hashlib.md5(f"{custkey}:pert".encode()).hexdigest()[:15]
    return int(h, 16) % len(name) + 1


def _dirty(custkey: int, name: str) -> str:
    d = _pos(custkey, name)
    if custkey % 3 == 0:
        return name[: d - 1] + name[d:]
    if custkey % 3 == 1:
        return name[: d - 1] + "x" + name[d:]
    return name


def test_deletion_neighborhood_contents(spark):
    df = spark.createDataFrame([("abc",)], "s string")
    got = df.select(deletion_variants(F.col("s")).alias("v")).collect()[0].v
    assert got == ["abc", "bc", "ac", "ab"]


def test_synth_dirty_matches_python_mirror(spark):
    rows = [(i, f"Customer#{i:09d}", i % 3) for i in range(1, 10)]
    df = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey int")
    got = {r.dirty_id: r.dirty_name for r in synth_dirty_names(df).collect()}
    for k, name, _ in rows:
        assert got[k] == _dirty(k, name), k


def test_blocked_match_links_every_corruption_class(spark):
    rows = [
        (1, "alpha#901", 1),   # %3=1: substitution
        (2, "alpha#902", 1),   # %3=2: clean passthrough
        (3, "bravo#35", 1),    # %3=0: deletion
        (4, "charlie#7", 2),
        (5, "delta#123", 2),
        (6, "echo#55", 2),
    ]
    clean = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey int")
    got = {r.dirty_id: (r.matched_custkey, r.dist)
           for r in blocked_match(synth_dirty_names(clean), clean).collect()}
    # every dirty row resolves; clean rows at dist 0, edited rows at their
    # true distance; ambiguous dist-1 ties (e.g. 'alpha#90x' is dist 1 from
    # both alpha names) break to the lowest custkey, which is the true one
    for k, name, _ in rows:
        d = 0 if k % 3 == 2 else (0 if _dirty(k, name) == name else 1)
        assert got[k][1] == d, (k, got[k])
        assert got[k][0] == k or got[k][1] == 1
    assert got[2] == (2, 0)
    assert got[3][0] == 3


def test_blocked_match_no_cross_nation_links(spark):
    # identical names in different nations must NOT link (nation rides the
    # block key) — and within a nation, dist>1 stays unmatched
    clean = spark.createDataFrame(
        [(1, "same-name#1", 1), (2, "same-name#1", 2), (3, "faraway", 1)],
        "c_custkey long, c_name string, c_nationkey int")
    dirty = spark.createDataFrame(
        [(10, "same-name#1", 1), (11, "zzzz", 1)],
        "dirty_id long, dirty_name string, nationkey int")
    got = {r.dirty_id: (r.matched_custkey, r.dist)
           for r in blocked_match(dirty, clean).collect()}
    assert got == {10: (1, 0)}
