"""Skew-safe split-union join: result identical to the plain join; hot keys
take a broadcast path while the cold tail keeps a shuffled join (plan-pinned
with auto-broadcast disabled so small test inputs can't fake the shape)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ocr_redaction_engine_spark.operators.joins import skew_safe_join


def _frames(spark):
    # one hot key (0: 500 rows) + 50 cold keys (4 rows each)
    # hot key computed from data (a literal key would constant-fold the
    # semi-join condition away and plan a BNL — not the shape under test)
    left = spark.range(0, 500).select(
        F.floor(F.col("id") / 1000).alias("k"), F.col("id").alias("v")).union(
        spark.range(0, 200).select((F.col("id") % 50 + 1).alias("k"), F.col("id").alias("v")))
    right = spark.range(0, 51).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    return left, right


def test_skew_join_matches_plain_join(spark):
    left, right = _frames(spark)
    got = skew_safe_join(left, right, "k", hot_threshold=100)
    expected = left.join(right, "k")
    assert got.count() == 700
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_skew_join_plan_has_both_paths(spark):
    left, right = _frames(spark)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = (skew_safe_join(left, right, "k", hot_threshold=100)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BroadcastHashJoin" in plan          # hot path
        assert "SortMergeJoin" in plan              # cold path
        assert "BroadcastNestedLoopJoin" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
