"""Physical-plan auditing — one shared extractor for the point-in-time
artifact (tools/plan_audit.py → PLAN_AUDIT.json) and the per-commit
regression guard (tests/test_plan_audit.py).

The properties audited are the ones the 100 TB design depends on: shuffle
(Exchange) count, Arrow/Python stage count, join strategies, banned joins
(CartesianProduct / BroadcastNestedLoopJoin), scan filter pushdown, and
whole-stage-codegen span count. A future "optimization" that adds a
shuffle, drops into a row-at-a-time Python UDF, or degrades a hash join to
a nested loop changes these numbers and fails CI instead of shipping.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

JOIN_KINDS = (
    "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
    "BroadcastNestedLoopJoin", "CartesianProduct",
)


def plan_string(df: DataFrame) -> str:
    """The executed physical plan (pre-execution — for AQE plans this is
    the initial plan, which is the stable, comparable one)."""
    return df._jdf.queryExecution().executedPlan().toString()


def audit_plan(df: DataFrame) -> dict:
    plan = plan_string(df)
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "arrow_stages": plan.count("MapInPandas") + plan.count("ArrowEvalPython"),
        "python_row_udfs": plan.count("BatchEvalPython"),
        "joins": {k: plan.count(k) for k in JOIN_KINDS if k in plan},
        "banned_join": ("CartesianProduct" in plan)
        or ("BroadcastNestedLoopJoin" in plan),
        "pushed_filters": "PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        "codegen_spans": len(re.findall(r"WholeStageCodegen", plan)),
    }
