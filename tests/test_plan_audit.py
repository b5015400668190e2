"""Plan-audit regression guard (VERDICT r4 #7): the physical-plan
properties of the most expensive driver queries are pinned as assertions,
so a future "optimization" that adds a shuffle, introduces a row-at-a-time
Python UDF, adds an Arrow stage, or degrades a join to a nested loop fails
CI instead of shipping silently. PLAN_AUDIT.json remains the point-in-time
artifact over all 206 queries; this file is the per-commit tripwire over
the top-cost subset (slowest queries of BENCH_full.json).

Pins are ceilings, not equalities: REMOVING a shuffle/Arrow stage is an
improvement and passes (update the pin downward when you bank one);
adding one fails. Pinned at sf0.001, the scale every pytest runs at —
join strategy choices are a function of the committed testdata's stats,
so the numbers are deterministic.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_redaction_engine_spark.planaudit import audit_plan

SF_DIR = "/root/testdata/sf0.001"

# {query: (max_exchanges, max_arrow_stages, max_sort_merge_joins)}
# captured 2026-08-21 at the round-5 HEAD; ceilings == current values.
PINNED = {
    "dedup_onion_funnel":      (0, 0, 0),
    "dedup_cdc_chunks":        (2, 0, 0),
    "dedup_semantic":          (4, 3, 2),
    "dedup_prefix_jaccard":    (9, 0, 0),
    "dedup_sparse_cosine":     (11, 0, 0),
    "ann_whitened_topk":       (2, 0, 0),
    "dedup_substring_clip":    (3, 0, 0),
    "text_repeated_spans":     (3, 0, 0),
    "audit_referential":       (25, 0, 0),
    "ann_pq_adc":              (3, 1, 0),
    "basket_part_lift":        (7, 0, 0),
    "er_blocked_match":        (2, 0, 0),
    "web_communities":         (4, 0, 1),
    "search_hybrid_rrf":       (12, 0, 1),
    "sketch_bloom_fpr":        (8, 0, 0),
    "text_source_overlap":     (7, 0, 0),
    "sketch_cm_heavy_hitters": (3, 0, 0),
    "dedup_simhash_cands":     (3, 2, 0),
    "dedup_incremental":       (13, 0, 2),
    "search_bm25":             (8, 0, 0),
    "text_contamination":      (2, 0, 0),
    "dedup_banding_eval":      (7, 0, 1),
}


@pytest.fixture(scope="module")
def driver_queries():
    import __spark_entry__ as entry
    return entry.queries()


@pytest.mark.parametrize("name", sorted(PINNED))
def test_pinned_plan_shape(spark, driver_queries, name):
    max_ex, max_arrow, max_smj = PINNED[name]
    a = audit_plan(driver_queries[name](spark, SF_DIR))
    assert not a["banned_join"], f"{name}: cartesian/BNL join appeared"
    assert a["python_row_udfs"] == 0, f"{name}: row-at-a-time Python UDF"
    assert a["exchanges"] <= max_ex, (
        f"{name}: {a['exchanges']} exchanges > pinned {max_ex} — a shuffle "
        "was added; remove it or justify + update the pin")
    assert a["arrow_stages"] <= max_arrow, (
        f"{name}: {a['arrow_stages']} Arrow stages > pinned {max_arrow}")
    assert a["joins"].get("SortMergeJoin", 0) <= max_smj, (
        f"{name}: a broadcast join degraded to SortMergeJoin "
        f"({a['joins']}) — broadcast the small side or update the pin")


def test_guard_trips_on_added_shuffle(spark, driver_queries):
    """Negative control: the tripwire must actually fire. An artificially
    shuffled variant of a pinned zero-exchange query exceeds its pin."""
    base = driver_queries["dedup_onion_funnel"](spark, SF_DIR)
    broken = base.repartition(16)
    assert audit_plan(base)["exchanges"] <= PINNED["dedup_onion_funnel"][0]
    assert audit_plan(broken)["exchanges"] > PINNED["dedup_onion_funnel"][0]


def test_guard_trips_on_python_udf(spark):
    """Negative control for the UDF tripwire: a row-at-a-time Python UDF
    must be detected (the repo itself registers none — PLAN_AUDIT shows 0
    across all 206 queries)."""
    from pyspark.sql.types import LongType
    f = F.udf(lambda x: x + 1, LongType())
    df = spark.range(10).select(f("id").alias("y"))
    assert audit_plan(df)["python_row_udfs"] >= 1
