"""Skew-safe ranking primitives shared across the analytics operators.

``salted_topk`` is the distributed form of "row_number() per group, keep
the top k" for LOW-CARDINALITY groups with corpus-scale candidate sets —
the BM25 per-query rank, the ANN per-query rank, the per-cluster
representative pick. A bare ``Window.partitionBy(group)`` funnels every
candidate of a group through ONE sorted task; with a handful of query ids
over 10^12 candidates that task IS the job. The fix is the same two-stage
top-k [[web_domain_cap]] uses for Zipf-hot domains:

  stage 1  rank within (group, salt) — ``salts`` × more, evenly loaded
           partitions — and keep k per salted slice;
  stage 2  re-rank the ≤ salts·k survivors per group.

EXACTNESS: if row x is in a group's global top-k under a TOTAL order,
fewer than k rows of that group precede x — so fewer than k precede it
within x's own salt slice, hence x survives stage 1; stage 2 then ranks a
superset of the global top-k under the same total order, reproducing the
single-window numbering bit for bit. (The order must be total — include a
unique tie-break column — or both formulations are underdetermined.)

The salt is a deterministic hash of a caller-named unique column, so
reruns are stable and the result provably salt-count-invariant (pinned by
the salts=1 ≡ salts=8 unit tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_topk(scored: DataFrame, part_cols: list[str],
                order_cols: list[Column], k: int, salt_on: str,
                rank_name: str = "rank", salts: int = 8) -> DataFrame:
    """Top-``k`` rows per ``part_cols`` group under the total order
    ``order_cols``, ranked in ``rank_name`` (1-based) — bit-identical to
    ``row_number().over(Window.partitionBy(part).orderBy(order)) <= k``
    while no task ever sorts more than one salt's share of one group.

    ``salt_on`` names a column unique within each group (the tie-break
    column of the total order); ``salts=1`` degenerates to the plain
    single-window plan (used by the equivalence tests).
    """
    if salts <= 1:
        w = Window.partitionBy(*part_cols).orderBy(*order_cols)
        return (scored.withColumn(rank_name, F.row_number().over(w))
                .filter(F.col(rank_name) <= k))
    salted = scored.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_on)), F.lit(salts)))
    w1 = Window.partitionBy(*part_cols, "__salt").orderBy(*order_cols)
    s1 = (salted.withColumn("__r1", F.row_number().over(w1))
          .filter(F.col("__r1") <= k))
    w2 = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return (s1.withColumn(rank_name, F.row_number().over(w2))
            .filter(F.col(rank_name) <= k)
            .drop("__salt", "__r1"))
