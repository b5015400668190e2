"""Skew-safe equi-join: split-union on hot keys.

AQE's skew-join handling splits oversized *partitions* at runtime, but it
only fires on sort-merge joins and only when the skew is visible in the
shuffle statistics of that one query. For PERSISTENT hot keys known from
data statistics (the boilerplate signature, the null-ish default key, the
celebrity user), the deterministic fix is structural: route hot keys
through a broadcast join (no shuffle of the hot rows at all — the giant
key never lands on one reducer) and the long cold tail through a normal
shuffled join, then union. Cost: one map-side-combined count of the left
side + one tiny broadcast of the hot key list.

The hot slice of ``right`` must fit in executor memory — true by
construction when hot keys are few and ``right`` is key-unique (a dim or
per-key aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_safe_join(left: DataFrame, right: DataFrame, key: str,
                   hot_threshold: int) -> DataFrame:
    """Inner equi-join of ``left`` with ``right`` on ``key`` where keys with
    left-side frequency ≥ ``hot_threshold`` take a broadcast path and the
    rest take the regular shuffled path. Result set is identical to
    ``left.join(right, key)`` — only the physical routing differs."""
    hot_keys = (
        left.groupBy(key).agg(F.count("*").alias("_c"))
        .filter(F.col("_c") >= hot_threshold)
        .select(key)
    )
    left_hot = left.join(F.broadcast(hot_keys), key, "left_semi")
    left_cold = left.join(F.broadcast(hot_keys), key, "left_anti")
    right_hot = right.join(F.broadcast(hot_keys), key, "left_semi")
    hot = left_hot.join(F.broadcast(right_hot), key)
    cold = left_cold.join(right, key)
    return hot.unionByName(cold)
