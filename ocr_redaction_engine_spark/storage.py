"""Storage-layout writers — the at-rest layouts that delete shuffles at
read time (the cheapest optimization 100 TB allows: pay one shuffle at
ingest, never again).

* ``write_bucketed`` — hash-bucketed + sorted table (Hive-bucketing
  layout): every equi-join or aggregation on the bucket key then plans
  with ZERO Exchange (pinned in tests/test_bucketed_join.py). This is the
  production fix for the pipeline's single shuffle (the media_ref resolve
  join, BENCH.md): store ``documents``-derived spans and ``media_pages``
  co-bucketed on media_ref at ingest.
* ``write_sorted`` — range-partitioned, partition-sorted parquet export
  (the "globally ordered output" sink): repartitionByRange samples the key
  distribution so output files hold disjoint key ranges — readers that
  need key-ordered data (merges, binary-searchable exports, downstream
  as-of joins) get it without a global sort on their side. Skewed keys are
  handled by the range sampler, not a hash mod.

On Iceberg-enabled clusters the same intents are expressed as table
properties (``bucket(N, key)`` partition transforms / ``WRITE ORDERED
BY``); these helpers are the plain-Spark equivalents that run anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 64,
                   sort: bool = True, mode: str = "overwrite") -> None:
    """Persist ``df`` as a bucketed (and per-bucket sorted) table on
    ``key``. Joins/aggs between tables co-bucketed on the same key with the
    same ``n_buckets`` plan Exchange-free (bucketed SortMergeJoin)."""
    w = df.write.bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.mode(mode).saveAsTable(table)


def write_sorted(df: DataFrame, path: str, cols: list[str],
                 n_partitions: int | None = None,
                 mode: str = "overwrite") -> None:
    """Range-partitioned, partition-sorted parquet export: file k holds
    keys strictly below file k+1 (disjoint ranges via sampled range
    bounds), rows sorted within each file."""
    parts = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    out = df.repartitionByRange(parts, *cols).sortWithinPartitions(*cols)
    out.write.mode(mode).parquet(path)
