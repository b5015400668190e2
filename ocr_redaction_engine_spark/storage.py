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


def zorder_key(x: str, y: str, bits: int = 10):
    """Morton (Z-order) key: bit-interleave two non-negative integer
    columns (low ``bits`` bits each) into one BIGINT. Sorting / range-
    partitioning by this key clusters rows that are close in BOTH
    dimensions into the same files, so per-file min/max stats prune reads
    for predicates on either column — multi-dimensional data skipping
    (what Delta's OPTIMIZE ZORDER BY does; here as a portable expression).

    Pure Catalyst: one ``aggregate`` HOF over ``sequence(0, bits-1)`` with
    shift/mod bit ops — integer-exact, engine-portable (the DuckDB twin is
    the same sum over ``range``).
    """
    from pyspark.sql import functions as F
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), CAST(0 AS BIGINT), (acc, i) ->"
        f" acc + shiftleft(CAST(shiftright({x}, i) % 2 AS BIGINT), 2*i + 1)"
        f"     + shiftleft(CAST(shiftright({y}, i) % 2 AS BIGINT), 2*i))"
    )


def write_zordered(df: DataFrame, path: str, x: str, y: str,
                   n_partitions: int = 16, bits: int = 10,
                   mode: str = "overwrite") -> None:
    """Z-order-clustered parquet export: range-partition + sort by the
    Morton key of (x, y), then drop the key. Each output file covers a
    compact rectangle of the (x, y) plane instead of a full-width stripe,
    so min/max file stats prune on BOTH dimensions (verified by the
    bounding-box unit test)."""
    keyed = df.withColumn("__z", zorder_key(x, y, bits))
    (keyed.repartitionByRange(n_partitions, "__z")
     .sortWithinPartitions("__z")
     .drop("__z")
     .write.mode(mode).parquet(path))
