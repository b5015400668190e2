"""Storage-layout writers: range-sorted export produces disjoint,
internally-sorted files; bucketed writer is exercised (plan shape for
bucketed joins is pinned in test_bucketed_join.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ocr_redaction_engine_spark.storage import write_bucketed, write_sorted


def test_write_sorted_disjoint_ordered_files(spark, tmp_path):
    df = spark.range(0, 10_000).select(
        (F.col("id") * 2654435761 % 10_000).alias("k"),
        F.col("id").alias("v"))
    out = str(tmp_path / "sorted")
    write_sorted(df, out, ["k"], n_partitions=8)

    back = (spark.read.parquet(out)
            .withColumn("f", F.input_file_name())
            .select("f", "k").collect())
    by_file: dict[str, list[int]] = {}
    for r in back:
        by_file.setdefault(r["f"], []).append(r["k"])
    assert len(by_file) > 1
    # each file internally sorted (parquet preserves row order per file)
    for ks in by_file.values():
        assert ks == sorted(ks)
    # files hold disjoint ranges
    spans = sorted((min(ks), max(ks)) for ks in by_file.values())
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo
    # nothing lost
    assert sum(len(ks) for ks in by_file.values()) == 10_000


def test_write_bucketed_roundtrip(spark):
    df = spark.range(0, 1000).select(
        F.concat(F.lit("m"), (F.col("id") % 97).cast("string")).alias("media_ref"),
        F.col("id").alias("v"))
    spark.sql("DROP TABLE IF EXISTS t_storage_bkt")
    try:
        write_bucketed(df, "t_storage_bkt", "media_ref", n_buckets=8)
        assert spark.table("t_storage_bkt").count() == 1000
        # bucketed agg on the bucket key: no Exchange before the final agg
        plan = (spark.table("t_storage_bkt").groupBy("media_ref").count()
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_storage_bkt")
