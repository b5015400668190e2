"""Driver-contract parity harness: runs every queries() entry at sf0.01 and
compares it EXACTLY (row count, column names, sorted values) against its
oracle_sql() DuckDB twin — a local preview of CORRECTNESS_r{N}.json.
Rows-only entries are smoke-checked for rows ≥ 0 and stable schema."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _norm(v):
    if isinstance(v, float):
        return float(v)
    if hasattr(v, "__float__") and not isinstance(v, (int, bool)):
        return float(v)
    return v


def _rows(cols, data):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(_norm(r[i]) for i in idx) for r in data]
    # None-safe total order (ROLLUP emits NULL group keys)
    return sorted(rows, key=lambda r: tuple((v is None, str(v)) for v in r))


def _close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=0, abs_tol=0) or a == b
    return a == b


SQL_CHECKED = sorted(entry_mod.oracle_sql().keys())
ROWS_ONLY = sorted(set(entry_mod.queries().keys()) - set(SQL_CHECKED))


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = _rows(spark_cols, [tuple(r) for r in sdf.collect()])

    res = duck.execute(entry_mod.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = _rows(duck_cols, res.fetchall())

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    for i, (a, b) in enumerate(zip(spark_rows, duck_rows)):
        assert a == b, f"{name}: first differing row #{i}: spark={a} duck={b}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert len(df.columns) > 0
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.columns == ["doc_id", "order", "kind", "text", "media_ref"]
    assert df.count() > 0
