"""Materialize a deterministic sf1 dataset (10x sf0.1) for the heavy-set
scale step (VERDICT r4 #6).

Method: each table is the UNION of 10 replicas of the sf0.1 parquet with
primary/foreign id columns offset by ``k * 10^9`` per replica k — join keys
stay consistent within a replica (orderkey↔orderkey, doc_id↔vec_id), and
id-dedup semantics stay meaningful (no two replicas share a doc_id).
Non-key attributes are left byte-identical. Correctness evidence is
engine-vs-oracle: Spark and DuckDB read the SAME files, so any
deterministic content works; the scale is what's under test (~3.6 M docs,
~60 M lineitem rows).

DuckDB does the replication (single-file parquet per table, stable row
order irrelevant — the comparison hash is order-insensitive).

Usage: python tools/make_sf1.py [out_dir]   (default /tmp/sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
# replica count: 10 = the sf1 decade. The two pair-join giants
# (prefix-Jaccard, SimHash bands) see pair counts grow ~K^2 under the
# replica structure, so a smaller K gives them a tractable scale step
# (K=3 ~ 9x pairs) when the K=10 output exceeds the verification window.
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10
OFF = 10**9

# id-like columns to offset per replica (everything else copied verbatim);
# small dimension tables (region/nation/customer/supplier/part) are NOT
# replicated — fact rows across replicas reference the same dimensions,
# which is exactly how a warehouse grows (facts 10x, dims fixed).
REPLICATE = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONLY = ["region", "nation", "customer", "supplier", "part"]


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in COPY_ONLY:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
        print(f"copied {t}")
    for t, keys in REPLICATE.items():
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchall()]
        selects = []
        for k in range(K):
            exprs = []
            for c in cols:
                if c in keys:
                    exprs.append(f"{c} + {k * OFF} AS {c}")
                elif t == "embeddings" and c == "embedding" and k > 0:
                    # deterministic per-replica nudge on the first component:
                    # without it every vector exists 10x bit-identically and
                    # centroid-based ops (SemDeDup) degenerate into
                    # mega-clusters of exact copies
                    exprs.append(
                        "CAST(list_concat([CAST(embedding[1] + "
                        f"{k} * 0.001 AS FLOAT)], embedding[2:]) "
                        "AS FLOAT[]) AS embedding")
                else:
                    exprs.append(c)
            selects.append(
                f"SELECT {', '.join(exprs)} "
                f"FROM read_parquet('{SRC}/{t}.parquet')")
        union = " UNION ALL ".join(selects)
        con.execute(f"COPY ({union}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')"
        ).fetchone()[0]
        print(f"replicated {t} x{K}: {n} rows")
    print(f"sf1 at {OUT}")


if __name__ == "__main__":
    main()
