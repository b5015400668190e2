"""BM25 ranked retrieval: differential vs an independent pure-Python
reference (math.log, dict counters), plus plan shape."""
from __future__ import annotations

import math

import pytest

from ocr_redaction_engine_spark.analytics.search import bm25_topk, postings

DOCS = [
    (0, "hash join hash join scan"),
    (1, "scan scan scan filter"),
    (2, "join merge sort window"),
    (3, "hash table probe build side"),
    (4, "filter filter pushdown scan scan scan scan"),
]
QUERIES = ["hash join", "scan filter"]


def _ref_bm25(k1=1.2, b=0.75, k=10):
    """Independent reference: same formula, different implementation path
    (per-term rounding matches the engine's cross-engine determinism rule)."""
    toks = {d: t.split() for d, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for qi, q in enumerate(QUERIES):
        scores = {}
        for d, t in toks.items():
            s = 0.0
            for term in dict.fromkeys(q.split()):
                tf = t.count(term)
                if not tf:
                    continue
                df = sum(1 for tt in toks.values() if term in tt)
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                contrib = idf * (tf * (k1 + 1)) / (
                    tf + k1 * (1 - b + b * len(t) / avgdl))
                s += round(contrib, 6)
            if s:
                scores[d] = round(s, 6)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[qi] = [(d, s, r + 1) for r, (d, s) in enumerate(ranked)]
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_postings_tf_dl(docs):
    got = {(r["doc_id"], r["term"]): (r["tf"], r["dl"])
           for r in postings(docs).collect()}
    assert got[(0, "hash")] == (2, 5)
    assert got[(4, "scan")] == (4, 7)
    assert (1, "hash") not in got


def test_bm25_matches_reference(docs):
    got = {}
    for r in bm25_topk(docs, QUERIES, k=10).collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["score"], r["rank"]))
    for v in got.values():
        v.sort(key=lambda x: x[2])
    exp = _ref_bm25()
    assert set(got) == {0, 1}
    for qi in exp:
        assert [(d, r) for d, _, r in got[qi]] == [(d, r) for d, _, r in exp[qi]]
        for (_, s_got, _), (_, s_exp, _) in zip(got[qi], exp[qi]):
            assert s_got == pytest.approx(s_exp, abs=1e-6)


def test_bm25_plan_has_no_bnl_and_one_shuffle_family(docs):
    plan = bm25_topk(docs, QUERIES)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_phrase_search_semantics(spark):
    from ocr_redaction_engine_spark.analytics.search import phrase_search
    docs = spark.createDataFrame(
        [(1, "hash join is a hash join thing"),
         (2, "join hash"),                    # reversed: no match
         (3, "value value value"),            # overlapping repeated-term hits
         (4, "hash"),                         # partial: no match
         (5, "  hash join  ")],               # trim/split robustness
        "doc_id long, text string")
    out = phrase_search(docs, ["hash join", "value value"]).collect()
    got = {(r["phrase"], r["doc_id"]): (r["n_occurrences"], r["first_start"])
           for r in out}
    assert got == {
        ("hash join", 1): (2, 0),
        ("hash join", 5): (1, 0),
        ("value value", 3): (2, 0),   # starts 0 and 1 — overlaps both count
    }
    # a repeated-term phrase can't fire on a single token: distinct slots
    assert ("value value", 4) not in got and ("hash join", 2) not in got
