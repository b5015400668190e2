"""Units for the privacy layer: k-anonymity/l-diversity audit flags and
consistent surrogate substitution (including the longest-first substring
edge). DuckDB hash parity at sf0.01 is additionally enforced by the driver
gate (privacy_k_anonymity / privacy_pseudonymize)."""

from __future__ import annotations

import hashlib

from ocr_redaction_engine_spark.analytics.privacy import (
    k_anonymity_audit,
    pseudonymize,
    synth_identifiers,
)


_DIGIT_FREE = str.maketrans("0123456789", "ghijklmnop")


def _sur(v: str) -> str:
    # surrogate alphabet is digit-free so later replaces of shorter runs
    # cannot match inside an already-inserted surrogate
    return "ID_" + hashlib.md5(v.encode()).hexdigest()[:8].translate(_DIGIT_FREE)


def test_k_anonymity_flags(spark):
    rows = (
        [(i, "n%d" % i, 1, 500.0 * i, "SEG_A") for i in range(6)]   # big, diverse
        + [(10 + i, "m%d" % i, 2, 100.0, "SEG_B") for i in range(3)]  # small, uniform
    )
    df = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey int, "
              "c_acctbal double, c_mktsegment string")
    got = {(r.c_nationkey, r.c_mktsegment): (r.group_n, r.l_distinct, r.k_risk, r.l_risk)
           for r in k_anonymity_audit(df, k=5, l=3).collect()}
    # SEG_A buckets: 0,0,1,1,2,2 -> 3 distinct; n=6 -> no risk
    assert got[(1, "SEG_A")] == (6, 3, False, False)
    # SEG_B: n=3 < k, single bucket < l -> both flags
    assert got[(2, "SEG_B")] == (3, 1, True, True)


def test_pseudonymize_consistency_and_substring_edge(spark):
    rows = [
        # same id in two docs -> same surrogate; short run untouched
        ("d1", "pay 123456789 now or 123"),
        ("d2", "ref 123456789 again"),
        # "123456" also occurs inside the longer run: longest-first fold must
        # leave the long run's replacement intact
        ("d3", "a 123456 b 0012345678 c"),
        ("d4", "no identifiers here"),
        # ADVICE r2 regression: md5('100000000000')[:8] = 'df269252'. With a
        # digit-bearing surrogate alphabet, the later replace of '269252'
        # would corrupt the first surrogate into 'ID_dfID_...'. The digit-free
        # alphabet makes surrogates unmatchable by digit-run replaces.
        ("d5", "acct 100000000000 and pin 269252"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r.doc_id: (r.clean_text, r.n_ids) for r in pseudonymize(docs).collect()}
    s_long = _sur("123456789")
    assert got["d1"] == (f"pay {s_long} now or 123", 1)
    assert got["d2"] == (f"ref {s_long} again", 1)
    assert got["d3"] == (f"a {_sur('123456')} b {_sur('0012345678')} c", 2)
    assert got["d4"] == ("no identifiers here", 0)
    assert got["d5"] == (
        f"acct {_sur('100000000000')} and pin {_sur('269252')}", 2)
    assert "ID_ID" not in got["d5"][0] and "ID_dfID" not in got["d5"][0]


def test_synth_identifiers_planted_and_shared(spark):
    docs = spark.createDataFrame(
        [("d1", "alpha", "web"), ("d2", "beta", "web"), ("d3", "gamma", "books")],
        "doc_id string, text string, source string")
    out = {r.doc_id: r.text for r in synth_identifiers(docs).collect()}
    import re
    runs = {d: re.findall(r"[0-9]{6,}", t) for d, t in out.items()}
    assert all(len(v) == 2 and all(len(x) == 12 for x in v) for v in runs.values())
    # per-source id shared, per-doc id unique
    assert runs["d1"][1] == runs["d2"][1] != runs["d3"][1]
    assert len({runs[d][0] for d in runs}) == 3
    # pseudonymize maps the shared id to ONE surrogate across docs
    ps = {r.doc_id: r.clean_text for r in pseudonymize(synth_identifiers(docs)).collect()}
    shared = runs["d1"][1]
    assert _sur(shared) in ps["d1"] and _sur(shared) in ps["d2"]
