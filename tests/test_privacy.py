"""Units for the privacy layer: k-anonymity/l-diversity audit flags and
consistent surrogate substitution (including the longest-first substring
edge). DuckDB hash parity at sf0.01 is additionally enforced by the driver
gate (privacy_k_anonymity / privacy_pseudonymize)."""

from __future__ import annotations

import hashlib

from ocr_redaction_engine_spark.analytics.privacy import (
    seeded_noise_counts,
    t_closeness_audit,
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


def test_t_closeness_emd(spark):
    # global buckets over acctbal/1000: values 0,1000,2000,3000 -> b in
    # {0,1,2,3}, one row each per group layout below (m=4, N=8)
    rows = (
        # group A mirrors the global distribution exactly -> EMD 0
        [(i, "a%d" % i, 1, 1000.0 * i, "SEG_A") for i in range(4)]
        # group B is all-mass-on-b=3 (skewed) -> large EMD
        + [(10 + i, "b%d" % i, 2, 3000.0, "SEG_B") for i in range(4)]
    )
    df = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey int, "
              "c_acctbal double, c_mktsegment string")
    got = {(r.c_nationkey, r.c_mktsegment): (r.group_n, r.emd_e6, r.t_risk)
           for r in t_closeness_audit(df, sens_bucket=1000, t_e6=250000).collect()}
    # global cum (of 8): 1,2,3,4 then +4 at b=3 -> cum_glob = 1,2,3,8... wait
    # per-bucket global counts: b0:1 b1:1 b2:1 b3:5 -> cum 1,2,3,8
    # group A (n=4) cum: 1,2,3,4; terms |cum_g*8 - cum_glob*4| for b0..b3:
    # |8-4|+|16-8|+|24-12|+|32-32| = 4+8+12+0 = 24 -> emd_e6 =
    # 24*1e6/(4*8*3) = 250000 (not > t)
    assert got[(1, "SEG_A")] == (4, 250000, False)
    # group B cum: 0,0,0,4; terms |0-4|+|0-8|+|0-12|+|32-32|=24? no:
    # |0*8-1*4|+|0-2*4|+|0-3*4|+|4*8-8*4| = 4+8+12+0 = 24 -> also 250000
    assert got[(2, "SEG_B")] == (4, 250000, False)


def test_t_closeness_skew_flags(spark):
    # 9 rows at b=0 and 1 at b=9 globally; group X holds only the outlier
    rows = [(i, "c%d" % i, 1, 0.0, "S") for i in range(9)] + \
           [(99, "x", 2, 9000.0, "S")]
    df = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey int, "
              "c_acctbal double, c_mktsegment string")
    got = {r.c_nationkey: (r.group_n, r.emd_e6, r.t_risk)
           for r in t_closeness_audit(df, sens_bucket=1000, t_e6=250000).collect()}
    # buckets present: {0, 9} -> m=2, N=10, cum_glob = 9, 10
    # group X (n=1) cum: 0,1 -> |0*10-9*1| + |10-10| = 9
    # emd_e6 = 9*1e6/(1*10*1) = 900000 -> flagged
    assert got[2] == (1, 900000, True)
    # group S (n=9) cum: 9,9 -> |90-81| + |90-90| = 9 -> 9e6/(9*10) = 100000
    assert got[1] == (9, 100000, False)


def test_seeded_noise_counts_deterministic_and_clamped(spark):
    import hashlib
    docs = spark.createDataFrame(
        [(i, "t", "en", "web", 1) for i in range(100)]
        + [(100, "t", "xx", "rare", 1)],
        "doc_id long, text string, lang string, source string, n_chars long")
    got = {(r.lang, r.source): r.noisy_n
           for r in seeded_noise_counts(docs, seed="dp1").collect()}

    def noise(lang, src):
        h = hashlib.md5(f"dp1:{lang}:{src}".encode()).hexdigest()[:15]
        return bin(int(h, 16)).count("1") - 30
    assert got[("en", "web")] == max(0, 100 + noise("en", "web"))
    # the 1-row group is clamped at zero if the draw goes negative enough
    assert got[("xx", "rare")] == max(0, 1 + noise("xx", "rare"))
    # rerun with the same seed is bit-identical (no fresh budget spend)
    again = {(r.lang, r.source): r.noisy_n
             for r in seeded_noise_counts(docs, seed="dp1").collect()}
    assert again == got
    # a different seed is its own (still deterministic) draw
    def noise2(lang, src):
        h = hashlib.md5(f"dp2:{lang}:{src}".encode()).hexdigest()[:15]
        return bin(int(h, 16)).count("1") - 30
    other = {(r.lang, r.source): r.noisy_n
             for r in seeded_noise_counts(docs, seed="dp2").collect()}
    assert other == {(l, s): max(0, (100 if l == "en" else 1) + noise2(l, s))
                     for (l, s) in got}


def test_t_closeness_empty_input(spark):
    df = spark.createDataFrame(
        [], "c_custkey long, c_name string, c_nationkey int, "
            "c_acctbal double, c_mktsegment string")
    out = t_closeness_audit(df)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "c_nationkey", "c_mktsegment", "group_n", "emd_e6", "t_risk"]


def test_t_closeness_bucket_domain_guard(spark):
    import pytest
    # sens_bucket=1 over a wide-spread attribute -> bucket per distinct value
    rows = [(i, "c", 1, float(i * 7), "S") for i in range(11000)]
    df = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey int, "
              "c_acctbal double, c_mktsegment string")
    with pytest.raises(ValueError, match="sensitive buckets"):
        t_closeness_audit(df, sens_bucket=1)
