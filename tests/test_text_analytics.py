"""Unit oracles for the round-2 text-analysis additions: Gopher repetition
signals, C4 stopword stats, cross-doc n-gram contamination, exact length
percentiles. Hand-computed expectations on a tiny corpus; DuckDB hash
parity at sf0.01 is additionally enforced by the driver gate
(__spark_entry__.oracle_sql) and tools/selfcheck.py."""

from __future__ import annotations

import pytest

from ocr_redaction_engine_spark.analytics.text import (
    length_percentiles,
    ngram_contamination,
    repetition,
    stopword_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "a b a b a", "en", "s", 9),       # top token a(3)/5, bigrams: ab,ba,ab,ba → top 2/4
        (1, "x y z", "en", "s", 5),            # all distinct
        (2, "solo", "en", "s", 4),             # single token, no bigrams
        (3, "a b a b a", "en", "s", 9),        # exact dup of doc 0 (contamination)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")


def test_repetition(docs):
    got = {r["doc_id"]: r for r in repetition(docs).collect()}
    assert got[0]["top_token_frac"] == pytest.approx(3 / 5)
    assert got[0]["dup_token_frac"] == pytest.approx(1 - 2 / 5)
    assert got[0]["top_bigram_frac"] == pytest.approx(2 / 4)
    assert got[1]["top_token_frac"] == pytest.approx(1 / 3)
    assert got[1]["dup_token_frac"] == 0.0
    assert got[2]["top_bigram_frac"] == 0.0  # no bigrams → coalesced 0


def test_stopword_stats(docs):
    got = {r["doc_id"]: r for r in
           stopword_stats(docs, stopwords=["a", "b"]).collect()}
    assert got[0]["stopword_ratio"] == pytest.approx(1.0)
    assert got[1]["stopword_ratio"] == 0.0
    assert got[0]["alpha_ratio"] == pytest.approx(1.0)
    assert got[2]["max_token_len"] == 4


def test_ngram_contamination(docs):
    # 2-grams: doc0/doc3 share {a b, b a}; doc1 {x y, y z} unique; doc2 none.
    got = {r["doc_id"]: r for r in
           ngram_contamination(docs, n=2, min_docs=2).collect()}
    assert got[0]["n_grams"] == 2 and got[0]["shared_frac"] == pytest.approx(1.0)
    assert got[3]["n_grams"] == 2 and got[3]["shared_frac"] == pytest.approx(1.0)
    assert got[1]["n_grams"] == 2 and got[1]["shared_frac"] == 0.0
    assert 2 not in got  # no n-grams → no row (doc shorter than n)


def test_length_percentiles(docs):
    row = length_percentiles(docs).collect()[0]
    # n_chars sorted: [4, 5, 9, 9]; linear interpolation at (n-1)*p
    assert row["p50"] == pytest.approx(7.0)
    assert row["p10"] == pytest.approx(4.3)
    assert row["p90"] == pytest.approx(9.0)


def test_tfidf_top_terms(docs):
    from ocr_redaction_engine_spark.analytics.text import tfidf_top_terms
    got = {}
    for r in tfidf_top_terms(docs, k=2).collect():
        got.setdefault(r["doc_id"], []).append((r["rank"], r["token"], r["tf"], r["df"]))
    for v in got.values():
        v.sort()
    # doc0: a(tf 3) then b(tf 2); both df=2 (docs 0 and 3)
    assert got[0] == [(1, "a", 3, 2), (2, "b", 2, 2)]
    # doc1: tf all 1, df all 1 → alphabetical tie-break
    assert got[1] == [(1, "x", 1, 1), (2, "y", 1, 1)]
    # doc2: single token
    assert got[2] == [(1, "solo", 1, 1)]


def test_quality_filter_reasons(spark):
    from ocr_redaction_engine_spark.analytics.text import quality_filter
    rows = [
        (0, "the cat sat on the mat quietly watching birds fly", "en", "s", 0),  # clean
        (1, "spam spam spam spam spam", "en", "s", 0),      # repetitive + short
        (2, "a b supercalifragilisticexpialidocious9 c d e f g h i j", "en", "s", 0),  # long+nonalpha token
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    got = {r["doc_id"]: r for r in quality_filter(
        docs, stopwords=["the", "on"], min_tokens=6,
        max_top_token_frac=0.5, min_alpha_ratio=0.95,
        max_token_len=20, min_stopword_ratio=0.0).collect()}
    assert got[0]["keep"] and got[0]["reasons"] == ""
    assert not got[1]["keep"] and "repetitive" in got[1]["reasons"]
    assert "too_short" in got[1]["reasons"]
    r2 = got[2]["reasons"].split(",")
    assert "long_token" in r2 and "non_alpha" in r2
    assert r2 == sorted(r2)            # reasons are sorted (stable hash key)


def test_ngram_cross_contamination(spark):
    from ocr_redaction_engine_spark.analytics.text import ngram_cross_contamination
    train = spark.createDataFrame(
        [(0, "a b c d"), (1, "x y z w")], "doc_id long, text string")
    evald = spark.createDataFrame(
        [(100, "a b q r"), (101, "m n o p")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           ngram_cross_contamination(train, evald, n=2).collect()}
    # train doc 0 grams {ab, bc, cd}; eval has {ab, bq, qr, mn, no, op}
    assert got[0]["n_grams"] == 3 and got[0]["n_leaked"] == 1
    assert got[0]["leak_frac"] == round(1 / 3, 6)
    # zero-leak doc stays in the output
    assert got[1]["n_leaked"] == 0 and got[1]["leak_frac"] == 0.0


def test_bpe_pair_counts(docs):
    from ocr_redaction_engine_spark.analytics.text import bpe_pair_counts
    # Only "solo" has >=2 chars; its adjacent pairs are (s,o),(o,l),(l,o),
    # each weighted by wcount=1. Tie-break is lexicographic on (sym_a, sym_b).
    got = [(r["rank"], r["sym_a"], r["sym_b"], r["pair_count"])
           for r in bpe_pair_counts(docs, k=10).collect()]
    assert sorted(got) == [(1, "l", "o", 1), (2, "o", "l", 1), (3, "s", "o", 1)]


def test_bpe_pair_counts_weighted(spark):
    from ocr_redaction_engine_spark.analytics.text import bpe_pair_counts
    docs = spark.createDataFrame(
        [(0, "ab ab cd"), (1, "ab")], "doc_id long, text string")
    got = {(r["sym_a"], r["sym_b"]): (r["pair_count"], r["rank"])
           for r in bpe_pair_counts(docs, k=10).collect()}
    # "ab" appears 3 times corpus-wide but the pair count is weighted by the
    # distinct-word frequency, not recomputed per doc
    assert got[("a", "b")] == (3, 1)
    assert got[("c", "d")] == (1, 2)


def test_minhash_decontaminate(spark):
    from ocr_redaction_engine_spark.analytics.dedup import minhash_decontaminate
    train = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta"),
         (1, "one two three four five six"),
         (2, "alpha beta gamma delta epsilon eta")],   # near-dup of train 0 too
        "doc_id long, text string")
    evald = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta"),  # verbatim leak of 0
         (101, "seven eight nine ten")],                # clean
        "doc_id long, text string")
    got = {r.doc_id: r for r in
           minhash_decontaminate(train, evald, threshold=0.5).collect()}
    assert set(got) == {100, 101}                       # every eval doc audited
    assert got[100].n_contaminated >= 1
    assert got[100].max_jaccard == 1.0                  # the verbatim pair
    assert (got[101].n_candidates, got[101].n_contaminated,
            got[101].max_jaccard) == (0, 0, 0.0)


def test_minhash_decontaminate_no_within_corpus_pairs(spark):
    """Candidates are strictly cross-corpus: two identical TRAIN docs must
    not contaminate an unrelated eval doc."""
    from ocr_redaction_engine_spark.analytics.dedup import minhash_decontaminate
    train = spark.createDataFrame(
        [(0, "dup dup dup"), (1, "dup dup dup")], "doc_id long, text string")
    evald = spark.createDataFrame(
        [(100, "unrelated words only")], "doc_id long, text string")
    rows = minhash_decontaminate(train, evald).collect()
    assert len(rows) == 1 and rows[0].n_candidates == 0


def test_chunk_documents(spark):
    from ocr_redaction_engine_spark.analytics.text import chunk_documents
    docs = spark.createDataFrame(
        [(0, "a b c d e"), (1, "x"), (2, "   ")], "doc_id long, text string")
    got = sorted((r.doc_id, r.chunk_id, r.start_tok, r.n_tok, r.chunk_text)
                 for r in chunk_documents(docs, chunk_tokens=3, overlap=1).collect())
    assert got == [
        (0, 0, 0, 3, "a b c"),
        (0, 1, 2, 3, "c d e"),
        (0, 2, 4, 1, "e"),     # short tail chunk, no token dropped
        (1, 0, 0, 1, "x"),
        (2, 0, 0, 1, ""),      # whitespace-only doc → one empty-token chunk
    ]
    # every token index is covered by at least one chunk
    covered = set()
    for _, _, s, n, _ in got[:3]:
        covered |= set(range(s, s + n))
    assert covered == set(range(5))


def test_dsir_scores(spark):
    import math
    from ocr_redaction_engine_spark.analytics.sampling import dsir_scores
    raw = spark.createDataFrame(
        [(0, "med med med"), (1, "web web web"), (2, "med web")],
        "doc_id long, text string")
    target = spark.createDataFrame(
        [(100, "med med med med")], "doc_id long, text string")
    got = {r.doc_id: r for r in dsir_scores(raw, target, k=1).collect()}
    # independent reference: vocab {med, web}, V=2, nr=8, nt=4
    def lr(ct, cr):
        return round(math.log((ct + 1) / (4 + 2)) - math.log((cr + 1) / (8 + 2)), 6)
    exp = {0: round(3 * round(3 * lr(4, 4), 6) / 3, 6),  # 3 * lr per token
           1: round(round(3 * lr(0, 4), 6), 6),
           2: round(round(1 * lr(4, 4), 6) + round(1 * lr(0, 4), 6), 6)}
    exp[0] = round(round(3 * lr(4, 4), 6), 6)
    for d in (0, 1, 2):
        assert got[d].score == pytest.approx(exp[d], abs=2e-6), d
    # target-looking doc ranks first and is the only selected one
    assert got[0].rank == 1 and got[0].selected
    assert not got[1].selected and not got[2].selected
    assert got[0].score > got[2].score > got[1].score


def test_bpe_learn_merges(spark):
    from ocr_redaction_engine_spark.analytics.text import bpe_learn
    # corpus: "aaab" x3, "ab" x2 → pair counts: (a,a)=6, (a,b)=5 → merge 1 = (a,a)
    # then segs: [aa,a,b]x3, [a,b]x2 → (aa,a)=3, (a,b)=5 → merge 2 = (a,b)
    docs = spark.createDataFrame(
        [(0, "aaab aaab"), (1, "aaab ab ab")], "doc_id long, text string")
    assert bpe_learn(docs, n_merges=2) == [("a", "a"), ("a", "b")]


def test_bpe_encode_roundtrip_and_order(spark):
    from ocr_redaction_engine_spark.analytics.text import bpe_encode, bpe_learn
    docs = spark.createDataFrame(
        [(0, "aaab aaab"), (1, "aaab ab ab")], "doc_id long, text string")
    merges = bpe_learn(docs, n_merges=2)
    rows = bpe_encode(docs, merges).collect()
    # reassemble: pieces concatenated in (word_pos, piece_pos) order must
    # reproduce the original text exactly
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {}).setdefault(r.word_pos, {})[r.piece_pos] = r.piece
    rebuilt = {
        d: " ".join("".join(w[p] for p in sorted(w))
                    for _, w in sorted(words.items()))
        for d, words in by_doc.items()
    }
    assert rebuilt == {0: "aaab aaab", 1: "aaab ab ab"}
    # "aaab" under merges [(a,a),(a,b)] → greedy: [aa,ab]; "ab" → [ab]
    segs = {(r.doc_id, r.word_pos, r.piece_pos): r.piece for r in rows}
    assert segs[(0, 0, 0)] == "aa" and segs[(0, 0, 1)] == "ab"
    assert segs[(1, 1, 0)] == "ab" and (1, 1, 1) not in segs


def test_pmi_collocations_reference(spark):
    """Independent Counter+math.log reference with the same fixed
    parenthesization; planted collocation must rank first."""
    import math
    from collections import Counter
    from ocr_redaction_engine_spark.analytics.text import pmi_collocations
    texts = (["ice cream is nice"] * 6
             + ["milk of the crop is fine"] * 3
             + ["nice weather today is fine"] * 4
             + ["the weather of today"] * 3)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = pmi_collocations(docs, min_count=3, k=10).collect()

    uni, big = Counter(), Counter()
    for t in texts:
        ws = t.split()
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    nt, nb = sum(uni.values()), sum(big.values())
    ref = []
    for (x, y), cxy in big.items():
        if cxy >= 3:
            r = (float(cxy) * nt * nt) / (float(nb) * uni[x] * uni[y])
            ref.append((x, y, cxy, round(math.log(r), 6)))
    ref.sort(key=lambda e: (-e[3], e[0], e[1]))
    assert [(r["x"], r["y"], r["c_xy"], r["pmi"]) for r in got] == ref[:10]
    assert (got[0]["x"], got[0]["y"]) == ("ice", "cream")  # planted: only together


def test_normalize_ccnet_and_normalized_dedup(spark):
    import pyspark.sql.functions as F
    from ocr_redaction_engine_spark.analytics.text import (
        dedup_normalized, normalize_ccnet)
    cases = spark.createDataFrame(
        [("Crème Brûlée, récipe #42!",),
         ("the   quick  brown fox",),
         ("Phone: 555-123-4567",)],
        "text string").select(normalize_ccnet(F.col("text")).alias("n"))
    assert [r["n"] for r in cases.collect()] == [
        "creme brulee recipe 00",
        "the quick brown fox",
        "phone 000 000 0000",
    ]
    docs = spark.createDataFrame(
        [(1, "Hello, World!"), (2, "hello world"), (3, "HELLO   world?!"),
         (4, "goodbye world")],
        "doc_id long, text string")
    got = {r["rep_doc_id"]: r["n_members"]
           for r in dedup_normalized(docs).collect()}
    assert got == {1: 3, 4: 1}


def test_encoding_quality_signals(spark):
    from ocr_redaction_engine_spark.analytics.text import encoding_quality
    docs = spark.createDataFrame(
        [(1, "clean ascii text"),
         (2, "broken � here"),
         (3, "cafÃ© mojibake"),
         (4, "bell \x07 char"),
         (5, "é è ü ç ñ à"),          # heavy non-ASCII, no corruption
         (6, "mostly ascii with one é of many many words here")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in encoding_quality(docs).collect()}
    assert got[1]["keep"] and got[1]["n_repl"] == 0
    assert not got[2]["keep"] and got[2]["n_repl"] == 1
    assert not got[3]["keep"] and got[3]["n_mojibake"] == 1
    assert not got[4]["keep"] and got[4]["n_ctrl"] == 1
    assert not got[5]["keep"] and got[5]["nonascii_frac"] > 0.3
    assert got[6]["keep"] and 0 < got[6]["nonascii_frac"] <= 0.3


def test_profile_table(spark):
    from ocr_redaction_engine_spark.analytics.text import profile_table
    df = spark.createDataFrame(
        [(1, "aa", None), (2, "bb", 5), (3, "aa", 7), (None, None, 7)],
        "id long, s string, v long")
    got = {r["column"]: r for r in profile_table(df).collect()}
    assert got["id"]["n_rows"] == 4 and got["id"]["n_nulls"] == 1
    assert got["id"]["n_distinct"] == 3
    assert (got["id"]["min_value"], got["id"]["max_value"]) == ("1", "3")
    assert got["s"]["n_distinct"] == 2 and got["s"]["n_nulls"] == 1
    assert got["v"]["n_distinct"] == 2 and got["v"]["min_value"] == "5"


def test_length_outliers_mad(spark):
    from ocr_redaction_engine_spark.analytics.text import length_outliers
    rows = ([(i, "s", 100 + i % 5) for i in range(20)]     # tight cluster
            + [(100, "s", 5000),                            # wild outlier
               (200, "t", 10), (201, "t", 1000)])           # 2-row group
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = {r["doc_id"]: r for r in length_outliers(docs).collect()}
    assert got[100]["is_outlier"]
    assert all(not got[i]["is_outlier"] for i in range(20))
    # 2-row group: med/mad are midpoints; both rows sit exactly at 1*mad -> kept
    assert got[200]["med"] == 505.0 and got[200]["mad"] == 495.0
    assert not got[200]["is_outlier"] and not got[201]["is_outlier"]


def test_source_kl_divergence_reference(spark):
    import math
    from collections import Counter
    from ocr_redaction_engine_spark.analytics.text import source_kl_divergence
    rows = [(0, "a a b c", "s1"), (1, "a b b d", "s1"),
            (2, "x x x y", "s2"), (3, "a b c d", "s3")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: (r["n_tokens"], r["kl"])
           for r in source_kl_divergence(docs).collect()}

    per, marg = {}, Counter()
    for _, t, s in rows:
        per.setdefault(s, Counter()).update(t.split())
        marg.update(t.split())
    n_total = sum(marg.values())
    for s, cnt in per.items():
        n_s = sum(cnt.values())
        kl = round(sum(
            round((c / n_s) * math.log((float(c) * n_total) / (float(n_s) * marg[t])), 9)
            for t, c in cnt.items()), 6)
        assert got[s] == (n_s, kl)
    # the skewed source drifts hardest from the corpus marginal
    assert got["s2"][1] > got["s1"][1] and got["s2"][1] > got["s3"][1]
    assert got["s3"][1] >= 0  # KL is non-negative


def test_char_entropy_reference(spark):
    import math
    from collections import Counter
    from ocr_redaction_engine_spark.analytics.text import char_entropy
    texts = ["aaaa", "abab", "the quick brown fox", "a"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r["doc_id"]: r for r in char_entropy(docs).collect()}
    for i, t in enumerate(texts):
        n = len(t)
        cnt = Counter(t)
        ref = round(sum(round((c / n) * math.log(n / c), 9)
                        for c in cnt.values()), 6)
        assert got[i]["entropy_nats"] == ref
        assert got[i]["n_distinct_chars"] == len(cnt)
    assert got[0]["entropy_nats"] == 0.0          # single-symbol run
    assert got[1]["entropy_nats"] == round(math.log(2), 6)
    assert got[2]["entropy_nats"] > got[1]["entropy_nats"] > got[0]["entropy_nats"]


def test_gopher_line_stats_match_pure_python(spark):
    import hashlib

    from ocr_redaction_engine_spark.analytics.text import gopher_line_stats

    rows = [("gd%d" % i, " ".join("tok%d" % (j * 31 % 17) for j in range(5 + i * 7)))
            for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r.doc_id: r for r in gopher_line_stats(docs).collect()}

    for doc_id, text in rows:
        tk = text.split(" ")
        lines = []
        for i in range((len(tk) + 7) // 8):
            d = int(hashlib.md5(f"{doc_id}:ln:{i}".encode()).hexdigest()[0], 16)
            body = " ".join(tk[i * 8:(i + 1) * 8])
            pre = "- " if d < 3 else ""
            suf = "..." if 3 <= d <= 4 else ("." if 5 <= d <= 10 else "")
            lines.append(pre + body + suf)
        n = len(lines)
        r = got[doc_id]
        assert r.n_lines == n
        assert r.bullet_frac == round(sum(x.startswith("- ") for x in lines) / n, 6)
        assert r.ellipsis_frac == round(sum(x.endswith("...") for x in lines) / n, 6)
        assert r.punct_end_frac == round(sum(x.endswith(".") for x in lines) / n, 6)
        assert r.dup_line_frac == round(1.0 - len(set(lines)) / n, 6)
        b = sum(x.startswith("- ") for x in lines) / n
        e = sum(x.endswith("...") for x in lines) / n
        assert r.keep == (b <= 0.9 and e <= 0.3)


def test_langid_confusion_rows_sum_and_shares(spark):
    """Cross-tab rows per label sum to the label's doc count; shares are
    integer bp of the row total."""
    from collections import Counter

    from ocr_redaction_engine_spark.analytics.text import langid, langid_confusion

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    preds = [(r.lang, r.lang_guess) for r in langid(docs).collect()]
    expect = Counter(preds)
    row_totals = Counter(l for l, _ in preds)
    got = {(r.lang, r.lang_guess): (r.n, r.share_bp)
           for r in langid_confusion(docs).collect()}
    assert {k: v[0] for k, v in got.items()} == dict(expect)
    for (lang, guess), (n, bp) in got.items():
        assert bp == n * 10000 // row_totals[lang]


def test_tokenizer_fertility_by_lang(spark):
    from ocr_redaction_engine_spark.analytics.text import (
        bpe_learn, tokenizer_fertility)
    # merges learned on the corpus below: (a,a) then (a,b) (see
    # test_bpe_learn_merges). Segmentations: "aaab"→[aa,ab], "ab"→[ab].
    docs = spark.createDataFrame(
        [(0, "aaab aaab", "en"), (1, "aaab ab ab", "fr")],
        "doc_id long, text string, lang string")
    merges = bpe_learn(docs, n_merges=2)
    got = {r.lang: r for r in tokenizer_fertility(docs, merges).collect()}
    # en: 2 words ("aaab" x2) → 4 pieces, 8 chars
    assert (got["en"].n_words, got["en"].n_pieces, got["en"].n_chars) == (2, 4, 8)
    assert got["en"].fertility_e6 == 2_000_000          # 2 pieces/word
    assert got["en"].continuation_bp == 5000            # half the pieces continue
    assert got["en"].chars_per_piece_e6 == 2_000_000
    # fr: 3 words (aaab, ab, ab) → 2+1+1 = 4 pieces, 8 chars
    assert (got["fr"].n_words, got["fr"].n_pieces, got["fr"].n_chars) == (3, 4, 8)
    assert got["fr"].fertility_e6 == 4_000_000 // 3     # 1333333
    assert got["fr"].continuation_bp == (4 - 3) * 10000 // 4
    assert got["fr"].chars_per_piece_e6 == 2_000_000
    # output ordered by group
    order = [r.lang for r in tokenizer_fertility(docs, merges).collect()]
    assert order == ["en", "fr"]


def test_quality_funnel_first_fail_attribution(spark):
    """Docs failing multiple rules count ONLY at their first failing stage;
    stage sums reconcile with survivors; zero-kill rules still emit."""
    from ocr_redaction_engine_spark.analytics.text import quality_funnel
    rows = [
        (0, "the a of to in is and an the a of to", "en", "s", 1),  # clean, 12 toks
        (1, "x", "en", "s", 1),                                     # too_short (1 tok)
        (2, "b b b b b b b b b b the a of",         "en", "s", 1),  # repetitive
        (3, "the a of C4 99 !! ## $$ %% ^^ && **",  "en", "s", 1),  # non_alpha
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    got = {r.rule: r for r in quality_funnel(
        docs, min_tokens=10, max_top_token_frac=0.5,
        min_alpha_ratio=0.8, max_token_len=20,
        min_stopword_ratio=0.05).collect()}
    assert [got[k].stage for k in
            ("too_short", "repetitive", "non_alpha", "long_token",
             "no_stopwords")] == [1, 2, 3, 4, 5]
    # doc 1 dies at too_short (even though it would also fail no_stopwords)
    assert got["too_short"].n_rejected == 1
    assert got["repetitive"].n_rejected == 1
    assert got["non_alpha"].n_rejected == 1
    assert got["long_token"].n_rejected == 0
    assert got["no_stopwords"].n_rejected == 0
    # survivors march down: 4 docs - 1 - 1 - 1 = 1 kept
    assert [got[k].n_surviving for k in
            ("too_short", "repetitive", "non_alpha", "long_token",
             "no_stopwords")] == [3, 2, 1, 1, 1]
    assert got["too_short"].rejected_share_bp == 2500


def test_zipf_fit_matches_ols_mirror(spark):
    from ocr_redaction_engine_spark.analytics.text import zipf_fit
    import math
    docs = spark.createDataFrame(
        [(1, " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["once"]), "en", "s0", 1)],
        "doc_id long, text string, lang string, source string, n_chars long")
    got = zipf_fit(docs, top_n=200, min_count=2).collect()
    assert len(got) == 1
    r = got[0]
    # ranks: a(8)=1, b(4)=2, c(2)=3; 'once' dropped by min_count
    pts = [(1, 8), (2, 4), (3, 2)]
    xs = [round(math.log(rk), 6) for rk, _ in pts]
    ys = [round(math.log(c), 6) for _, c in pts]
    sx = round(sum(xs), 6); sy = round(sum(ys), 6)
    sxy = round(sum(round(x * y, 6) for x, y in zip(xs, ys)), 6)
    sxx = round(sum(round(x * x, 6) for x in xs), 6)
    n = 3
    slope = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
    intercept = round((sy - slope * sx) / n, 6)
    assert (r.n_terms, r.slope, r.intercept) == (3, slope, intercept)
    assert -1.4 < r.slope < -0.8  # zipf-ish decay


def test_zipf_fit_needs_three_points(spark):
    from ocr_redaction_engine_spark.analytics.text import zipf_fit
    docs = spark.createDataFrame(
        [(1, "x x y y", "en", "tiny", 1)],
        "doc_id long, text string, lang string, source string, n_chars long")
    assert zipf_fit(docs).count() == 0  # 2 qualifying tokens < 3 points


def test_source_overlap_asymmetric_containment(spark):
    from ocr_redaction_engine_spark.analytics.text import source_overlap
    small = "one two three four five six"            # 2 distinct 5-grams
    big = small + " seven eight nine ten eleven"     # contains both + more
    docs = spark.createDataFrame(
        [(1, small, "en", "sA", 1), (2, big, "en", "sB", 1),
         (3, "totally different words here entirely now", "en", "sC", 1)],
        "doc_id long, text string, lang string, source string, n_chars long")
    got = {(r.src_a, r.src_b): r for r in source_overlap(docs, n=5).collect()}
    ab = got[("sA", "sB")]
    assert (ab.inter, ab.n_a, ab.n_b) == (2, 2, 7)
    assert ab.cont_a_bp == 10000          # sA fully contained in sB
    assert ab.cont_b_bp == 2 * 10000 // 7
    assert ("sA", "sC") not in got and ("sB", "sC") not in got


def test_readability_flesch_mirror(spark):
    from ocr_redaction_engine_spark.analytics.text import readability
    import re
    text = "The cat sat on the mat. It was very happy!"
    docs = spark.createDataFrame(
        [(1, text, "en", "s0", 1)],
        "doc_id long, text string, lang string, source string, n_chars long")
    r = readability(docs).collect()[0]
    words = len(text.split())
    sents = len(re.findall(r"[.!?]+", text))
    syll = len(re.findall(r"[aeiouy]+", text.lower()))
    flesch = round(206.835 - 1.015 * words / sents - 84.6 * syll / words, 6)
    assert (r.n_words, r.n_sents, r.n_syll, r.flesch) == (
        words, sents, syll, flesch)
    assert r.band == ("easy" if flesch >= 60 else
                      "medium" if flesch >= 30 else "hard")


def test_heaps_fit_matches_mirror(spark):
    from ocr_redaction_engine_spark.analytics.text import heaps_fit
    import math, random
    rng = random.Random(3)
    # zipf-ish corpus: doc i draws 20 tokens from a rank-weighted vocab
    vocab = [f"w{j}" for j in range(200)]
    rows = []
    for i in range(32):
        toks = [vocab[min(int(rng.paretovariate(1.2)) - 1, 199)]
                for _ in range(20)]
        rows.append((i, " ".join(toks), "en", "s", 1))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    got = heaps_fit(docs, n_buckets=8).collect()[0]

    # pure-python mirror: bucket width = ceil(32/8) = 4
    width = 4
    mass, first = {}, {}
    for i, text, *_ in rows:
        bk = i // width
        ts = text.split()
        mass[bk] = mass.get(bk, 0) + len(ts)
        for t in ts:
            if t not in first or first[t] > bk:
                first[t] = bk
    newv = {}
    for t, bk in first.items():
        newv[bk] = newv.get(bk, 0) + 1
    pts, ct, cv = [], 0, 0
    for bk in sorted(mass):
        ct += mass[bk]; cv += newv.get(bk, 0)
        if ct > 0 and cv > 0:
            pts.append((round(math.log(ct), 6), round(math.log(cv), 6)))
    n = len(pts)
    sx = round(sum(p[0] for p in pts), 6); sy = round(sum(p[1] for p in pts), 6)
    sxy = round(sum(round(p[0] * p[1], 6) for p in pts), 6)
    sxx = round(sum(round(p[0] * p[0], 6) for p in pts), 6)
    beta = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
    ln_k = round((sy - beta * sx) / n, 6)
    assert (got.n_points, got.beta, got.ln_k) == (n, beta, ln_k)
    assert 0.0 < got.beta < 1.0  # sublinear vocab growth


def test_code_detection_routes_code_and_prose(spark):
    from ocr_redaction_engine_spark.analytics.text import code_detection
    code = ("def f(x): return x[1] + g(x); import os; "
            "for i in y: if i == 2: while (a) { b[0] = 3; } class C1:")
    prose = "the quiet afternoon settled over the village as readers gathered"
    docs = spark.createDataFrame(
        [(1, code, "en", "s", 1), (2, prose, "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long")
    got = {r.doc_id: r for r in code_detection(docs).collect()}
    assert got[1]["class"] == "code" and got[1].score >= 2
    assert got[2]["class"] == "prose" and got[2].score == 0
    # mirror the integer densities for the code doc
    n = len(code)
    sym = sum(code.count(c) for c in "{}();=[]<>")
    assert got[1].sym_bp == sym * 10000 // n
    kw = sum(1 for t in code.split()
             if t in ("def", "return", "import", "class", "void", "int",
                      "function", "var", "const", "if", "else", "for",
                      "while"))
    assert got[1].kw_hits == kw


def test_burstiness_separates_bursty_from_uniform(spark):
    from ocr_redaction_engine_spark.analytics.text import burstiness
    rows = []
    # 'the' once per doc (uniform); 'llama' 5x in 2 docs only (bursty)
    for i in range(10):
        text = "the filler words here"
        if i < 2:
            text += " " + " ".join(["llama"] * 5)
        rows.append((i, text, "en", "s", 1))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    got = {r.tok: r for r in burstiness(docs, top_n=10, min_docs=2).collect()}
    D = 10
    # 'the': c_i = 1 in all 10 docs; T=10, sumsq=10
    # vmr_e6 = (10*10 - 100)*1e6 // (10*10) = 0
    assert (got["the"].n_docs, got["the"].total, got["the"].vmr_e6) == (10, 10, 0)
    assert got["the"].mean_e6 == 1_000_000
    # 'llama': T=10, sumsq=50 -> (10*50-100)*1e6 // (10*10) = 4e6
    assert (got["llama"].n_docs, got["llama"].total) == (2, 10)
    assert got["llama"].vmr_e6 == 4_000_000
    assert got["llama"].vmr_e6 > got["the"].vmr_e6


def test_vocab_coverage_curve(spark):
    from ocr_redaction_engine_spark.analytics.text import vocab_coverage
    docs = spark.createDataFrame(
        [(1, "a a a a b b c d", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long")
    got = {r.vocab_k: (r.covered, r.total, r.coverage_bp)
           for r in vocab_coverage(docs, ks=(1, 2, 100)).collect()}
    # freq: a=4, b=2, c=1, d=1 (ties by token asc); total 8
    assert got[1] == (4, 8, 5000)
    assert got[2] == (6, 8, 7500)
    # k beyond the vocab clamps to all 4 types -> full mass
    assert got[100] == (8, 8, 10000)


def test_heaps_fit_empty_corpus_returns_empty(spark):
    """Empty input yields an empty (n_points, beta, ln_k) frame instead of
    crashing on int(None) from the null min/max (ADVICE r3)."""
    from ocr_redaction_engine_spark.analytics.text import heaps_fit
    docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long")
    out = heaps_fit(docs, n_buckets=8)
    assert out.columns == ["n_points", "beta", "ln_k"]
    assert out.count() == 0
