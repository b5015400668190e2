"""Unit oracles for the main-content extraction triad (north rule: HTML
boilerplate strip, DOM heuristics, PDF/layout reading order). Tiny
hand-checked corpus here; DuckDB hash parity at sf0.01 is additionally
enforced by the driver gate (__spark_entry__.oracle_sql) and
tools/selfcheck.py."""

from __future__ import annotations

import pytest

from ocr_redaction_engine_spark.analytics.extraction import (
    as_html,
    dom_main_block,
    html_blocks,
    reading_order,
    strip_boilerplate,
)

LONG_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
SHORT = "tiny"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [("d0", LONG_A.strip()), ("d1", SHORT)]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_as_html_wraps_deterministically(docs):
    got = {r["doc_id"]: r["html"] for r in as_html(docs).collect()}
    h = got["d0"]
    assert h.startswith("<html><head><title>d0</title><script")
    assert "<nav><a href=\"/\">Home</a>" in h
    assert h.endswith("</body></html>")
    # the two content paragraphs partition the text (modulo the split point)
    assert "alpha beta gamma" in h
    # script junk derives from md5(text) → stable across calls
    assert got["d0"] == {r["doc_id"]: r["html"] for r in as_html(docs).collect()}["d0"]


def test_block_scoring_separates_content_from_chrome(docs):
    b = html_blocks(as_html(docs)).filter("doc_id = 'd0'").orderBy("pos").collect()
    # block 0 = head junk + nav: link-dense
    assert b[0]["n_links"] == 3
    assert b[0]["link_density"] > 0.2
    # blocks 1-2 = the two content paragraphs: long, zero links
    for blk in (b[1], b[2]):
        assert blk["n_links"] == 0
        assert blk["link_density"] == 0.0
        assert blk["text_len"] >= 40
    # sidebar: 18 chars of anchor text in a 20-char visible string (the two
    # inter-anchor spaces come from tag stripping) → density 0.9
    side = next(x for x in b if x["n_links"] == 3 and x["pos"] > 2)
    assert side["link_density"] == pytest.approx(0.9)


def test_strip_boilerplate_keeps_exactly_the_paragraphs(docs):
    got = {r["doc_id"]: r for r in strip_boilerplate(as_html(docs)).collect()}
    d0 = got["d0"]
    assert d0["n_kept"] == 2
    # reassembled main text is the document text with one extra space
    # inserted at the half-way paragraph cut (which may land mid-token),
    # so compare modulo whitespace
    assert d0["main_text"].replace(" ", "") == LONG_A.strip().replace(" ", "")
    # the short doc has no block passing min_len → no row at all
    assert "d1" not in got


def test_dom_main_block_picks_a_content_paragraph(docs):
    got = {r["doc_id"]: r for r in dom_main_block(as_html(docs)).collect()}
    d0 = got["d0"]
    assert d0["best_pos"] in (1, 2)  # one of the two <p> blocks
    assert d0["preview"].startswith(("alpha", "beta", "gamma", "delta", "epsilon",
                                     "zeta", "eta", "theta", "iota", "kappa"))
    assert d0["score"] >= 80  # ~85-char paragraph, zero links → score ≈ len


def test_reading_order_recovers_column_major_scan(spark):
    docs = spark.createDataFrame(
        [("p", "t0 t1 t2 t3 t4 t5")], "doc_id string, text string")
    rows = reading_order(docs).orderBy("read_pos").collect()
    # layout: col 0 holds t0,t2,t4 (rows 0,1,2), col 1 holds t1,t3,t5 —
    # column-major reading order is exactly that sequence
    assert [r["token"] for r in rows] == ["t0", "t2", "t4", "t1", "t3", "t5"]
    assert [r["orig_pos"] for r in rows] == [1, 3, 5, 2, 4, 6]
    assert [r["col_id"] for r in rows] == [0, 0, 0, 1, 1, 1]
    # y advances by row within a column
    assert [r["y"] for r in rows[:3]] == [5, 17, 29]


def test_page_metadata_fields(spark):
    from ocr_redaction_engine_spark.analytics.extraction import (
        as_html_meta, page_metadata)
    docs = spark.createDataFrame(
        [(7, "alpha beta gamma", "en"), (8, "uno dos", "es")],
        "doc_id long, text string, lang string")
    rows = {r["doc_id"]: r for r in page_metadata(as_html_meta(docs)).collect()}
    assert rows[7]["title"] == "Doc 7 - Example Site"
    assert rows[7]["description"] == "alpha beta gamma"   # < 40 chars: whole text
    assert rows[7]["canonical_url"] == "https://example.com/docs/7"
    assert rows[7]["og_locale"] == "en"
    assert rows[7]["n_meta_tags"] == 3                    # charset, description, og:locale
    assert rows[8]["og_locale"] == "es"


def test_classify_blocks_context_smoothing(spark):
    from ocr_redaction_engine_spark.analytics.extraction import classify_blocks
    good = "word " * 20            # 100 chars -> raw good
    near = "word " * 10            # 50 chars  -> raw near
    short = "tiny frag"            # 9 chars   -> raw short
    nav = '<a href="/">Home Page Links</a><a href="/b">More Nav Links</a>'
    html = (
        f"<p>{good}</p><p>{near}</p><p>{good}</p><p>{short}</p>"
        f"<p>{good}</p><nav>{nav}</nav><p>{near}</p>"
    )
    pages = spark.createDataFrame([("d", html)], "doc_id string, html string")
    rows = classify_blocks(pages).orderBy("pos").collect()
    labels = [(r["label_raw"], r["label"]) for r in rows if r["text_len"] > 0]
    assert labels == [
        ("good", "good"),
        ("near", "good"),    # flanked by raw-good on both sides
        ("good", "good"),
        ("short", "good"),   # short needs BOTH neighbors raw-good - has them
        ("good", "good"),
        ("bad", "bad"),      # link-dense nav is never promoted
        ("near", "near"),    # neighbors are bad + trailing empty: stays near
    ]


def test_classify_blocks_isolated_short_not_promoted(spark):
    from ocr_redaction_engine_spark.analytics.extraction import classify_blocks
    good = "word " * 20
    short = "tiny frag"
    # short has good on ONE side only -> stays short (near would be promoted)
    html = f"<p>{short}</p><p>{good}</p>"
    pages = spark.createDataFrame([("d", html)], "doc_id string, html string")
    rows = {r["pos"]: r for r in classify_blocks(pages).collect()}
    assert rows[0]["label_raw"] == "short" and rows[0]["label"] == "short"
    assert rows[1]["label"] == "good"


def test_extraction_eval_matches_bruteforce(spark):
    from ocr_redaction_engine_spark.analytics.extraction import (
        as_html, classify_blocks, extraction_eval)

    # mixed corpus: long docs (classifier succeeds), a tiny doc (content
    # halves too short -> false negatives), a mid doc (near-length halves)
    rows = [
        ("d0", ("alpha beta gamma delta epsilon zeta " * 5).strip()),
        ("d1", "tiny"),
        ("d2", ("word " * 22).strip()),   # halves ~54 chars -> raw near
        ("d3", ("lorem ipsum dolor sit amet " * 8).strip()),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    pages = as_html(docs)

    blocks = classify_blocks(pages).collect()
    tp = fp = fn = tn = 0
    for r in blocks:
        truth = r["pos"] in (1, 2) and r["text_len"] > 0
        pred = r["label"] == "good"
        tp += truth and pred
        fp += (not truth) and pred
        fn += truth and not pred
        tn += (not truth) and not pred

    got = extraction_eval(pages).collect()
    assert len(got) == 1
    g = got[0]
    assert (g["n_blocks"], g["tp"], g["fp"], g["fn"], g["tn"]) == (
        len(blocks), tp, fp, fn, tn)
    assert g["precision_e6"] == (tp * 1000000 // (tp + fp) if tp + fp else None)
    assert g["recall_e6"] == (tp * 1000000 // (tp + fn) if tp + fn else None)
    assert g["f1_e6"] == (
        2 * tp * 1000000 // (2 * tp + fp + fn) if 2 * tp + fp + fn else None)
    # the corpus must exercise both error cells or the test proves nothing
    assert g["tp"] > 0 and g["fn"] > 0 and g["tn"] > 0


def test_extraction_eval_perfect_on_long_docs(spark):
    from ocr_redaction_engine_spark.analytics.extraction import (
        as_html, extraction_eval)

    docs = spark.createDataFrame(
        [("a", ("alpha beta gamma delta " * 10).strip()),
         ("b", ("lorem ipsum dolor sit " * 12).strip())],
        "doc_id string, text string")
    g = extraction_eval(as_html(docs)).collect()[0]
    # both halves of both docs are >= 80 chars -> raw good; chrome blocks
    # all die on link density or length -> perfect extraction
    assert g["fp"] == 0 and g["fn"] == 0 and g["tp"] == 4
    assert g["precision_e6"] == 1000000
    assert g["recall_e6"] == 1000000
    assert g["f1_e6"] == 1000000


def test_extraction_confusion_detail_sums_to_eval(spark):
    from ocr_redaction_engine_spark.analytics.extraction import (
        as_html, extraction_confusion, extraction_eval)

    rows = [("d%d" % i, ("tok%d " % i * (4 * i + 1)).strip())
            for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    pages = as_html(docs)

    detail = extraction_confusion(pages).collect()
    g = extraction_eval(pages).collect()[0]
    assert sum(r["n_blocks"] for r in detail) == g["n_blocks"]
    assert sum(r["n_blocks"] for r in detail
               if r["is_content"] and r["label"] == "good") == g["tp"]
    assert sum(r["n_blocks"] for r in detail
               if not r["is_content"] and r["label"] == "good") == g["fp"]
    # every smoothing promotion shows up as a raw!=final cell
    for r in detail:
        if r["label_raw"] != r["label"]:
            assert r["label_raw"] in ("near", "short") and r["label"] == "good"


def test_table_recovery_exact_grid(spark):
    from ocr_redaction_engine_spark.analytics.extraction import (
        recover_table, synth_table_boxes)
    toks = " ".join(f"c{i}" for i in range(12))  # 4 rows x 3 cols
    docs = spark.createDataFrame(
        [(7, toks, "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long")
    got = {r.token: (r.row_id, r.col_id)
           for r in recover_table(synth_table_boxes(docs)).collect()}
    # token i was planted at cell (i//3, i%3); gap clustering must recover
    # exactly that despite +-3/+-5 jitter
    assert got == {f"c{i}": (i // 3, i % 3) for i in range(12)}


def test_table_recovery_ragged_and_unjittered(spark):
    from ocr_redaction_engine_spark.analytics.extraction import recover_table
    rows = [
        # hand-built boxes: 2 rows; second row misses the middle column
        (1, "a", 10, 10), (1, "b", 12, 110), (1, "c", 8, 215),
        (1, "d", 31, 12), (1, "e", 29, 212),
    ]
    boxes = spark.createDataFrame(rows, "doc_id long, token string, y long, x long")
    got = {r.token: (r.row_id, r.col_id) for r in recover_table(boxes).collect()}
    assert got == {"a": (0, 0), "b": (0, 1), "c": (0, 2),
                   "d": (1, 0), "e": (1, 2)}
