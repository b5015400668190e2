"""VERDICT r2 missing #2: production loaders for the places dictionary —
file (txt/csv/json) and Spark-table variants — including an end-to-end
pipeline run on a file-loaded dictionary matched against the pure-Python
oracle under the same list."""

from __future__ import annotations

import pytest

from ocr_redaction_engine_spark import oracle
from ocr_redaction_engine_spark.pipeline import PipelineConfig, run_pipeline
from ocr_redaction_engine_spark.places import (
    PLACES_LIST, load_places, load_places_df)


def test_load_places_txt_csv_json_agree(tmp_path):
    entries = ["Mumbai", "Dhule", "Latur"]
    txt = tmp_path / "places.txt"
    txt.write_text("# city dictionary\n\nMumbai\n  Dhule \nmumbai\nLatur\n")
    csvf = tmp_path / "places.csv"
    csvf.write_text("id,place\n1,Mumbai\n2,Dhule\n3,mumbai\n4,Latur\n")
    jsn = tmp_path / "places.json"
    jsn.write_text('["Mumbai", "Dhule", "mumbai", "Latur"]')
    # all formats: stripped, case-insensitively de-duplicated, order kept
    assert load_places(str(txt)) == entries
    assert load_places(str(csvf)) == entries
    assert load_places(str(jsn)) == entries


def test_load_places_error_cases(tmp_path):
    empty = tmp_path / "empty.txt"
    empty.write_text("# nothing but comments\n\n")
    with pytest.raises(ValueError, match="empty places dictionary"):
        load_places(str(empty))
    badcsv = tmp_path / "bad.csv"
    badcsv.write_text("id,city\n1,Mumbai\n")
    with pytest.raises(ValueError, match="'place' column"):
        load_places(str(badcsv))
    badjson = tmp_path / "bad.json"
    badjson.write_text('{"not": "an array"}')
    with pytest.raises(ValueError, match="must be an array"):
        load_places(str(badjson))


def test_load_places_df_collects_and_dedupes(spark):
    df = spark.createDataFrame(
        [("Mumbai",), ("dhule",), ("Mumbai",), (None,), ("  Latur ",)],
        "place string")
    assert load_places_df(df) == ["dhule", "Latur", "Mumbai"]


def test_pipeline_end_to_end_on_file_loaded_dictionary(
        spark, corpus_dfs, local_corpus, tmp_path):
    """The reference-parity path a production adopter takes: export the full
    dictionary to a file, load_places() it, run the pipeline — outputs must
    equal the pure-Python oracle under the SAME loaded list, and the file
    round-trip must be lossless vs the in-repo default dictionary."""
    f = tmp_path / "full_places.txt"
    f.write_text("# exported dictionary\n" + "\n".join(PLACES_LIST) + "\n")
    loaded = load_places(str(f))
    assert loaded == PLACES_LIST  # lossless round-trip

    docs, pages = local_corpus
    docs_df, pages_df = corpus_dfs
    outs = run_pipeline(docs_df, pages_df,
                        PipelineConfig(level=1, places=loaded))
    got_vals = sorted((r.doc_id, r.media_ref, r.field, r.value)
                      for r in outs["values"].collect())
    _, exp_vals = oracle.expected_page_outputs(docs, pages, level=1,
                                               places=loaded)
    assert got_vals == sorted(exp_vals)
    # the dictionary is live: address fields appear
    dict_fields = ("Aadhaar Address", "E-Aadhaar Address",
                   "Driving License Address")
    assert any(fld in dict_fields and v for _, _, fld, v in got_vals)


def test_load_places_df_order_col_file_parity(spark, tmp_path):
    """With an explicit position column the DF loader reproduces file order
    exactly (ordering is observable: the kernel appends per matching place
    in dictionary order)."""
    from ocr_redaction_engine_spark.places import load_places
    f = tmp_path / "places.txt"
    f.write_text("Zunheboto\nAgra\nMumbai\n")
    from_file = load_places(str(f))
    df = spark.createDataFrame(
        [("Mumbai", 2), ("Zunheboto", 0), ("Agra", 1)], "place string, pos int")
    assert load_places_df(df, order_col="pos") == from_file == [
        "Zunheboto", "Agra", "Mumbai"]


def test_place_candidates_nonliteral_fallback():
    """ADVICE r4: the str.find literal prefilter is only sound for
    plain-ASCII metachar-free places; a regex-metachar or non-ASCII place
    must take the union-regex fallback so the candidate set still covers
    everything the inner IGNORECASE ``_ci(place).search`` test matches."""
    from ocr_redaction_engine_spark.kernel import (
        _place_candidates, _places_address, _places_literal_ok)

    words = [[0, 0, 10, 10, "Pune"], [0, 20, 10, 30, "Madrid"],
             [0, 40, 10, 50, "zzz"], [0, 60, 10, 70, "Münster"]]

    # literal list: fast path, exact candidates
    assert _places_literal_ok(("Pune", "Madrid"))
    assert _place_candidates(words, ["Pune", "Madrid"]) == [0, 1]

    # metachar place: 'P.ne' regex-matches 'Pune' — fast path would treat
    # the dot as a literal and miss it; the fallback must include index 0
    assert not _places_literal_ok(("P.ne",))
    assert _place_candidates(words, ["P.ne"]) == [0]
    got = _places_address(words, "Aadhaar Address", places=["P.ne"])
    assert got["value"].strip() == "Pune"

    # non-ASCII case folding: 'MÜNSTER' IGNORECASE-matches 'Münster', but
    # lower()-based str.find would still work only by accident of Python's
    # casefold — the guard routes it through the regex union regardless
    assert not _places_literal_ok(("MÜNSTER",))
    assert _place_candidates(words, ["MÜNSTER"]) == [3]

    # uncompilable pattern: degrade to all indices; the inner loop then
    # raises on the same bad pattern exactly like the reference would
    assert _place_candidates(words, ["(["]) == [0, 1, 2, 3]
