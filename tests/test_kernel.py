"""Unit tests for the pure semantics kernel — predicate truth tables and the
output-affecting quirks pinned one by one (SURVEY.md §5.2 item 2)."""

from __future__ import annotations

from ocr_redaction_engine_spark import kernel


def W(tokens, y=10):
    """Build word tuples on one synthetic line."""
    words, x = [], 15
    for t in tokens:
        w = 9 * len(t) + 6
        words.append((x, y, x + w, y + 24, t))
        x += w + 12
    return words


# --- identification -------------------------------------------------------

def test_identify_priority_order():
    # a token set matching both CDSL and DL banks → CDSL wins (ordered list,
    # process_ocrr.py:28)
    assert kernel.identify_page(["KYC", "DRIVING"]) == "CDSL"
    assert kernel.identify_page(["DRIVING"]) == "DL"
    assert kernel.identify_page(["nothing", "here"]) == "UNKNOWN"


def test_identify_passport_before_aadhaar():
    assert kernel.identify_page(["republic", "female"]) == "PASSPORT"
    assert kernel.identify_page(["female"]) == "AADHAAR"


# --- F1 PAN number predicate ----------------------------------------------

def test_pan_number_predicate_and_trim():
    words = W(["ABCDE1234F", "lower1234x", "ABCDEFGHIJ", "AB12"])
    f = kernel._pan_number(words)
    assert f["value"] == "ABCDE1234F"
    x1, y1, x2, y2, _ = words[0]
    assert f["boxes"] == [[x1, y1, x1 + int(0.65 * (x2 - x1)), y2]]


def test_pan_number_last_match_wins():
    words = W(["AAAAA1111A", "BBBBB2222B"])
    f = kernel._pan_number(words)
    assert f["value"] == "BBBBB2222B"
    assert len(f["boxes"]) == 2  # but both boxes collected


# --- F2 date regex anchoring (search vs match) ------------------------------

def test_pan_dob_uses_search_not_match():
    # re.search: a date embedded mid-token still hits (pancard:81)
    words = W(["x12/03/1985y"])
    assert kernel._pan_dob(words)["value"] == " x12/03/1985y"


def test_aadhaar_dob_uses_match():
    # re.match anchors at the token start (aadhaar:176)
    assert kernel._aadhaar_dob(W(["x12/03/1985"]), [])["value"] == ""
    assert kernel._aadhaar_dob(W(["12/03/1985"]), [])["value"] == " 12/03/1985"


def test_epancard_dates_case_sensitive_match():
    # e_pancard:74 has no IGNORECASE flag and the pattern is digits-only —
    # plain match applies
    assert kernel._epan_dates(W(["12/03/1985"]))["value"] == " 12/03/1985"
    assert kernel._epan_dates(W(["12.03.1985"]))["value"] == ""


# --- F7 aadhaar name quirks -------------------------------------------------

def test_aadhaar_name_full_width_boxes():
    # the trailing line keeps the DOB anchor off reversed index 0 (which the
    # reference treats as not-found)
    lines = ["Header authority", "RAHUL SHARMA", "DOB: 12/03/1985", "trailer text"]
    words = W(["RAHUL", "SHARMA"])
    f = kernel._aadhaar_name(words, lines)
    # trim loop iterates the never-filled name_coordinates list → full width
    assert f["value"] == "RAHUL SHARMA"
    assert f["boxes"] == [[w[0], w[1], w[2], w[3]] for w in words]


def test_aadhaar_name_gender_fallback_only_first_reversed_line():
    # no DOB keyword; gender word NOT on the last line → extractor gives up
    lines = ["RAHUL SHARMA", "FEMALE", "trailing line"]
    assert kernel._aadhaar_name(W(["RAHUL"]), lines)["value"] == ""
    # gender word on the last line → proceeds with idx 0
    lines = ["junk authority", "RAHUL SHARMA", "FEMALE"]
    f = kernel._aadhaar_name(W(["RAHUL", "SHARMA"]), lines)
    assert f["value"] == "RAHUL SHARMA"


def test_aadhaar_name_last_dob_line_wins():
    # two DOB-keyword lines: the scan keeps the LAST reversed index (= the
    # earliest line in document order), aadhaar:100-104
    lines = ["AAAA BBBB", "DOB: x", "CCCC DDDD", "DOB: y", "EEEE FFFF"]
    f = kernel._aadhaar_name(W(["AAAA", "BBBB", "CCCC", "DDDD"]), lines)
    # reversed: [EEEE.., DOB:y, CCCC.., DOB:x, AAAA..]; last match idx=3
    # → name lines = rev[4:] = ["AAAA BBBB"]
    assert f["value"] == "AAAA BBBB"


# --- F19/F32 first-match-only ------------------------------------------------

def test_epan_gender_first_match_only():
    words = W(["Female", "Male"])
    f = kernel._epan_gender(words)
    assert f["value"] == "Female"
    assert len(f["boxes"]) == 1


def test_cdsl_pan_first_match_only():
    words = W(["AAAAA1111A", "BBBBB2222B"])
    f = kernel._cdsl_pan(words)
    assert f["value"] == "AAAAA1111A"
    assert len(f["boxes"]) == 1


# --- F21 e-pancard father-name None quirk ------------------------------------

def test_epan_father_top_only_gives_none_boxes():
    lines = ["Father's name", "SURESH KUMAR JI"]
    words = W(["SURESH", "KUMAR", "JI"])
    f = kernel._epan_father_name(words, lines)
    assert f["value"] == "SURESH KUMAR JI"
    assert f["boxes"] is None  # only one side found → union helper returns None
    assert kernel.boxes_output_failed([f])


def test_epan_father_both_sides_combined():
    lines = ["Father's name", "SURESH KUMAR JI", "Rat 1 AT", "mid", "SURESH KUMAR"]
    words = W(["SURESH", "KUMAR", "JI"]) + W(["SURESH", "KUMAR"], y=50)
    f = kernel._epan_father_name(words, lines)
    assert f["boxes"] is not None and len(f["boxes"]) > 0


# --- F24 passport names always empty -----------------------------------------

def test_passport_names_always_empty():
    lines = ["Passport", "Surname", "SHARMA", "RAHUL"]
    words = W(["SHARMA", "RAHUL"])
    f = kernel._passport_names(words, lines)
    assert f["value"] == "" and f["boxes"] == []


# --- F33 CDSL y2 typo + merge -------------------------------------------------

def test_cdsl_client_name_y2_typo_and_merge():
    words = W(["AAAAA1111A", "RAHUL", "Kumar", "kyc"])
    f = kernel._cdsl_client_name(words)
    # boxes merged first→last; the Title-case token contributed [x1,y2,x2,y2]
    assert f["value"] == " RAHUL Kumar"
    (m,) = f["boxes"]
    rahul, kumar = words[1], words[2]
    assert m == [rahul[0], rahul[1], kumar[2], kumar[3]]


def test_cdsl_client_single_titlecase_box_has_y2_typo():
    words = W(["AAAAA1111A", "Kumar", "kyc"])
    f = kernel._cdsl_client_name(words)
    (m,) = f["boxes"]
    k = words[1]
    assert m == [k[0], k[3], k[2], k[3]]  # y1 replaced by y2 (cdsl:83)


# --- assembly levels -----------------------------------------------------------

def test_pancard_level0_always_rejected():
    words = W(["ABCDE1234F", "12/03/1985"])
    res = kernel.extract_page("PANCARD", words, ["Name", "X Y"], [], level=0)
    assert res["status"] == "REJECTED"


def test_passport_level0_always_rejected():
    words = W(["A1234567"])
    res = kernel.extract_page("PASSPORT", words, ["Surname", "S"], [], level=0)
    assert res["status"] == "REJECTED"


def test_epancard_level0_only_number_in_output():
    lines = ["e-PAN", "Name", "RAHUL SHARMA JI", "Father's name", "SURESH KUMAR JI",
             "Rat 1 AT", "mid", "SURESH KUMAR"]
    words = W(["RAHUL", "SHARMA", "JI"]) + W(["SURESH", "KUMAR", "JI"], 50) + \
        W(["12/03/1985", "ABCDE1234F", "Male"], 90) + W(["SURESH", "KUMAR"], 130)
    res = kernel.extract_page("E-PANCARD", words, lines, [], level=0)
    assert res["status"] == "REDACTED"
    assert [f["field"] for f in res["fields"]] == ["E-Pancard Number"]


def test_unknown_rejected():
    assert kernel.extract_page("UNKNOWN", [], [], [])["status"] == "REJECTED"


# --- trim arithmetic -------------------------------------------------------------

def test_trim_truncates_like_python_int():
    assert kernel._trim([0, 0, 1, 9], 0.65) == [0, 0, 0, 9]   # int(0.65) == 0
    assert kernel._trim([10, 0, 20, 9], 0.65) == [10, 0, 16, 9]


def test_rejected_box():
    assert kernel.rejected_box(100, 99) == [0, 0, 100, 79]  # int(79.2)


# --- A6 name parse ----------------------------------------------------------------

def test_parse_document_name_variants():
    assert kernel.parse_document_name("12F-ab3f9cx_pg-1.jpg") == (11, "ab3f9c")
    assert kernel.parse_document_name("pab3f9c_pg-1.jpg") == (0, "pab3f9")


# --- QR half-height -----------------------------------------------------------------

def test_qr_half_height():
    f = kernel._qr_field("Pancard QRCodes", [(10, 20, 100, 120)])
    assert f["boxes"] == [[10, 20, 100, 70]]
    assert f["value"] == "Found 1 QR Code"
