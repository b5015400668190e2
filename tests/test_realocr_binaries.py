"""Real-binary OCR lane (VERDICT r4 #3): ``pytest -m realocr``.

Runs the PRODUCTION post-import-guard bodies of tokenize_tesseract /
decode_image / resize_image / detect_qr against the real PIL / tesseract /
QReader stacks on a host that has them (``pip install .[ocr]`` + the
tesseract binary) — the fake-stack subprocess lane
(test_real_ocr_paths.py) proves the code paths; this lane proves them
against the actual binaries. Every test auto-skips where its stack is
absent, so the default sandbox run is unaffected.

Fixture: tests/fixtures/realocr/words.png — a committed deterministic
grayscale PNG (stdlib-generated, see fixtures/make_realocr_fixture.py)
rendering "PAN NUMBER 12345" in a scaled 5x7 bitmap font, with
expected.json carrying the exact decode facts and per-word glyph-grid
boxes. Tesseract assertions are an ENVELOPE, not pixel equality (engine
versions differ): recognized words must cover the planted ones and every
box must land inside its word's glyph area ± one glyph cell.
"""

from __future__ import annotations

import importlib.util
import io
import json
import os
import shutil

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
FIXDIR = os.path.join(HERE, "fixtures", "realocr")

_has_pil = importlib.util.find_spec("PIL") is not None
_has_pytesseract = importlib.util.find_spec("pytesseract") is not None
_has_tesseract_bin = shutil.which("tesseract") is not None
_has_qreader = importlib.util.find_spec("qreader") is not None \
    and importlib.util.find_spec("cv2") is not None
_has_qrcode = importlib.util.find_spec("qrcode") is not None

pytestmark = pytest.mark.realocr


def _expected():
    with open(os.path.join(FIXDIR, "expected.json")) as f:
        return json.load(f)


def _png_bytes():
    with open(os.path.join(FIXDIR, "words.png"), "rb") as f:
        return f.read()


def _media_df(spark, content: bytes):
    return spark.createDataFrame([(1, bytearray(content))],
                                 "media_id long, content binary")


@pytest.mark.skipif(not _has_pil, reason="real PIL not installed")
def test_decode_image_real_pil(spark):
    from ocr_redaction_engine_spark.analytics.multimodal import decode_image
    exp = _expected()
    row = decode_image(_media_df(spark, _png_bytes())).collect()[0]
    assert (row["width"], row["height"]) == (exp["width"], exp["height"])
    assert row["channels"] == exp["bands_grayscale"]


@pytest.mark.skipif(not _has_pil, reason="real PIL not installed")
def test_resize_image_real_pil(spark):
    from PIL import Image

    from ocr_redaction_engine_spark.analytics.multimodal import resize_image
    row = resize_image(_media_df(spark, _png_bytes()), 320, 64).collect()[0]
    img = Image.open(io.BytesIO(bytes(row["content"])))
    assert (img.width, img.height) == (320, 64)
    assert img.format == "PNG"


@pytest.mark.skipif(
    not (_has_pil and _has_pytesseract and _has_tesseract_bin),
    reason="pytesseract + tesseract binary not installed")
def test_tokenize_tesseract_real_binary(spark):
    from ocr_redaction_engine_spark.operators.tokenize import tokenize_tesseract
    exp = _expected()
    pages = spark.createDataFrame(
        [("d1", 0, "pg-1", "fixture.png", bytearray(_png_bytes()))],
        "doc_id string, offset int, media_ref string, "
        "document_name string, content binary")
    row = tokenize_tesseract(pages, lang="default").collect()[0]
    assert (row["width"], row["height"]) == (exp["width"], exp["height"])
    got = {t.upper(): (x1, y1, x2, y2) for x1, y1, x2, y2, t in zip(
        row["wx1"], row["wy1"], row["wx2"], row["wy2"], row["wtext"])}
    slack = 6 * exp["scale"]           # one glyph cell of tolerance
    for want in exp["words"]:
        assert want["text"] in got, f"tesseract missed {want['text']}: {got}"
        x1, y1, x2, y2 = got[want["text"]]
        assert abs(x1 - want["x1"]) <= slack and abs(x2 - want["x2"]) <= slack
        assert abs(y1 - want["y1"]) <= slack and abs(y2 - want["y2"]) <= slack
    # full-text stream carries the same words in reading order
    joined = " ".join(ln.strip() for ln in row["lines"] if ln.strip())
    assert [w["text"] for w in exp["words"]] == joined.upper().split()


@pytest.mark.skipif(
    not (_has_qreader and _has_qrcode and _has_pil),
    reason="qreader + qrcode + PIL not installed")
def test_detect_qr_real_binary(spark):
    """QR fixture is built AT TEST TIME with the qrcode package (a real QR
    matrix can't reasonably be hand-committed); hosts provisioning the
    realocr lane install it alongside qreader."""
    import qrcode

    from ocr_redaction_engine_spark.analytics.multimodal import detect_qr
    img = qrcode.make("ocr-redaction-engine-spark realocr fixture")
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    rows = detect_qr(_media_df(spark, buf.getvalue())).collect()
    assert len(rows) == 1
    r = rows[0]
    pil = img.get_image() if hasattr(img, "get_image") else img
    assert 0 <= r["qx1"] < r["qx2"] <= pil.width
    assert 0 <= r["qy1"] < r["qy2"] <= pil.height
