"""Media tokenization (SURVEY.md §2.3 T1/T2) — pluggable.

Modes
-----
fixture   : resolve ``media_ref`` against the deterministic ``media_pages``
            backing table with an equi-join. Pure JVM, bit-stable, and the
            scale path for any architecture where OCR output is precomputed
            upstream: both sides shuffle on ``media_ref`` (or co-locate via
            bucketing), AQE splits skewed keys.
payload   : a deterministic fake decoder over a binary ``content`` column via
            ``mapInPandas`` — exercises the real production plumbing (Arrow
            batches of bytes → word boxes) without an OCR binary in the
            container. Content is a UTF-8 JSON document
            ``{"lines": [...], "qr": [[x1,y1,x2,y2],...]}``.
tesseract : the production decoder (pytesseract inside ``mapInPandas``,
            one OCR pass per page — vs the reference's ≤9,
            identify_doc.py:33-45). Gated behind an import-try; raises
            NotImplementedError here because the sandbox has no tesseract.

All modes output the same struct-of-arrays page schema (PAGE_SCHEMA_DDL):
    (doc_id, offset, media_ref, document_name, width, height,
     wx1/wy1/wx2/wy2 array<int>, wtext array<string>, lines array<string>,
     qx1/qy1/qx2/qy2 array<int>)
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGE_SCHEMA_DDL = (
    "doc_id string, offset int, media_ref string, document_name string, "
    "width int, height int, "
    "wx1 array<int>, wy1 array<int>, wx2 array<int>, wy2 array<int>, "
    "wtext array<string>, lines array<string>, "
    "qx1 array<int>, qy1 array<int>, qx2 array<int>, qy2 array<int>"
)

# Struct-of-arrays page layout: pyarrow materializes array<struct> rows as
# Python list-of-dicts inside the UDF worker (~1 ms/page); parallel primitive
# arrays arrive as numpy buffers instead, and the JVM-side transform that
# builds them is whole-stage-codegen'd. The zip back to (x1,y1,x2,y2,text)
# tuples in Python costs ~10 µs/page.
def _pages_soa(media_pages: DataFrame) -> DataFrame:
    w = lambda f: F.transform("words", lambda s: s.getField(f))
    q = lambda f: F.transform("qr_boxes", lambda s: s.getField(f))
    return media_pages.select(
        "media_ref", "document_name", "width", "height",
        w("x1").alias("wx1"), w("y1").alias("wy1"),
        w("x2").alias("wx2"), w("y2").alias("wy2"),
        w("text").alias("wtext"), "lines",
        q("x1").alias("qx1"), q("y1").alias("qy1"),
        q("x2").alias("qx2"), q("y2").alias("qy2"),
    )


def tokenize_fixture(media_spans: DataFrame, media_pages: DataFrame) -> DataFrame:
    """Equi-join resolve. ``media_pages.doc_type`` is generation ground truth
    and is dropped here — the engine classifies from words alone."""
    return media_spans.select("doc_id", "offset", "media_ref") \
        .join(_pages_soa(media_pages), "media_ref")


def _layout_from_lines(lines):
    # Mirrors corpus._layout_words: deterministic synthetic geometry.
    words, y = [], 10
    for line in lines:
        x = 15
        for tok in line.split():
            w = 9 * len(tok) + 6
            words.append((x, y, x + w, y + 24, tok))
            x += w + 12
        y += 40
    width = max((w[2] for w in words), default=100) + 15
    return words, width, y + 20


def tokenize_payload(media_with_content: DataFrame) -> DataFrame:
    """Arrow-batched fake decoder: (doc_id, offset, media_ref, document_name,
    content binary) → page rows. This is the production code path shape —
    swap the JSON parse for an image decode + OCR call and nothing else
    changes (same schema, same batching, same partitioning)."""
    import pandas as pd

    cols = ["doc_id", "offset", "media_ref", "document_name", "width", "height",
            "wx1", "wy1", "wx2", "wy2", "wtext", "lines",
            "qx1", "qy1", "qx2", "qy2"]

    def decode(batches):
        for pdf in batches:
            out = []
            for doc_id, offset, ref, name, content in zip(
                pdf["doc_id"], pdf["offset"], pdf["media_ref"],
                pdf["document_name"], pdf["content"],
            ):
                payload = json.loads(bytes(content).decode("utf-8"))
                lines = payload["lines"]
                words, width, height = _layout_from_lines(lines)
                qr = payload.get("qr", [])
                out.append((
                    doc_id, int(offset), ref, name, width, height,
                    [w[0] for w in words], [w[1] for w in words],
                    [w[2] for w in words], [w[3] for w in words],
                    [w[4] for w in words], lines,
                    [q[0] for q in qr], [q[1] for q in qr],
                    [q[2] for q in qr], [q[3] for q in qr],
                ))
            yield pd.DataFrame(out, columns=cols) if out else pd.DataFrame({c: [] for c in cols})

    return media_with_content.mapInPandas(decode, schema=PAGE_SCHEMA_DDL)


#: tesseract invocation per lang mode (helper/text_coordinates.py:11-21).
#: In fixture/payload modes the same trichotomy is modeled by
#: kernel.mode_view applied doc-locally in the extract stage (identification
#: reads the sparse "eng" stream; CDSL extraction the "default" one — F34).
TESSERACT_MODES = {
    "eng": {"lang": "eng", "config": "--oem 3 --psm 11"},
    "default": {"lang": "eng", "config": ""},
    "regionalplus": {"lang": "hin+eng", "config": "--oem 3 --psm 11"},
}


def tokenize_tesseract(media_with_content: DataFrame, lang: str = "eng") -> DataFrame:
    """Production OCR decoder: ONE ``image_to_data`` call per page with
    ``TESSERACT_MODES[lang]`` (vs the reference's ≤9 re-OCR passes,
    document_identification/identify_doc.py:33-45), batched through the same
    mapInPandas plumbing as tokenize_payload. Requires pytesseract + PIL in
    the executor image (``pip install .[ocr]``); in this sandbox the import
    guard raises NotImplementedError and tokenize_payload exercises the
    identical batch shape."""
    if lang not in TESSERACT_MODES:
        raise ValueError(f"unknown lang mode {lang!r}; expected one of {sorted(TESSERACT_MODES)}")
    try:
        import pytesseract  # noqa: F401
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "tesseract tokenizer requires pytesseract + PIL in the executor "
            "image; use tokenize_fixture or tokenize_payload in this "
            "environment"
        ) from e

    import io

    import pandas as pd

    mode = TESSERACT_MODES[lang]
    cols = ["doc_id", "offset", "media_ref", "document_name", "width", "height",
            "wx1", "wy1", "wx2", "wy2", "wtext", "lines",
            "qx1", "qy1", "qx2", "qy2"]

    def decode(batches):
        import pytesseract
        from PIL import Image

        for pdf in batches:
            out = []
            for doc_id, offset, ref, name, content in zip(
                pdf["doc_id"], pdf["offset"], pdf["media_ref"],
                pdf["document_name"], pdf["content"],
            ):
                # grayscale normalize before OCR (P3 —
                # process_documents/process_queue_documents.py:35-37)
                img = Image.open(io.BytesIO(bytes(content))).convert("L")
                data = pytesseract.image_to_data(
                    img, output_type=pytesseract.Output.DICT,
                    lang=mode["lang"], config=mode["config"])
                words = [
                    (data["left"][i], data["top"][i],
                     data["left"][i] + data["width"][i],
                     data["top"][i] + data["height"][i], t)
                    for i, t in enumerate(data["text"]) if t.strip() != ""
                ]  # the strip filter of text_coordinates.py:25-28
                text = pytesseract.image_to_string(
                    img, lang=mode["lang"], config=mode["config"])
                lines = [ln for ln in text.split("\n")]
                out.append((
                    doc_id, int(offset), ref, name, img.width, img.height,
                    [w[0] for w in words], [w[1] for w in words],
                    [w[2] for w in words], [w[3] for w in words],
                    [w[4] for w in words], lines,
                    [], [], [], [],   # QR detection is a separate operator
                ))
            yield pd.DataFrame(out, columns=cols) if out else pd.DataFrame({c: [] for c in cols})

    return media_with_content.mapInPandas(decode, schema=PAGE_SCHEMA_DDL)
