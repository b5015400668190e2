"""Field extraction stage — the single Arrow UDF on the hot path.

Classified pages → per-field rows via ``mapInPandas`` running the pure
semantics kernel (ocr_redaction_engine_spark.kernel). The take-while /
anchor-window heuristics (SURVEY.md §2.5 F4/F7/F15/F20/F24/F30/F33) are
doc-local ordered logic that SQL can't express cleanly; everything around
this stage (classification, joins, sequence numbering, reassembly) stays
JVM-side.

Output schema (one row per extracted field, or one ``__PAGE__`` row for
REJECTED pages):

    doc_id, offset, media_ref, document_name, width, height, status,
    field_idx, field, value, boxes array<struct<x1,y1,x2,y2>>, boxes_null

``boxes_null`` carries the E-Pancard father-name quirk (kernel.py): any true
row suppresses the whole page's box output downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import kernel

EXTRACT_SCHEMA_DDL = (
    "doc_id string, offset int, media_ref string, document_name string, "
    "width int, height int, status string, field_idx int, field string, "
    "value string, boxes array<struct<x1:int,y1:int,x2:int,y2:int>>, "
    "boxes_null boolean"
)


def _as_word_tuples(words):
    return [(int(w["x1"]), int(w["y1"]), int(w["x2"]), int(w["y2"]), w["text"]) for w in words]


def _as_qr_tuples(qrs):
    return [(int(q["x1"]), int(q["y1"]), int(q["x2"]), int(q["y2"])) for q in qrs]


def extract_fields(classified_pages: DataFrame, level: int = 1) -> DataFrame:
    """Runs kernel.extract_page per page inside Arrow batches. Pages with
    doc_type UNKNOWN must be filtered out by the caller (they shortcut to
    REJECTED without paying the Python boundary)."""
    import pandas as pd

    cols = ["doc_id", "offset", "media_ref", "document_name", "width", "height",
            "status", "field_idx", "field", "value", "boxes", "boxes_null"]

    def run(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                words = _as_word_tuples(row.words)
                res = kernel.extract_page(
                    row.doc_type, words, list(row.lines), _as_qr_tuples(row.qr_boxes), level
                )
                base = (row.doc_id, int(row.offset), row.media_ref, row.document_name,
                        int(row.width), int(row.height), res["status"])
                if res["status"] == kernel.REJECTED:
                    out.append(base + (-1, "__PAGE__", "", [], False))
                    continue
                for fi, f in enumerate(res["fields"]):
                    null = f["boxes"] is None
                    boxes = [] if null else [tuple(b) for b in f["boxes"]]
                    out.append(base + (fi, f["field"], f["value"], boxes, null))
            yield pd.DataFrame(out, columns=cols) if out else pd.DataFrame({c: [] for c in cols})

    return classified_pages.mapInPandas(run, schema=EXTRACT_SCHEMA_DDL)


def rejected_unknown_pages(unknown_pages: DataFrame) -> DataFrame:
    """UNKNOWN pages bypass the Arrow stage entirely: REJECTED rows built
    from pure Catalyst expressions (process_ocrr.py:74-77)."""
    return unknown_pages.select(
        "doc_id", "offset", "media_ref", "document_name", "width", "height",
        F.lit("REJECTED").alias("status"),
        F.lit(-1).alias("field_idx"),
        F.lit("__PAGE__").alias("field"),
        F.lit("").alias("value"),
        F.expr("cast(array() as array<struct<x1:int,y1:int,x2:int,y2:int>>)").alias("boxes"),
        F.lit(False).alias("boxes_null"),
    )
