"""Redaction outputs (SURVEY.md §2.6 A3/A4/A6/A7, §2.1 S6/S7/S8) — all JVM.

From the extraction rows this builds:

* ``values``     — the indexvalues sink (prepare_xml/redacted.py:46-55):
                   (doc_id, media_ref, frame_id, document_id, field, value).
* ``redactions`` — one row per box with a 1-based per-page ``seq`` in
                   (field_idx, box_idx) order (the reference's count_index,
                   prepare_xml/redacted.py:36-40); REJECTED pages contribute
                   the single 80 % box (rejected_doc_coordinates.py:13-19);
                   pages carrying a boxes_null field emit NO boxes (the
                   E-Pancard father-name quirk — redacted.py:36 throws on
                   None and the XML write fails silently).

Sequence numbering is a window function over (doc_id, media_ref) — page-local,
so the shuffle is a narrow hash repartition that AQE coalesces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_NAME_RE = "^[0-9]+F[0-9a-fA-Z_-]+"


def with_frame_doc_ids(df: DataFrame, name_col: str = "document_name") -> DataFrame:
    """Frame/doc id parse (A6) — prepare_xml/redacted.py:11-30 as Catalyst
    expressions; twin of kernel.parse_document_name."""
    first_seg = F.split(F.col(name_col), "_").getItem(0)
    frame_str = F.split(first_seg, "-").getItem(0)
    matched = F.col(name_col).rlike(_NAME_RE)
    frame_id = F.when(
        matched, F.split(frame_str, "F").getItem(0).cast("int") - F.lit(1)
    ).otherwise(F.lit(0))
    dash_seg = F.split(first_seg, "-").getItem(1)
    document_id = F.when(
        matched, F.expr(f"substring(split(split({name_col}, '_')[0], '-')[1], 1, "
                        f"length(split(split({name_col}, '_')[0], '-')[1]) - 1)")
    ).otherwise(F.expr(f"substring(split({name_col}, '_')[0], 1, "
                       f"length(split({name_col}, '_')[0]) - 1)"))
    return df.withColumn("frame_id", frame_id).withColumn("document_id", document_id)


def build_values(extracted: DataFrame) -> DataFrame:
    vals = extracted.filter((F.col("status") == "REDACTED") & (F.col("field_idx") >= 0))
    return with_frame_doc_ids(vals).select(
        "doc_id", "media_ref", "frame_id", "document_id", "field", "value"
    )


def build_redactions(extracted: DataFrame) -> DataFrame:
    # pages where any field carries the None-coordinates quirk
    failed_pages = (
        extracted.filter(F.col("boxes_null"))
        .select("doc_id", "media_ref").distinct()
    )

    redacted_boxes = (
        extracted
        .filter((F.col("status") == "REDACTED") & (F.size("boxes") > 0))
        .join(failed_pages, ["doc_id", "media_ref"], "left_anti")
        .select(
            "doc_id", "media_ref", "document_name", "status", "field_idx", "field",
            F.posexplode("boxes").alias("box_idx", "b"),
        )
        .select(
            "doc_id", "media_ref", "document_name", "status", "field_idx", "field",
            "box_idx",
            F.col("b.x1").alias("x1"), F.col("b.y1").alias("y1"),
            F.col("b.x2").alias("x2"), F.col("b.y2").alias("y2"),
        )
    )
    w = Window.partitionBy("doc_id", "media_ref").orderBy("field_idx", "box_idx")
    redacted_boxes = redacted_boxes.withColumn("seq", F.row_number().over(w))

    rejected_boxes = (
        extracted.filter(F.col("status") == "REJECTED")
        .select(
            "doc_id", "media_ref", "document_name", "status",
            F.lit(-1).alias("field_idx"),
            F.lit("__PAGE__").alias("field"),
            F.lit(0).alias("box_idx"),
            F.lit(0).alias("x1"), F.lit(0).alias("y1"),
            F.col("width").alias("x2"),
            # int(height * 0.8): Python int() truncates toward zero; height>=0
            F.floor(F.col("height") * F.lit(0.8)).cast("int").alias("y2"),
            F.lit(1).alias("seq"),
        )
        .dropDuplicates(["doc_id", "media_ref"])  # one page row per rejected page
    )

    cols = ["doc_id", "media_ref", "document_name", "status", "field", "seq",
            "x1", "y1", "x2", "y2"]
    out = redacted_boxes.select(*cols).unionByName(rejected_boxes.select(*cols))
    return with_frame_doc_ids(out).drop("document_name")
