"""Byte-identical XML sinks (SURVEY.md §2.1 S6/S7/S8) — pure JVM expressions.

The reference writes, per page, a ``DataBase`` XML document whose rows are
CSV-ish strings (prepare_xml/redacted.py:39 for redaction boxes, :51 for
indexvalues; prepare_xml/rejected.py:34-66 shares the row format).
ElementTree emits them single-line, utf-8, with an ``<?xml?>`` declaration
(redacted.py:57-73). This module reproduces those bytes with
``format_string``/``concat_ws``/``transform`` so the XML rendering stays in
whole-stage codegen — the distributed sink is one row per page:
``(doc_id, media_ref, xml_file_name, xml)``.

File naming follows ``_rename_xml_file`` (redacted.py:96-103): indexvalues
files are renamed ``{first}-RD_{rest}`` on the first ``_`` (no-underscore
names duplicate: ``{name}-RD_{name}``, the ``filename_list[-1]`` fallback),
and both swap the extension via ``rsplit('.', 1)[0] + '.xml'``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .redactions import with_frame_doc_ids

ROW_FMT = "0,0,0,,,,0,0,0,0,0,0,,vv,CVDPS,vv,%s,%s,0,%s,%s,%s,%s,%s,0,0"


def _xml_escape(c: Column) -> Column:
    """ElementTree text-node escaping: & first, then < and > (quotes are
    left alone in text nodes)."""
    c = F.regexp_replace(c, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    return F.regexp_replace(c, ">", "&gt;")


def _xml_file_name(indexvalues: bool) -> Column:
    """``_rename_xml_file`` as expressions over the ``document_name``
    column."""
    name = F.col("document_name")
    if indexvalues:
        renamed = F.when(
            name.contains("_"),
            F.concat(
                F.split_part(name, F.lit("_"), F.lit(1)),
                F.lit("-RD_"),
                F.expr("substring(document_name, length(split_part(document_name, '_', 1)) + 2)"),
            ),
        ).otherwise(F.concat(name, F.lit("-RD_"), name))
    else:
        renamed = name
    # rsplit('.', 1)[0]: drop everything from the LAST dot
    stem = F.when(
        renamed.contains("."),
        renamed.substr(F.lit(1),
                       F.length(renamed) - F.instr(F.reverse(renamed), ".")),
    ).otherwise(renamed)
    return F.concat(stem, F.lit(".xml"))


def _doc_xml(element_name: str, rows_sorted: Column) -> Column:
    """The full single-line XML document ElementTree produces
    (redacted.py:57-73): DataBase / Count / <element> with 1-based ID
    attributes in row order."""
    item = element_name[:-1]
    body = F.concat_ws(
        "",
        F.transform(
            rows_sorted,
            lambda r, i: F.concat(
                F.lit(f'<{item} ID="'), (i + 1).cast("string"), F.lit('">'),
                r, F.lit(f"</{item}>"),
            ),
        ),
    )
    # ElementTree self-closes an empty element: '<DatabaseRedactions />'
    # (the Count-0 page case — e.g. the None-coordinates quirk)
    middle = F.when(
        F.size(rows_sorted) == 0, F.lit(f"<{element_name} />")
    ).otherwise(F.concat(F.lit(f"<{element_name}>"), body,
                         F.lit(f"</{element_name}>")))
    return F.concat(
        F.lit("<?xml version='1.0' encoding='utf-8'?>\n<DataBase><Count>"),
        F.size(rows_sorted).cast("string"),
        F.lit("</Count>"),
        middle,
        F.lit("</DataBase>"),
    )


def _per_page(rows: DataFrame, order_col: str,
              page_universe: DataFrame | None = None) -> DataFrame:
    """One row per page with its sorted XML rows. ``page_universe`` (derived
    from ALL page rows) keeps pages whose filtered row set is EMPTY — e.g. a
    REDACTED page under the None-coordinates quirk emits values but zero
    boxes, and the reference's ElementTree writer still writes a Count-0
    file (ADVICE r1)."""
    grouped = (
        rows.groupBy("doc_id", "media_ref", "document_name")
        .agg(F.array_sort(F.collect_list(F.struct(order_col, "row"))).alias("rs"),
             F.max("status").alias("status"))
    )
    if page_universe is not None:
        grouped = page_universe.join(
            grouped.drop("status"), ["doc_id", "media_ref", "document_name"], "left")
    return grouped.withColumn(
        "rows_sorted",
        F.coalesce(F.transform("rs", lambda s: s.getField("row")),
                   F.array().cast("array<string>")),
    )


def render_redactions_xml(page_rows: DataFrame) -> DataFrame:
    """page_rows = the flat extract output (operators/extract.py). One row
    per page: the DatabaseRedactions document. REJECTED pages share the row
    format (their 80 % box was materialized upstream) but are named by the
    rejected writer's FIRST-dot split (rejected.py:60 ``split('.')[0]``) vs
    the redacted writer's last-dot rsplit (redacted.py:103)."""
    boxes = with_frame_doc_ids(page_rows.filter(F.col("row_kind") == "box"))
    row = F.format_string(
        ROW_FMT,
        F.col("frame_id").cast("string"), F.col("document_id"),
        F.col("seq").cast("string"),
        F.col("x1").cast("string"), F.col("y1").cast("string"),
        F.col("x2").cast("string"), F.col("y2").cast("string"),
    )
    # every page EXCEPT the None-coordinates-quirk ones (whose reference
    # writer throws → no redactions file at all, redacted.py:36-44); a page
    # with merely zero boxes still gets its Count-0 document
    universe = (
        page_rows.filter(~F.col("boxes_failed"))
        .groupBy("doc_id", "media_ref", "document_name")
        .agg(F.max("status").alias("status"))
    )
    pages = _per_page(boxes.withColumn("row", _xml_escape(row)), "seq", universe)
    rejected_name = F.concat(
        F.split_part(F.col("document_name"), F.lit("."), F.lit(1)), F.lit(".xml"))
    return pages.select(
        "doc_id", "media_ref", "status",
        F.when(F.col("status") == "REJECTED", rejected_name)
         .otherwise(_xml_file_name(indexvalues=False)).alias("xml_file_name"),
        _doc_xml("DatabaseRedactions", F.col("rows_sorted")).alias("xml"),
    )


def render_values_xml(page_rows: DataFrame) -> DataFrame:
    """The indexvalues document (redacted.py:46-55): one row per extracted
    field, field order, ``"Title": "...", "FrameID": "...", "DocID": "...",
    "Value": "..."``."""
    vals = with_frame_doc_ids(page_rows.filter(F.col("row_kind") == "value"))
    row = F.format_string(
        '"Title": "%s", "FrameID": "%s", "DocID": "%s", "Value": "%s"',
        F.col("field"), F.col("frame_id").cast("string"),
        F.col("document_id"), F.col("value"),
    )
    pages = _per_page(vals.withColumn("row", _xml_escape(row)), "field_idx")
    return pages.select(
        "doc_id", "media_ref",
        _xml_file_name(indexvalues=True).alias("xml_file_name"),
        _doc_xml("indexvalues", F.col("rows_sorted")).alias("xml"),
    )
