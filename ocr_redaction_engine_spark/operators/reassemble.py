"""Span-sequence reassembly (SURVEY.md §2.6 A5) — the north-rule output.

The flat contract table is (doc_id, order, kind, text, media_ref) with
``order`` = the original span offset; it requires NO shuffle at all (union of
two narrow branches). ``assemble_documents`` additionally folds back to one
row per document — a single hash aggregation on doc_id — for consumers that
want the array shape; ``array_sort`` on struct(order, …) restores original
span order regardless of task interleaving.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..pii import redact_text_col


def redacted_text_spans(text_spans: DataFrame) -> DataFrame:
    return text_spans.select(
        "doc_id",
        F.col("offset").alias("order"),
        F.lit("text").alias("kind"),
        redact_text_col(F.col("text")).alias("text"),
        F.lit("").alias("media_ref"),
    )


def passthrough_media_spans(media_spans: DataFrame) -> DataFrame:
    return media_spans.select(
        "doc_id",
        F.col("offset").alias("order"),
        F.lit("media").alias("kind"),
        F.lit("").alias("text"),
        "media_ref",
    )


def reassemble_flat(text_spans: DataFrame, media_spans: DataFrame) -> DataFrame:
    return redacted_text_spans(text_spans).unionByName(passthrough_media_spans(media_spans))


def assemble_documents(flat_spans: DataFrame) -> DataFrame:
    return flat_spans.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("order", "kind", "text", "media_ref"))
        ).alias("spans")
    )
