"""Span explode + routing (SURVEY.md §2.3 T3, §2.2 P1/P2).

``offset`` is the authoritative within-document order (the north-rule order
column); task/partition order never matters downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_spans(documents: DataFrame) -> DataFrame:
    """documents(doc_id, spans[]) → one row per span.

    Catalyst prunes ``spans`` struct fields that downstream stages drop, and
    the explode is narrow (no shuffle)."""
    return documents.select(
        "doc_id",
        F.explode("spans").alias("s"),
    ).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )


def route_spans(spans: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split into (text_spans, media_spans). Both filters sit directly above
    the scan so Parquet row groups prune on ``kind`` where possible."""
    return spans.filter(F.col("kind") == "text"), spans.filter(F.col("kind") == "media")
