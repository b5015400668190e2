"""Document-type classification — the reference's identify stage
(SURVEY.md §2.4 C1..C8) as a JVM-side first-match ``when`` chain.

The reference re-OCRs the image for every attempted type (up to 7 passes,
document_identification/identify_doc.py:33-45); here the word boxes are
tokenized once and the banks run as ``exists(words, w -> w.text rlike p)``
higher-order expressions — whole-stage-codegen'd, zero Python, zero shuffle.

Priority order is the reference's ordered type list
(ocrr_document/process_ocrr.py:28); matching is any-token × any-pattern,
case-insensitive search (identify_*.py), reproduced with Java ``(?i)``.

The pure-Python twin is :func:`ocr_redaction_engine_spark.kernel.identify_page`;
the two implementations are differential-tested.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..banks import DOC_TYPES, IDENTIFY_BANK, UNKNOWN_TYPE, java_ci


def _bank_hit(tokens_col: str, doc_type: str) -> Column:
    # one combined alternation per bank (hit iff any pattern hits);
    # single-arg lambda: a 2-arg lambda would be treated as (element, index)
    union = "|".join(f"(?:{java_ci(p)})" for p in IDENTIFY_BANK[doc_type])
    return F.exists(tokens_col, lambda t: t.rlike(union))


def classify_pages(pages: DataFrame, tokens_col: str = "wtext") -> DataFrame:
    """Adds ``doc_type`` (string) with first-match priority; UNKNOWN when no
    bank fires (→ REJECTED downstream, process_ocrr.py:74-77). ``tokens_col``
    is an array<string> of page tokens (the SOA page layout's ``wtext``)."""
    expr = None
    for dt in DOC_TYPES:
        hit = _bank_hit(tokens_col, dt)
        expr = F.when(hit, F.lit(dt)) if expr is None else expr.when(hit, F.lit(dt))
    return pages.withColumn("doc_type", expr.otherwise(F.lit(UNKNOWN_TYPE)))
