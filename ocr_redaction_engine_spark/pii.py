"""PII redaction for text spans — two equivalent implementations that are
differential-tested against each other:

* :func:`redact_text_py` — pure Python (oracle side).
* :func:`redact_text_col` — JVM-side Catalyst expression chain
  (``regexp_replace`` stays inside WholeStageCodegen; no Python on the hot
  path, per BASELINE.json:input_hint).

The bank order is fixed (banks.PII_BANK then the broadcast name dictionary);
both sides apply it identically. Mirrors the reference's identify-stage
regex-bank idea (SURVEY.md §2.4) applied to free text.
"""

from __future__ import annotations

import re
from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F

from .banks import PII_BANK
from .places import GIVEN_NAMES, SURNAMES

# Broadcast-style dictionary name matching (north_star): a single compiled
# union alternation. Word-boundary anchored, case-sensitive (names are planted
# uppercase; titlecase variants appear inside page media, not text spans).
NAME_PATTERN = r"\b(?:" + "|".join(sorted(GIVEN_NAMES + SURNAMES)) + r")\b"
NAME_REPLACEMENT = "[NAME]"


@lru_cache(maxsize=64)
def _compiled(pattern: str) -> re.Pattern:
    return re.compile(pattern)


def redact_text_py(text: str) -> str:
    for _, pattern, repl in PII_BANK:
        text = _compiled(pattern).sub(repl, text)
    return _compiled(NAME_PATTERN).sub(NAME_REPLACEMENT, text)


def redact_text_col(col: Column) -> Column:
    for _, pattern, repl in PII_BANK:
        col = F.regexp_replace(col, pattern, repl)
    return F.regexp_replace(col, NAME_PATTERN, NAME_REPLACEMENT)
