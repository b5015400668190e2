"""Differential fuzz: redact_text_py (Python re, the oracle side) must equal
redact_text_col (Java regexp_replace, the engine side) on adversarial
inputs — word boundaries, partial PII shapes, adjacent matches, unicode.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ocr_redaction_engine_spark.pii import redact_text_col, redact_text_py
from ocr_redaction_engine_spark.places import GIVEN_NAMES, SURNAMES

_pii_frag = st.sampled_from([
    "a.b@example.com", "x@y.io", "not@an@email", "@example.com",
    "123-45-6789", "123-45-678", "1234-45-6789", "000-00-0000",
    "9876543210", "987654321", "98765432109", "12/03/1985", "1/2/33",
    GIVEN_NAMES[0], SURNAMES[0], GIVEN_NAMES[0].lower(),
    GIVEN_NAMES[0] + "X", "X" + SURNAMES[0],
    "", " ", ".", "-", "\t",
])
_word = st.text(alphabet="abcXYZ019@.-_ ", min_size=0, max_size=12)
_line = st.lists(st.one_of(_pii_frag, _word), min_size=0, max_size=12).map(" ".join)


@settings(max_examples=8, deadline=None)
@given(st.lists(_line, min_size=1, max_size=40))
def test_jvm_and_python_redaction_agree(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r.red for r in df.select(redact_text_col(F.col("text")).alias("red")).collect()]
    exp = [redact_text_py(t) for t in texts]
    assert got == exp


def test_trim_truncation_equals_floor():
    """int(f*(x2-x1)) == floor(...) for non-negative widths — the claim that
    lets the JVM A7 path use floor (SURVEY §2.7)."""
    for w in range(0, 500):
        for f in (0.2, 0.3, 0.5, 0.54, 0.65, 0.8):
            assert int(f * w) == math.floor(f * w)
