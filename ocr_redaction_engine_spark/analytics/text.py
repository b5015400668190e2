"""Text-analysis operators for a training-data pipeline over the
``documents(doc_id, text, lang, source, n_chars)`` corpus: tokenization,
quality scoring, language-ID heuristic, fingerprinting, vocabulary stats.

Everything here is pure Catalyst expressions (codegen'd, no Python), so the
same logic scales from the sf0.01 gate to a 100 TB corpus: narrow per-row
projections, one hash-agg where grouping is inherent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = r"\s+"


def with_tokens(docs: DataFrame) -> DataFrame:
    return docs.withColumn("tokens", F.split(F.trim("text"), TOKEN_SPLIT))


def quality(docs: DataFrame) -> DataFrame:
    """Per-document quality features: token count, distinct-token ratio,
    mean token length, digit ratio. The classic boilerplate/garbage signals."""
    d = with_tokens(docs)
    return d.select(
        "doc_id",
        F.size("tokens").alias("n_tokens"),
        F.round(F.size(F.array_distinct("tokens")) / F.size("tokens"), 6).alias("distinct_ratio"),
        F.round(
            F.aggregate("tokens", F.lit(0).cast("long"), lambda a, t: a + F.length(t))
            / F.size("tokens"), 6,
        ).alias("avg_token_len"),
        F.round(
            F.length(F.regexp_replace("text", r"[^0-9]", "")) /
            F.greatest(F.length("text"), F.lit(1)), 6,
        ).alias("digit_ratio"),
    )


def langid(docs: DataFrame) -> DataFrame:
    """Deterministic n-gram-flavoured language-ID heuristic: vowel-final
    token share + mean token length buckets. (The synthetic corpus shares one
    vocabulary across langs, so this demonstrates the operator shape — the
    thresholds are the tunable part in a real corpus.)"""
    d = with_tokens(docs)
    vowel_ratio = F.round(
        F.size(F.filter("tokens", lambda t: t.rlike("[aeiou]$"))) / F.size("tokens"), 6
    )
    avg_len = F.aggregate("tokens", F.lit(0).cast("long"), lambda a, t: a + F.length(t)) / F.size("tokens")
    guess = (
        F.when(vowel_ratio >= F.lit(0.5), F.lit("romance"))
        .when(avg_len >= F.lit(5.0), F.lit("compounding"))
        .otherwise(F.lit("analytic"))
    )
    return d.select("doc_id", "lang", vowel_ratio.alias("vowel_ratio"), guess.alias("lang_guess"))


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 over the whitespace-normalized text —
    the exact-dedup key."""
    d = with_tokens(docs)
    return d.select(
        "doc_id",
        F.md5(F.concat_ws(" ", "tokens")).alias("fp"),
        F.size("tokens").alias("n_tokens"),
    )


def winnow_fingerprints(docs: DataFrame, k: int = 8, w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., the MOSS
    algorithm): hash every character k-gram, slide a w-window over the hash
    sequence, keep each window's minimum — a rolling-hash fingerprint set
    that survives insertions/deletions outside the changed region (the
    local-dedup primitive whole-document md5 cannot provide).

    Pure Catalyst higher-order functions — sequence/transform/slice/
    array_min — so the same plan scales from the sf gate to 100 TB with
    zero Python. Output: one row per distinct fingerprint (doc_id, fp).
    """
    grams = F.expr(
        f"transform(sequence(1, greatest(length(text) - {k} + 1, 0)),"
        f" i -> md5(substring(text, i, {k})))"
    )
    d = docs.withColumn("grams", grams)
    mins = F.expr(
        f"transform(sequence(1, greatest(size(grams) - {w} + 1, 0)),"
        f" j -> array_min(slice(grams, j, {w})))"
    )
    return (
        d.select("doc_id", F.explode(F.array_distinct(mins)).alias("fp"))
    )


def vocab_stats(docs: DataFrame, min_count: int = 100) -> DataFrame:
    """Corpus vocabulary: token → frequency, thresholded (HAVING beats LIMIT
    for engine-parity: no tie-break ambiguity)."""
    d = with_tokens(docs)
    return (
        d.select(F.explode("tokens").alias("token"))
        .groupBy("token").agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
