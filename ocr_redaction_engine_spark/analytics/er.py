"""Entity resolution at corpus scale: deletion-neighborhood blocking
(FastSS, Bocek et al. 2007; the SymSpell index) + exact edit-distance
verification, expressed as pure DataFrame ops.

Why this blocking: two strings within Levenshtein distance 1 ALWAYS share
an element of their depth-1 deletion neighborhoods ({s} ∪ {s minus char i})
— substitution at position p collides after both sides delete p, a
deletion collides with the unedited string directly. So candidate
generation is an equi-join on neighborhood keys: the explode factor is
L+1 per row (bounded by name length), each key is nearly unique, and the
candidate volume stays proportional to TRUE matches — unlike
length-bucket or prefix blocking whose blocks degenerate to whole
partitions on shared-prefix corpora (TPC-H names all start 'Customer#').
At 10^12 rows this is the difference between a linear-ish shuffle and a
quadratic one.

The reference engine (Devopcasting/OCR-Redaction-Engine) extracts
identity fields per document but never links records across documents;
this module is the cross-document companion its redaction mission
implies (same entity, OCR-garbled spelling → one cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .search import deletion_variants
from .text import md5_long

_BIG = 1 << 30


def synth_dirty_names(customers: DataFrame) -> DataFrame:
    """Deterministic OCR-noise twin of the customer file: a third of the
    rows lose one character (md5-chosen position), a third get one
    character substituted with 'x', a third pass through clean — the
    distance-≤1 corruption model FastSS depth-1 blocking is complete for.
    Pure expressions so any engine rebuilds the identical dirty table."""
    name = F.col("c_name")
    d = (md5_long(F.concat_ws(":", "c_custkey", F.lit("pert")))
         % F.length(name) + 1).cast("int")
    dirty = (
        F.when(F.col("c_custkey") % 3 == 0,
               F.concat(F.substring(name, 1, d - 1),
                        F.substring(name, d + 1, _BIG)))
        .when(F.col("c_custkey") % 3 == 1,
              F.concat(F.substring(name, 1, d - 1), F.lit("x"),
                       F.substring(name, d + 1, _BIG)))
        .otherwise(name))
    return customers.select(
        F.col("c_custkey").alias("dirty_id"),
        dirty.alias("dirty_name"),
        F.col("c_nationkey").alias("nationkey"))


def blocked_match(dirty: DataFrame, clean: DataFrame) -> DataFrame:
    """Link each dirty record to its best clean record: FastSS candidate
    join → exact ``levenshtein`` verify (≤1) → deterministic best pick
    (min distance, then min key). Both melts are map-side; the only
    shuffles are the two variant equi-joins' and the per-dirty-row top-1
    window, all keyed on near-unique variant strings — no full-block
    cross products, so the plan survives shared-prefix corpora.

    Returns (dirty_id, matched_custkey, dist).
    """
    dv = dirty.select(
        "dirty_id", "dirty_name", "nationkey",
        F.explode(deletion_variants(F.col("dirty_name"))).alias("v"))
    cv = clean.select(
        F.col("c_custkey"), F.col("c_name"), F.col("c_nationkey"),
        F.explode(deletion_variants(F.col("c_name"))).alias("v"))
    cands = (
        dv.join(cv, (dv.v == cv.v) & (dv.nationkey == cv.c_nationkey))
        .select("dirty_id", "dirty_name", "c_custkey", "c_name")
        .distinct())
    verified = cands.select(
        "dirty_id", "c_custkey",
        F.levenshtein("dirty_name", "c_name").alias("dist")
    ).where(F.col("dist") <= 1)
    w = Window.partitionBy("dirty_id").orderBy(
        F.col("dist").asc(), F.col("c_custkey").asc())
    return (
        verified.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("dirty_id", F.col("c_custkey").alias("matched_custkey"),
                "dist"))
