"""Deduplication operators for training-data pipelines: exact, MinHash+LSH,
n-gram Jaccard, SimHash.

Scale notes (the 100 TB design point):

* exact — one hash-agg on the md5 fingerprint; map-side partial agg makes
  the shuffle tiny.
* minhash bands — signatures are per-doc aggregates (hash-agg, no pairwise
  work); candidate generation is B equi-joins on (band signature), i.e. the
  LSH trick replaces the O(N²) pair space with join-key collisions. AQE
  splits hot buckets (boilerplate-heavy signatures are the classic skew key).
* jaccard verify — only candidate pairs pay the set-intersection join.
* simhash — Arrow-batched (numpy) hashing; the 64-bit signature then joins
  on (band of bits) the same way.

Hash choice: md5 (not xxhash/murmur) for everything the DuckDB oracle also
computes — md5 is bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import with_tokens

N_BANDS = 4


def exact_dupes(docs: DataFrame) -> DataFrame:
    """Exact dedup over normalized text: canonical id + duplicate count per
    fingerprint group."""
    fp = with_tokens(docs).select(
        "doc_id", F.md5(F.concat_ws(" ", "tokens")).alias("fp")
    )
    groups = fp.groupBy("fp").agg(
        F.min("doc_id").alias("canonical_doc_id"),
        F.count("*").alias("dup_count"),
    )
    return fp.join(groups, "fp").select("doc_id", "fp", "canonical_doc_id", "dup_count")


def doc_tokens_distinct(docs: DataFrame) -> DataFrame:
    return (
        with_tokens(docs)
        .select("doc_id", F.explode(F.array_distinct("tokens")).alias("token"))
    )


def minhash_signatures(docs: DataFrame, n_bands: int = N_BANDS) -> DataFrame:
    """Per-doc MinHash signature per band: min over tokens of
    md5(band || ':' || token). Shape (doc_id, sig_0..sig_{B-1}) — one
    hash-agg, no explode of the band dimension."""
    toks = doc_tokens_distinct(docs)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{b}:"), F.col("token")))).alias(f"sig_{b}")
        for b in range(n_bands)
    ]
    return toks.groupBy("doc_id").agg(*aggs)


def candidate_pairs(docs: DataFrame, n_bands: int = N_BANDS) -> DataFrame:
    """LSH candidate pairs: docs sharing any band signature (a < b)."""
    sigs = minhash_signatures(docs, n_bands)
    pairs = None
    for b in range(n_bands):
        left = sigs.select(F.col("doc_id").alias("a"), F.col(f"sig_{b}").alias("sig"))
        right = sigs.select(F.col("doc_id").alias("b"), F.col(f"sig_{b}").alias("sig"))
        p = left.join(right, "sig").filter(F.col("a") < F.col("b")).select("a", "b")
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.distinct()


def jaccard_pairs(docs: DataFrame, threshold: float = 0.5,
                  n_bands: int = N_BANDS) -> DataFrame:
    """Verify LSH candidates with exact token-set Jaccard ≥ threshold."""
    toks = doc_tokens_distinct(docs)
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n"))
    cands = candidate_pairs(docs, n_bands)
    ta = toks.select(F.col("doc_id").alias("a"), "token")
    tb = toks.select(F.col("doc_id").alias("b"), "token")
    inter = (
        cands.join(ta, "a").join(tb, ["b", "token"])
        .groupBy("a", "b").agg(F.count("*").alias("inter"))
    )
    na = sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "a").join(nb, "b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "inter", "na", "nb", "jaccard")
    )


SIMHASH_SCHEMA = "doc_id long, simhash long"


def simhash(docs: DataFrame, bits: int = 60) -> DataFrame:
    """SimHash signatures via an Arrow-batched kernel (hashing is the hot
    loop; numpy votes per batch). 60 bits keeps the value in a signed long.
    Near-dup candidates then join on bit-band substrings of the signature."""
    import pandas as pd

    def run(batches):
        import hashlib
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                votes = [0] * bits
                for tok in set(text.split()):
                    h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big") >> (64 - bits)
                    for i in range(bits):
                        votes[i] += 1 if (h >> i) & 1 else -1
                sig = 0
                for i in range(bits):
                    if votes[i] > 0:
                        sig |= 1 << i
                out.append((int(doc_id), sig))
            yield pd.DataFrame(out, columns=["doc_id", "simhash"]) if out else \
                pd.DataFrame({"doc_id": [], "simhash": []})

    return docs.select("doc_id", "text").mapInPandas(run, schema=SIMHASH_SCHEMA)


def connected_components(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """Duplicate-group clustering: connected components over candidate pairs
    (columns ``a``, ``b``) by iterative min-label propagation.

    Each round every node adopts the minimum label among itself and its
    neighbours; convergence takes O(component diameter) rounds (near-dup
    components are shallow — star-ish around a template — so this converges
    in a handful of rounds at corpus scale). ``localCheckpoint`` truncates
    the growing lineage each round — the standard guard for iterative plans.
    Returns (node, component) with component = min node id in the component.
    """
    edges = pairs.select(F.col("a").alias("u"), F.col("b").alias("v"))
    edges = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    edges = edges.localCheckpoint(eager=True)

    labels = (
        edges.select("u").distinct()
        .withColumn("label", F.col("u"))
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        nb_min = (
            edges.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u").agg(F.min("label").alias("nb_label"))
        )
        new_labels = (
            labels.join(nb_min, "u", "left")
            .select("u", F.least("label", F.coalesce("nb_label", "label")).alias("label"))
        ).localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n").join(labels.alias("o"), "u")
            .filter(F.col("n.label") != F.col("o.label")).count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("u").alias("node"), F.col("label").alias("component"))


def simhash_candidates(docs: DataFrame, band_bits: int = 15) -> DataFrame:
    """Hamming-neighbour candidates: equal value in any of the 4 15-bit bands
    (detects signatures within small Hamming distance)."""
    sigs = simhash(docs)
    pairs = None
    for b in range(4):
        band = F.shiftright(F.col("simhash"), b * band_bits).bitwiseAND(F.lit((1 << band_bits) - 1))
        s = sigs.select("doc_id", band.alias("band_val"))
        left = s.select(F.col("doc_id").alias("a"), "band_val")
        right = s.select(F.col("doc_id").alias("b"), "band_val")
        p = left.join(right, "band_val").filter(F.col("a") < F.col("b")).select("a", "b")
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.distinct()
