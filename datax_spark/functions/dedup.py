"""Deduplication families for web-scale corpora.

Five strategies, cheapest-first, all shuffle-efficient by construction:

- exact:    sha256(normalized) groupBy — one shuffle keyed by digest; at
            100 TB the map-side partial agg collapses dup clusters before
            the shuffle moves anything.
- MinHash + LSH: signature is a per-row projection (no shuffle at all);
            candidate generation shuffles only (band_id, band_hash) keys —
            the classic shingle→minhash→band→bucket-join, never O(n²).
- SimHash:  per-row 16-bit fingerprint via conditional aggregation over
            exploded tokens (one shuffle keyed by doc id).
- n-gram Jaccard: exact verification on *candidate pairs only* (the
            LSH output), array_intersect/array_union — no cross join.
- embedding cosine: near-dup pairs blocked by a grouping column so the
            self-join is per-block, not global.

Hashes are md5-based (functions/text.py h32) for DuckDB-oracle parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datax_spark.functions.text import fingerprint, h32, round6, shingles, tokens
from datax_spark.functions.similarity import cosine

MINHASH_K = 8
LSH_ROWS_PER_BAND = 2  # => 4 bands with K=8


def exact_dup_clusters(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dup clusters by sha256(normalized text).

    Returns (digest, dup_count, min_id) for clusters with >= 1 member —
    filter dup_count > 1 for true duplicates. min() / count() both get
    map-side partial aggregation.
    """
    return (
        df.select(fingerprint(text_col).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min(id_col).alias("min_id"),
        )
    )


def minhash_signature(text_col: str = "text", k: int = MINHASH_K, n: int = 3) -> list[Column]:
    """K MinHash values over word-3-gram shingles (null when no shingles).

    Pure projection: K × array_min(transform(shingles, h32)) — computed in
    one codegen stage per row, no shuffle, no UDF.
    """
    sh = shingles(text_col, n)

    def hasher(seed: str):
        # NB: the lambda must take exactly one arg — a second (defaulted)
        # arg makes PySpark treat it as an (element, index) lambda.
        return lambda s: h32(s, seed)

    return [
        F.array_min(F.transform(sh, hasher(f"mh{i}"))).alias(f"mh{i}")
        for i in range(k)
    ]


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = MINHASH_K,
    rows_per_band: int = LSH_ROWS_PER_BAND,
    n: int = 3,
) -> DataFrame:
    """LSH candidate pairs: docs sharing any MinHash band.

    banding: band_hash = md5(mh_i || ',' || mh_j ...); shuffle keys are
    (band_id, band_hash) so bucket sizes stay tiny and the self-join is
    per-bucket. Output: (doc_a, doc_b) distinct with doc_a < doc_b.
    """
    sigs = df.select(F.col(id_col).alias("doc_id"), *minhash_signature(text_col, k, n))
    sigs = sigs.filter(F.col("mh0").isNotNull())
    n_bands = k // rows_per_band
    bands = []
    for b in range(n_bands):
        parts = [
            F.col(f"mh{b * rows_per_band + r}").cast("string")
            for r in range(rows_per_band)
        ]
        bands.append(
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(F.concat_ws(",", *parts)).alias("band_hash"),
            )
        )
    exploded = sigs.select(
        "doc_id", F.explode(F.array(*bands)).alias("band")
    ).select("doc_id", "band.band_id", "band.band_hash")
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def simhash16(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """16-bit SimHash per document (token multiplicity weighted).

    explode(tokens) → 16 conditional sums (one per bit) in a single
    groupBy — Spark runs all 16 aggregates in one pass with map-side
    partials, so the shuffle carries 16 longs per doc, not the tokens.
    """
    tok = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("tok")
    ).withColumn("h", h32(F.col("tok"), "simhash"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(16)
    ]
    agg = tok.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for b in range(16):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else (sim + term)
    return agg.select("doc_id", sim.cast("long").alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate (doc_a, doc_b) pairs.

    The verify stage after LSH: joins the shingle arrays onto the pair
    list (both joins broadcast-able when the candidate set is small) and
    computes |A∩B| / |A∪B| on distinct shingle sets.
    """
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(shingles(text_col, n)).alias("sh"),
    )
    j = (
        pairs.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    return j.select(
        "doc_a",
        "doc_b",
        round6(inter / F.greatest(union, F.lit(1)).cast("double")).alias("jaccard"),
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = "label",
) -> DataFrame:
    """Embedding near-dup pairs: cosine >= threshold within a block.

    ``block_col`` keys the self-join (LSH-bucket / label / shard) so the
    join is per-block instead of a global cross product — the 100 TB
    pattern is block-by-bucket then verify, same as MinHash-LSH.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(F.col(id_col).alias("vid"), v.alias("v"), *( [F.col(block_col).alias("blk")] if block_col else []))
    a, b = base.alias("a"), base.alias("b")
    cond = F.col("a.vid") < F.col("b.vid")
    if block_col:
        cond = cond & (F.col("a.blk") == F.col("b.blk"))
    sim = cosine(F.col("a.v"), F.col("b.v"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.vid").alias("vec_a"),
            F.col("b.vid").alias("vec_b"),
            round6(sim).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
