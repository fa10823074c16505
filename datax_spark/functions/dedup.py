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


def exact_dedup_reps(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep ONE representative row (the min-id member) per exact
    duplicate cluster — the first stage of every recipe pipeline.
    Equivalent to joining ``exact_dup_clusters``'s min_id back, done as
    one window so the full row survives without a second scan. SQL
    twin: ``min(doc_id) GROUP BY substr(sha256(normalized), 1, 16)``
    (the text_recipe oracle)."""
    from pyspark.sql import Window

    w = Window.partitionBy("_dig").orderBy(id_col)
    return (
        df.withColumn("_dig", fingerprint(text_col))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_dig", "_rn")
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


def minhash_signatures_agg(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = MINHASH_K,
    n: int = 3,
) -> DataFrame:
    """MinHash signatures via explode + groupBy(min) — the pipeline form.

    Same values as ``minhash_signature`` (same hash family), different
    physical plan: shingles explode once, each shingle row hashes k ways,
    map-side partial min collapses to one row per doc before the shuffle.
    Aggregate outputs are real attributes, so downstream references (band
    hashes, joins) cost nothing — unlike the pure-projection form, where
    Catalyst's CollapseProject inlines the whole shingle pipeline again
    for every column reference (measured 60x blowup in the LSH join).
    Docs with fewer than ``n`` tokens produce no row (no shingles).
    """
    ex = df.select(
        F.col(id_col).alias("doc_id"), F.explode(shingles(text_col, n)).alias("s")
    )
    return ex.groupBy("doc_id").agg(
        *[F.min(h32(F.col("s"), f"mh{i}")).alias(f"mh{i}") for i in range(k)]
    )


def band_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = MINHASH_K,
    rows_per_band: int = LSH_ROWS_PER_BAND,
    n: int = 3,
) -> DataFrame:
    """(doc_id, band_id, band_hash) — the LSH signature STORE layout.

    band_hash = md5(mh_i || ',' || mh_j ...). This is the unit that
    persists between batches for incremental dedup: docs never need
    re-shingling once their bands are stored.
    """
    sigs = minhash_signatures_agg(df, text_col, id_col, k, n)
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
    return sigs.select(
        "doc_id", F.explode(F.array(*bands)).alias("band")
    ).select("doc_id", "band.band_id", "band.band_hash")


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = MINHASH_K,
    rows_per_band: int = LSH_ROWS_PER_BAND,
    n: int = 3,
) -> DataFrame:
    """LSH candidate pairs: docs sharing any MinHash band.

    banding: shuffle keys are (band_id, band_hash) so bucket sizes stay
    tiny and the self-join is per-bucket. Output: (doc_a, doc_b) distinct
    with doc_a < doc_b.
    """
    return pairs_from_bands(band_table(df, text_col, id_col, k, rows_per_band, n))


def pairs_from_bands(bands: DataFrame) -> DataFrame:
    """Candidate pairs from a (doc_id, band_id, band_hash) table.

    Equi-join via shared column names: an aliased self-join here keeps
    one lineage and Spark degenerates it to a nested-loop with the whole
    MinHash expression inlined into the predicate (O(n^2) re-hashing).
    """
    a = bands.withColumnRenamed("doc_id", "doc_a")
    b = bands.withColumnRenamed("doc_id", "doc_b")
    return (
        a.join(b, on=["band_id", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def incremental_lsh_pairs(
    store_bands: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = MINHASH_K,
    rows_per_band: int = LSH_ROWS_PER_BAND,
    n: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Candidate pairs introduced by a NEW batch against a persisted store.

    ``store_bands``: the accumulated (doc_id, band_id, band_hash) table of
    every previously-ingested doc (``band_table`` output, persisted as
    parquet between batches). Returns ``(new_pairs, new_bands)`` where
    ``new_pairs`` are exactly the candidate pairs with at least one member
    in the batch — banding is symmetric and per-pair, so

        pairs(corpus) = pairs(store) ∪ incremental(store, batch)

    holds by construction (the driver query dedup_incremental value-checks
    it against the full-corpus SQL oracle). Callers append ``new_bands``
    to the store afterward.

    100-TB shape: per batch the work is O(batch shingles) hashing + one
    equi-join on (band_id, band_hash). Keep the store BUCKETED on the band
    key (e.g. a LakeTable with bucket_key=band_hash) so only the batch
    side shuffles — the corpus-sized store never re-shingles and never
    re-shuffles. Contrast a naive re-run: O(corpus) hashing + O(corpus)
    shuffle on every batch.
    """
    new_bands = band_table(new_docs, text_col, id_col, k, rows_per_band, n)
    all_bands = store_bands.unionByName(new_bands)
    a = new_bands.withColumnRenamed("doc_id", "id_a")
    b = all_bands.withColumnRenamed("doc_id", "id_b")
    pairs = (
        a.join(b, on=["band_id", "band_hash"])
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("doc_a"),
            F.greatest("id_a", "id_b").alias("doc_b"),
        )
        .distinct()
    )
    return pairs, new_bands


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


class ClusteringNotConverged(RuntimeError):
    """Connected components hit max_iter without reaching a fixpoint."""


def _edge_signature(edges: DataFrame) -> tuple:
    """(count, order-free checksum) of an edge set — one narrow agg job.

    Decimal sum avoids ANSI long overflow on summed xxhash64 values.
    """
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
    ).first()
    return (row["n"], row["h"])


def _cc_star(
    pairs: DataFrame, max_iter: int, checkpoint_every: int = 3
) -> DataFrame:
    """Alternating large-star/small-star connected components.

    The O(log n)-round MapReduce CC algorithm (Kiveris et al., "Connected
    Components in MapReduce and Beyond"): each round is two grouped-min
    joins. Each round's edge set is persisted (one job: the signature agg
    materializes it); every ``checkpoint_every`` rounds a
    ``localCheckpoint`` truncates lineage so the plan stays O(1) deep no
    matter how many rounds run — the property the plain
    label-propagation loop lacks at 100-TB pair counts.
    At fixpoint the edge set is a star forest: every node points at its
    component minimum.
    """
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)  # pays the (expensive) pair pipeline once
    )
    # node set from the CHECKPOINTED edges — deriving it from `pairs`
    # would re-run the whole upstream (LSH) pipeline a second time
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    prev_sig = None
    prev_persisted = None
    converged = False
    for it in range(max_iter):
        # large-star: every neighbor v > u connects to m(u) = min(N(u) ∪ u)
        und = edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        m = (
            und.groupBy("src")
            .agg(F.min("dst").alias("mn"))
            .select("src", F.least("src", "mn").alias("m"))
        )
        large = (
            und.join(m, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )
        # small-star: direct edges large->small; every node in the group
        # (u and its smaller neighbors) connects to the group minimum.
        # No mid-round distincts: duplicate edges don't change any
        # grouped min, and the single end-of-round distinct canonicalizes
        # the set for the convergence signature — 2 fewer shuffles/round.
        d = large.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        m2 = d.groupBy("src").agg(F.min("dst").alias("m"))
        small = (
            d.join(m2, "src")
            # one pass: both group members (u and its smaller neighbor)
            # connect to the group min
            .select(F.explode(F.array("dst", "src")).alias("v"), "m")
            .select(F.col("v").alias("src"), F.col("m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        if (it + 1) % checkpoint_every == 0:
            edges = small.localCheckpoint(eager=True)
        else:
            edges = small.persist()
        sig = _edge_signature(edges)  # one action: materializes the cache
        if prev_persisted is not None:
            prev_persisted.unpersist()
        prev_persisted = edges if (it + 1) % checkpoint_every else None
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        raise ClusteringNotConverged(
            f"large/small-star CC did not reach a fixpoint in {max_iter} rounds"
        )
    # fixpoint edge set is (node -> component_min) stars; roots have no edge
    roots = edges.groupBy("src").agg(F.min("dst").alias("cluster_id"))
    return nodes.join(roots, nodes.node == roots.src, "left").select(
        F.col("node").alias("doc_id"),
        F.coalesce(F.col("cluster_id"), F.col("node")).alias("cluster_id"),
        (F.coalesce(F.col("cluster_id"), F.col("node")) == F.col("node")).alias(
            "keep"
        ),
    )


def _cc_label_propagation(pairs: DataFrame, max_iter: int) -> DataFrame:
    """Iterative min-label propagation (O(diameter) rounds).

    Kept as the cross-check variant: converges fast on the tiny-diameter
    components LSH near-dup graphs produce, but each round deepens the
    plan unless checkpointed — `localCheckpoint` every round bounds it.
    Raises ClusteringNotConverged instead of silently returning partial
    labels on max_iter exhaustion.
    """
    und = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    ).localCheckpoint(eager=True)
    labels = (
        und.select(F.col("src").alias("node")).distinct()
        .withColumn("cluster_id", F.col("node"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            und.join(labels, und.dst == labels.node)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("nmin"), F.col("cluster_id"))
                ).alias("cluster_id"),
                (
                    F.coalesce(F.col("nmin"), F.col("cluster_id"))
                    < F.col("cluster_id")
                ).cast("long").alias("_chg"),
            )
            .localCheckpoint(eager=True)  # one job: materialize + truncate
        )
        changed = new_labels.agg(F.sum("_chg")).first()[0] or 0
        labels = new_labels.drop("_chg")
        if changed == 0:
            converged = True
            break
    if not converged:
        raise ClusteringNotConverged(
            f"label propagation did not converge in {max_iter} rounds"
        )
    return labels.select(
        F.col("node").alias("doc_id"),
        "cluster_id",
        (F.col("node") == F.col("cluster_id")).alias("keep"),
    )


def neardup_clusters(
    pairs: DataFrame, max_iter: int = 20, algorithm: str = "star"
) -> DataFrame:
    """Connected components over near-dup pairs -> (doc_id, cluster_id, keep).

    The dedup *decision* stage: every doc in a candidate pair gets the
    minimum doc id reachable through the pair graph as its cluster id;
    ``keep`` marks the cluster representative.

    ``algorithm='star'`` (default): alternating large/small-star —
    O(log n) rounds regardless of component diameter, lineage truncated
    per round; the 100-TB path. ``algorithm='label'``: min-label
    propagation, O(diameter) rounds; kept for cross-checking. Both raise
    ``ClusteringNotConverged`` rather than silently returning partial
    labels when ``max_iter`` is exhausted.
    """
    # The pair list is usually the output of the (expensive) LSH pipeline;
    # both variants checkpoint it up front so no round recomputes it.
    if algorithm == "star":
        return _cc_star(pairs, max_iter)
    if algorithm == "label":
        return _cc_label_propagation(pairs, max_iter)
    raise ValueError(f"unknown algorithm {algorithm!r}")


GLOBAL_BLOCK = "__global__"  # explicit opt-in sentinel: one giant block


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = "label",
    sign_bits: int = 4,
) -> DataFrame:
    """Embedding near-dup pairs: cosine >= threshold within a block.

    ``block_col`` keys the self-join (LSH-bucket / label / shard) so the
    join is per-block instead of a global cross product — the 100 TB
    pattern is block-by-bucket then verify, same as MinHash-LSH.
    ``block_col=None`` defaults to a sign-bit LSH bucket of the vector
    itself (random-hyperplane blocking, recall-approximate like any LSH);
    pass ``block_col=GLOBAL_BLOCK`` to *opt in* to the exact global
    self-join — a deliberate decision at scale, never a silent default.
    """
    from datax_spark.functions.similarity import sign_bucket

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    if block_col == GLOBAL_BLOCK:
        blk = [F.lit(0).alias("blk")]
    elif block_col is None:
        blk = [sign_bucket(F.col(vec_col), sign_bits).alias("blk")]
    else:
        blk = [F.col(block_col).alias("blk")]
    base = df.select(F.col(id_col).alias("vid"), v.alias("v"), *blk)
    # Renamed-column equi-join on the block key (not an aliased self-join,
    # which would plan a nested loop re-deriving the vectors per pair).
    a = base.select(F.col("vid").alias("vec_a"), F.col("v").alias("va"), "blk")
    b = base.select(F.col("vid").alias("vec_b"), F.col("v").alias("vb"), "blk")
    sim = cosine(F.col("va"), F.col("vb"))
    return (
        a.join(b, on=["blk"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", round6(sim).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def select_representatives(
    scored: DataFrame,
    clusters: DataFrame,
    priority_col: str = "quality",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware dedup decision: keep the BEST doc per near-dup
    cluster instead of the arbitrary min-id one.

    ``scored``: one row per document with ``id_col`` + ``priority_col``
    (e.g. the text quality score) — higher is better, ties break to the
    smallest id so the choice is deterministic. ``clusters``: the
    (doc_id, cluster_id, keep) output of ``neardup_clusters``; documents
    absent from it are singletons and keep themselves.

    This is what a training-data pipeline actually wants from dedup:
    near-duplicate groups collapse to their highest-quality member, not
    to whichever happened to have the lowest id. Physical shape: one
    left join (cluster map is the small side — only docs that appear in
    a candidate pair), one per-cluster max_by aggregation (map-side
    partial), one semi-join back; no windows, no O(n^2).
    """
    member = clusters.select(id_col, "cluster_id")
    tagged = scored.join(member, id_col, "left").withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col))
    )
    rep = tagged.groupBy("cluster_id").agg(
        F.max_by(
            F.col(id_col),
            F.struct(
                F.col(priority_col).alias("p"),
                (-F.col(id_col)).alias("t"),  # ties -> smallest id wins
            ),
        ).alias("_rep_id")
    )
    return (
        tagged.join(rep, "cluster_id")
        .filter(F.col(id_col) == F.col("_rep_id"))
        .drop("_rep_id")
    )

def semantic_dedup(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.25,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): embedding-space
    semantic deduplication — cluster the corpus with a trained codebook,
    then within each cluster drop every vector that is a near-duplicate
    (cosine >= threshold) of a *more diverse* one.

    The published algorithm: k-means the embeddings, and inside each
    cluster keep, from every duplicate group, the example with the LOWEST
    cosine similarity to the centroid (the most diverse member). Their
    screening order is exactly "drop x iff some same-cluster y with
    sim(x, y) >= t precedes it", with precedence = farther-from-centroid
    first. Reproduced here with squared L2 distance to the assigned
    centroid as the precedence scalar (equivalent ordering for the keep
    rule; ties break to the smaller id so the decision is total):
    y beats x iff  d(y) > d(x)  or  (d(y) == d(x) and y.id < x.id).

    Physical shape (the 100 TB story): assignment is scan-fused literal
    arithmetic (centroid_best — no broadcast, no shuffle); the duplicate
    screen is a renamed-column equi-join on the cell id, so the
    all-pairs work is per-cluster, never global — the paper's own
    tractability argument (k grows with the corpus, keeping clusters
    small). One distinct + one broadcast-able anti-join finish it.
    No windows, no per-row Python.

    Oracle exactness: the fit is deterministic DATA (kmeans_fit /
    kmeans_fit_local, pinned bit-identical); distances are sequential
    folds over centroid literals and the assigned-cell distance is
    exactly least(d_0..d_k) (see centroid_best), so DuckDB reproduces
    assignment, precedence, and the rounded pair cosine bit-for-bit.

    Returns the KEPT rows as (id_col, cell).
    """
    from datax_spark.functions.similarity import centroid_best

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    best = centroid_best(v, centroids)
    base = df.select(
        F.col(id_col).alias("vid"),
        v.alias("v"),
        best["i"].cast("int").alias("cell"),
        best["d"].alias("dc"),
    )
    a = base.select(
        F.col("vid").alias("vec_a"), F.col("v").alias("va"),
        "cell", F.col("dc").alias("da"),
    )
    b = base.select(
        F.col("vid").alias("vec_b"), F.col("v").alias("vb"),
        "cell", F.col("dc").alias("db"),
    )
    beaten = (F.col("db") > F.col("da")) | (
        (F.col("db") == F.col("da")) & (F.col("vec_b") < F.col("vec_a"))
    )
    drops = (
        a.join(b, on=["cell"])
        .filter(F.col("vec_a") != F.col("vec_b"))
        .filter(round6(cosine(F.col("va"), F.col("vb"))) >= F.lit(threshold))
        .filter(beaten)
        .select("vec_a")
        .distinct()
    )
    return (
        base.join(drops, base["vid"] == drops["vec_a"], "left_anti")
        .select(F.col("vid").alias(id_col), "cell")
    )
