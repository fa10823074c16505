"""Tests for the training-data function library (text/dedup/similarity)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from datax_spark.functions import (
    brute_force_topk,
    embedding_neardup_pairs,
    exact_dup_clusters,
    fingerprint,
    ivf_topk,
    lang_predict,
    lsh_candidate_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    quality_metrics,
    shingles,
    simhash16,
    token_count_bpe,
    token_count_ws,
)
from datax_spark.functions.multimodal import decode_stub, to_media
from datax_spark.functions.text import h32

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_h32_matches_python(spark):
    df = spark.createDataFrame([("hello",)], ["s"])
    got = df.select(h32("s", "seed").alias("h")).first()["h"]
    want = int(hashlib.md5(b"seed|hello").hexdigest()[:8], 16)
    assert got == want


def test_token_counts(spark):
    df = spark.createDataFrame(
        [("a b  c", 3), ("", 0), ("  ", 0), ("one", 1)], ["s", "want"]
    )
    rows = df.select("want", token_count_ws("s").alias("got")).collect()
    assert all(r["got"] == r["want"] for r in rows)
    bpe = spark.createDataFrame([("ab 12 c!?",)], ["s"]).select(
        token_count_bpe("s").alias("n")
    ).first()["n"]
    # [ab][1][2][c][!?]
    assert bpe == 5


def test_shingles_and_fingerprint(spark):
    df = spark.createDataFrame([("The quick brown fox",), ("ab",)], ["s"])
    rows = df.select(shingles("s", 3).alias("sh"), fingerprint("s").alias("fp")).collect()
    assert rows[0]["sh"] == ["the quick brown", "quick brown fox"]
    assert rows[1]["sh"] == []
    norm = "the quick brown fox"
    assert rows[0]["fp"] == hashlib.sha256(norm.encode()).hexdigest()[:16]


def test_lang_and_quality(docs):
    out = docs.select(
        "doc_id", lang_predict("text").alias("pred"),
        *[v.alias(k) for k, v in quality_metrics("text").items()],
    )
    r = out.first()
    assert r["pred"] in ("en", "de", "fr", "es", "it")
    assert 0.0 <= r["alpha_ratio"] <= 1.0
    assert 0.0 <= r["quality"] <= 1.0


def test_exact_dup_clusters(spark):
    df = spark.createDataFrame(
        [(1, "Same  text"), (2, "same text"), (3, "other")], ["doc_id", "text"]
    )
    out = {r["digest"]: r for r in exact_dup_clusters(df).collect()}
    counts = sorted(r["dup_count"] for r in out.values())
    assert counts == [1, 2]  # normalization collapses 1 and 2


def test_minhash_lsh_finds_neardups(docs):
    pairs = lsh_candidate_pairs(docs)
    n = pairs.count()
    assert n > 0
    jac = ngram_jaccard_pairs(docs, pairs)
    top = jac.orderBy(F.col("jaccard").desc()).first()
    assert top["jaccard"] > 0.8  # LSH candidates really are near-dups


def test_minhash_identical_docs_identical_sig(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        ["doc_id", "text"],
    )
    rows = df.select(*minhash_signature("text")).collect()
    assert rows[0] == rows[1]


def test_simhash_close_for_similar(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely unrelated words here entirely different"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["simhash"] for r in simhash16(df).collect()}
    d12 = bin(out[1] ^ out[2]).count("1")
    d13 = bin(out[1] ^ out[3]).count("1")
    assert d12 < d13


def test_brute_force_topk(emb):
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    rows = brute_force_topk(emb, qv, k=5).collect()
    assert rows[0]["vec_id"] == 0 and rows[0]["cosine_sim"] == 1.0
    sims = [r["cosine_sim"] for r in rows]
    assert sims == sorted(sims, reverse=True)


def test_ivf_topk_subset_of_bucket(emb):
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    rows = ivf_topk(emb, qv, k=5).collect()
    assert rows[0]["vec_id"] == 0  # query's own bucket contains itself


def test_embedding_neardup(emb):
    out = embedding_neardup_pairs(emb, threshold=0.2, block_col="label")
    rows = out.collect()
    assert all(r["cosine"] >= 0.2 and r["vec_a"] < r["vec_b"] for r in rows)


def test_multimodal_decode_stub(docs):
    dec = decode_stub(to_media(docs))
    r = dec.join(docs, "doc_id").select("doc_id", "byte_len", "content_sha", "text").first()
    assert r["byte_len"] == len(r["text"].encode())
    assert r["content_sha"] == hashlib.sha256(r["text"].encode()).hexdigest()


def test_neardup_clusters_connected_components(spark):
    from datax_spark.functions.dedup import neardup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (9, 1)], ["doc_a", "doc_b"]
    )
    out = {r["doc_id"]: (r["cluster_id"], r["keep"])
           for r in neardup_clusters(pairs).collect()}
    assert out[1] == (1, True) and out[2] == (1, False)
    assert out[3] == (1, False) and out[9] == (1, False)
    assert out[5] == (5, True) and out[6] == (5, False)


def test_ivf_multiprobe_recall_not_worse(emb):
    from datax_spark.functions.similarity import brute_force_topk, ivf_topk

    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = {r["vec_id"] for r in brute_force_topk(emb, qv, k=5).collect()}
    single = {r["vec_id"] for r in ivf_topk(emb, qv, k=5, n_probes=1).collect()}
    multi = {r["vec_id"] for r in ivf_topk(emb, qv, k=5, n_probes=5).collect()}
    assert len(multi & exact) >= len(single & exact)


def test_neardup_clusters_star_equals_label(spark):
    """Large/small-star and min-label propagation agree on a graph with
    chains, a cycle, and singleton pairs."""
    from datax_spark.functions.dedup import neardup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),      # chain
         (10, 11), (11, 12), (12, 10),        # cycle
         (20, 21),                            # pair
         (30, 31), (31, 32), (30, 32)],       # triangle
        ["doc_a", "doc_b"],
    )
    star = {(r["doc_id"], r["cluster_id"], r["keep"])
            for r in neardup_clusters(pairs, algorithm="star").collect()}
    label = {(r["doc_id"], r["cluster_id"], r["keep"])
             for r in neardup_clusters(pairs, algorithm="label").collect()}
    assert star == label
    roots = {c for _, c, _ in star}
    assert roots == {1, 10, 20, 30}


def test_neardup_clusters_nonconvergence_raises(spark):
    """Exhausting max_iter raises instead of silently returning partial
    labels (the round-1 silent-stop defect)."""
    import pytest as _pytest

    from datax_spark.functions.dedup import (
        ClusteringNotConverged,
        neardup_clusters,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], ["doc_a", "doc_b"]
    )
    with _pytest.raises(ClusteringNotConverged):
        neardup_clusters(chain, max_iter=1, algorithm="star").collect()
    with _pytest.raises(ClusteringNotConverged):
        neardup_clusters(chain, max_iter=2, algorithm="label").collect()
    # and the same graph converges with the default budget
    out = neardup_clusters(chain, algorithm="star")
    assert out.filter("cluster_id = 1").count() == 12


def test_embedding_neardup_default_sign_block(emb):
    """block_col=None now defaults to sign-bucket LSH blocking; the exact
    global join needs the explicit GLOBAL_BLOCK opt-in."""
    from datax_spark.functions.dedup import (
        GLOBAL_BLOCK,
        embedding_neardup_pairs,
    )

    auto = embedding_neardup_pairs(emb, 0.25, block_col=None)
    glob = embedding_neardup_pairs(emb, 0.25, block_col=GLOBAL_BLOCK)
    n_auto, n_glob = auto.count(), glob.count()
    assert 0 < n_auto <= n_glob  # blocked is a recall-subset of exact
    # blocked pairs are a subset of the global pairs
    assert auto.join(glob, ["vec_a", "vec_b"], "left_anti").count() == 0


def test_select_representatives_quality_and_ties(spark):
    from datax_spark.functions.dedup import select_representatives

    scored = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (4, 0.3), (9, 0.1)],
        "doc_id long, quality double",
    )
    # cluster 1 = {1,2,3}: 2 and 3 tie on quality -> smaller id (2) wins;
    # cluster 4 = {4}; doc 9 never appeared in a pair -> singleton
    clusters = spark.createDataFrame(
        [(1, 1, True), (2, 1, False), (3, 1, False), (4, 4, True)],
        "doc_id long, cluster_id long, keep boolean",
    )
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in select_representatives(scored, clusters).collect()
    }
    assert got == {(2, 1), (4, 4), (9, 9)}
