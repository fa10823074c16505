"""Incremental LSH dedup maintenance + inverted-index search."""

from pyspark.sql import functions as F

from datax_spark.functions.dedup import (
    band_table,
    incremental_lsh_pairs,
    lsh_candidate_pairs,
    pairs_from_bands,
)
from datax_spark.functions.text import build_postings, search_postings


def _docs(spark, sf_dir):
    import os

    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _pairs(df):
    return sorted((r["doc_a"], r["doc_b"]) for r in df.collect())


def test_incremental_equals_full_corpus(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    mid = docs.agg(F.floor(F.max("doc_id") / 2)).first()[0]
    b1 = docs.filter(F.col("doc_id") <= mid)
    b2 = docs.filter(F.col("doc_id") > mid)

    store = band_table(b1)
    old_pairs = pairs_from_bands(store)
    new_pairs, new_bands = incremental_lsh_pairs(store, b2)
    got = _pairs(old_pairs.unionByName(new_pairs).distinct())

    want = _pairs(lsh_candidate_pairs(docs))
    assert got == want and len(want) > 0


def test_store_union_equals_full_bands(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    mid = docs.agg(F.floor(F.max("doc_id") / 2)).first()[0]
    store = band_table(docs.filter(F.col("doc_id") <= mid))
    _, new_bands = incremental_lsh_pairs(store, docs.filter(F.col("doc_id") > mid))
    got = sorted(tuple(r) for r in store.unionByName(new_bands).collect())
    want = sorted(tuple(r) for r in band_table(docs).collect())
    assert got == want


def test_incremental_emits_only_new_member_pairs(spark, sf_dir):
    """Every incremental pair touches at least one batch-2 doc."""
    docs = _docs(spark, sf_dir)
    mid = docs.agg(F.floor(F.max("doc_id") / 2)).first()[0]
    store = band_table(docs.filter(F.col("doc_id") <= mid))
    new_pairs, _ = incremental_lsh_pairs(store, docs.filter(F.col("doc_id") > mid))
    bad = new_pairs.filter(
        (F.col("doc_a") <= mid) & (F.col("doc_b") <= mid)
    ).count()
    assert bad == 0


def test_search_postings_manual(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha alpha delta"),  # dup token counts once
            (3, "epsilon zeta"),
            (4, "beta delta alpha"),
        ],
        "doc_id long, text string",
    )
    got = [
        (r["doc_id"], r["score"])
        for r in search_postings(build_postings(docs), ["alpha", "beta", "delta"], k=3).collect()
    ]
    assert got == [(4, 3), (1, 2), (2, 2)]


def test_posting_index_prunes_partitions(spark, sf_dir, tmp_path):
    """Persisted posting index: same answers as the direct search, AND
    the term buckets prune partitions at plan time."""
    import os

    from datax_spark.functions.text import (
        posting_index_search,
        write_posting_index,
    )

    docs = _docs(spark, sf_dir)
    idx = os.path.join(str(tmp_path), "pidx")
    write_posting_index(docs, idx, n_buckets=16)
    terms = ["vector", "customer", "merge"]
    got = posting_index_search(spark, idx, terms, k=15, n_buckets=16)
    want = [
        (r["doc_id"], r["score"])
        for r in search_postings(build_postings(docs), terms, k=15).collect()
    ]
    assert [(r["doc_id"], r["score"]) for r in got.collect()] == want
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "tbucket" in plan, plan
