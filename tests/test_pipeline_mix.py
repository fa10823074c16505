"""Token-budget mixture sampling, CCNet quality bucketing, and
deterministic shard packing (functions/text.py, round-4 session 7).

The exactness contracts under test:
- mixture: the Spark fit and the local DuckDB fit produce IDENTICAL ppm
  thresholds (integer agg + integer floor division — no floats), and the
  hash-threshold filter is monotone in the budget (raising a budget only
  ADDS rows — the incremental-rerun property stratified_sample pins).
- quality_buckets: rank is a deterministic total order (score DESC NULLS
  LAST, id) and the quantile cuts are integer comparisons, so bucket
  sizes follow floor math exactly and NULL-score docs sink to the tail.
- pack_shards: the distributed prefix sum is INVARIANT in the bucket
  count (1 bucket == 64 buckets == one global window), offsets tile the
  token stream exactly, and shard_id is integer division of the start.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datax_spark.functions.text import (
    MIX_PPM,
    _mixture_ppm,
    mixture_fit,
    mixture_fit_local,
    mixture_sample,
    pack_shards,
    quality_buckets,
)

DOCS_PQ = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS_PQ)


# ------------------------------------------------------------- mixture
def test_mixture_fit_matches_local_twin(docs):
    budgets = {"src0": 1500, "src1": 4000, "src2": 10**9, "src19": 0}
    assert mixture_fit(docs, budgets) == mixture_fit_local(DOCS_PQ, budgets)


def test_mixture_ppm_integer_math():
    totals = {"a": 1000, "b": 10, "c": 0}
    ppm = _mixture_ppm(totals, {"a": 300, "b": 10, "c": 5, "d": 7})
    assert ppm == {
        "a": 300 * MIX_PPM // 1000,  # under budget -> floor ratio
        "b": MIX_PPM,                # budget == total -> keep all
        "c": MIX_PPM,                # empty stratum -> keep all (vacuous)
        "d": MIX_PPM,                # absent stratum -> no rows to drop
    }
    assert _mixture_ppm({}, {"a": 0}) == {"a": MIX_PPM}  # 0 of 0
    assert _mixture_ppm({"a": 5}, {"a": 0}) == {"a": 0}  # 0 of 5 -> drop
    with pytest.raises(ValueError):
        _mixture_ppm({}, {"a": -1})


def test_mixture_monotone_in_budget(docs):
    lo = mixture_fit(docs, {"src0": 500})
    hi = mixture_fit(docs, {"src0": 1200})
    kept_lo = {r.doc_id for r in mixture_sample(docs, lo).collect()}
    kept_hi = {r.doc_id for r in mixture_sample(docs, hi).collect()}
    assert kept_lo < kept_hi  # strictly grows, never swaps rows


def test_mixture_whitelist_drops_unlisted(docs):
    out = mixture_sample(docs, {"src3": MIX_PPM}).collect()
    assert {r.source for r in out} == {"src3"}
    total = docs.filter(F.col("source") == "src3").count()
    assert len(out) == total  # ppm 1e6 keeps the whole stratum


def test_mixture_sample_rejects_bad_ppm(docs):
    with pytest.raises(ValueError):
        mixture_sample(docs, {"src0": MIX_PPM + 1}).collect()


# ----------------------------------------------------- quality buckets
def test_quality_buckets_integer_quantile_cuts(spark):
    # 10 docs in one lang, scores = rank order; head=0.2, middle=0.3
    rows = [(i, "xx", float(-i)) for i in range(10)]
    docs = spark.createDataFrame(
        [(i, "xx") for i, _, _ in rows], "doc_id long, lang string"
    )
    scores = spark.createDataFrame(rows, "doc_id long, lang string, s double")
    out = quality_buckets(
        docs, scores.select("doc_id", "s"), head=0.2, middle=0.3,
        score_col="s",
    ).collect()
    by_id = {r.doc_id: (r.lang_rank, r.bucket) for r in out}
    # rank follows score desc: doc 0 (score 0.0) ranks 1
    assert [by_id[i][0] for i in range(10)] == list(range(1, 11))
    assert [by_id[i][1] for i in range(10)] == (
        ["head"] * 2 + ["middle"] * 3 + ["tail"] * 5
    )


def test_quality_buckets_nulls_sink_and_ties_break_on_id(spark):
    docs = spark.createDataFrame(
        [(i, "xx") for i in range(4)], "doc_id long, lang string"
    )
    scores = spark.createDataFrame(
        [(0, None), (1, 1.0), (2, 1.0), (3, None)],
        "doc_id long, s double",
    )
    out = {
        r.doc_id: r.lang_rank
        for r in quality_buckets(
            docs, scores, head=0.5, middle=0.5, score_col="s"
        ).collect()
    }
    # tied scores order by doc_id; NULLs last, also by doc_id
    assert out == {1: 1, 2: 2, 0: 3, 3: 4}


def test_quality_buckets_validates_fractions(spark):
    docs = spark.createDataFrame([(1, "xx")], "doc_id long, lang string")
    scores = spark.createDataFrame([(1, 0.0)], "doc_id long, lm_score double")
    with pytest.raises(ValueError):
        quality_buckets(docs, scores, head=0.7, middle=0.5)


# -------------------------------------------------------------- shards
def test_pack_shards_bucket_count_invariant(docs):
    """The distributed prefix sum equals the single global window: the
    bucket count must never change a single (start_tok, shard_id)."""
    a = sorted(
        tuple(r) for r in pack_shards(docs, 2000, n_order_buckets=1).collect()
    )
    b = sorted(
        tuple(r) for r in pack_shards(docs, 2000, n_order_buckets=64).collect()
    )
    c = sorted(
        tuple(r) for r in pack_shards(docs, 2000, n_order_buckets=7).collect()
    )
    assert a == b == c


def test_pack_shards_offsets_tile_the_token_stream(docs):
    rows = pack_shards(docs, 500).collect()
    total = sum(r.n_tokens for r in rows)
    starts = sorted((r.start_tok, r.n_tokens, r.shard_id) for r in rows)
    pos = 0
    for start, n, shard in starts:
        assert start == pos  # exclusive prefix: gapless tiling
        assert shard == start // 500  # integer division, greedy-by-start
        pos += n
    assert pos == total


def test_pack_shards_validates_args(docs):
    with pytest.raises(ValueError):
        pack_shards(docs, 0)
    with pytest.raises(ValueError):
        pack_shards(docs, 10, n_order_buckets=0)


def test_pack_shards_window_is_not_single_partition(docs):
    """The 100-TB property: the cumsum window partitions on the hash
    bucket — no SinglePartition exchange anywhere in the plan."""
    df = pack_shards(docs, 2000)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


# ------------------------------------------------- fit-twin stability
def test_fit_locals_stable_under_join_shaped_rel():
    """Regression: the DuckDB fit twins must give identical results on
    a join-shaped relation (CTE referenced twice + arbitrary join
    output order). The original row_number() OVER () rid paired bigrams
    ACROSS documents nondeterministically downstream of a join — the
    composed text_recipe oracle flapped 37/39/45 rows per process."""
    from datax_spark.functions.text import bigram_lm_fit_local

    p = DOCS_PQ
    rel = (
        f"(SELECT d.* FROM read_parquet('{p}') d JOIN "
        f"(SELECT DISTINCT doc_id FROM read_parquet('{p}')) r "
        f"USING (doc_id))"
    )
    assert bigram_lm_fit_local("x", rel_sql=rel) == bigram_lm_fit_local(p)
    budgets = {"src0": 1500, "src1": 10**9}
    assert mixture_fit_local("x", budgets, rel_sql=rel) == mixture_fit_local(
        p, budgets
    )


def test_quality_buckets_no_int32_overflow_past_2147_docs(spark):
    """row_number() is INT; rank * 1e6 overflowed int32 at rank 2148
    (ANSI throws, non-ANSI silently misbuckets) until the rank widened
    to long BEFORE the multiply."""
    n = 3000
    docs = spark.createDataFrame(
        [(i, "xx") for i in range(n)], "doc_id long, lang string"
    )
    scores = spark.createDataFrame(
        [(i, float(-i)) for i in range(n)], "doc_id long, s double"
    )
    out = quality_buckets(
        docs, scores, head=0.1, middle=0.4, score_col="s"
    ).groupBy("bucket").count().collect()
    by = {r["bucket"]: r["count"] for r in out}
    assert by == {"head": 300, "middle": 1200, "tail": 1500}


def test_quality_buckets_rounds_nonrepresentable_fractions(spark):
    """0.3 * 1e6 = 299999.99...: int() truncation put the 30% boundary
    doc in 'middle'; round() honors the documented fraction."""
    docs = spark.createDataFrame(
        [(i, "xx") for i in range(10)], "doc_id long, lang string"
    )
    scores = spark.createDataFrame(
        [(i, float(-i)) for i in range(10)], "doc_id long, s double"
    )
    out = {
        r.doc_id: r.bucket
        for r in quality_buckets(
            docs, scores, head=0.3, middle=0.3, score_col="s"
        ).collect()
    }
    assert out[2] == "head"    # rank 3 of 10 IS the 30% head boundary
    assert out[5] == "middle"  # rank 6 of 10 IS the 60% cumulative cut


def test_mixture_fit_all_null_text_stratum(spark):
    """A stratum whose every text is NULL sums to NULL in both engines;
    the fit must treat it as 0 tokens, not TypeError on the driver."""
    docs = spark.createDataFrame(
        [(1, "a", None), (2, "b", "three real tokens")],
        "doc_id long, source string, text string",
    )
    ppm = mixture_fit(docs, {"a": 10, "b": 1})
    assert ppm["a"] == MIX_PPM  # 10-token budget over 0 tokens: keep all
    assert 0 < ppm["b"] < MIX_PPM


def test_lm_fit_local_no_doc_id_and_duplicate_rows(spark):
    """The fit twin pairs bigrams WITHIN each row (list_transform, no
    self-join) — so it needs no doc_id column, and duplicate rows count
    double exactly like the Spark fit over the same duplicated frame."""
    from datax_spark.functions.text import bigram_lm_fit, bigram_lm_fit_local

    rel = (
        "(SELECT * FROM (VALUES ('the cat sat'), ('the cat sat'), "
        "('dog ran')) v(text))"
    )
    local = bigram_lm_fit_local("unused", rel_sql=rel)
    sdf = spark.createDataFrame(
        [("the cat sat",), ("the cat sat",), ("dog ran",)], "text string"
    )
    assert local == bigram_lm_fit(sdf)


# ----------------------------- threshold variant == window-exact form
def _qb_pair(spark, rows, head, middle, B=1024):
    from datax_spark.functions.text import quality_buckets_threshold

    docs = spark.createDataFrame(
        [(i, l) for i, l, _ in rows], "doc_id long, lang string"
    )
    scores = spark.createDataFrame(
        [(i, s) for i, _, s in rows], "doc_id long, s double"
    )
    exact = {
        (r.doc_id): (r.lang, r.bucket)
        for r in quality_buckets(
            docs, scores, head=head, middle=middle, score_col="s"
        ).collect()
    }
    thr = {
        (r.doc_id): (r.lang, r.bucket)
        for r in quality_buckets_threshold(
            docs, scores, head=head, middle=middle, score_col="s",
            n_hist_buckets=B,
        ).collect()
    }
    return exact, thr


def test_threshold_variant_equals_window_form_randomized(spark):
    """The order-statistic form must reproduce the window form's EXACT
    assignment — ties, NULL scores, and tiny languages included."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(600):
        lang = rng.choice(["en", "de", "fr", "tiny"])
        if lang == "tiny" and i % 3:
            lang = "en"  # skew one language
        # coarse grid -> heavy ties; 10% NULLs
        s = None if rng.random() < 0.1 else float(rng.randint(0, 20)) / 4
        rows.append((i, lang, s))
    for head, middle in [(0.1, 0.4), (0.3, 0.3), (0.0, 0.5), (1.0, 0.0)]:
        exact, thr = _qb_pair(spark, rows, head, middle)
        assert thr == exact, (head, middle)


def test_threshold_variant_degenerate_and_bucket_count(spark):
    # all-equal scores (one histogram bucket) and B=1 (everything in
    # the cutoff bucket) both stay exact
    rows = [(i, "xx", 1.5) for i in range(50)] + [
        (100 + i, "yy", float(i % 2)) for i in range(7)
    ]
    exact, thr = _qb_pair(spark, rows, 0.2, 0.3)
    assert thr == exact
    exact1, thr1 = _qb_pair(spark, rows, 0.2, 0.3, B=1)
    assert thr1 == exact1 == exact


def test_threshold_variant_all_null_language(spark):
    rows = [(i, "nn", None) for i in range(9)] + [
        (50 + i, "en", float(i)) for i in range(10)
    ]
    exact, thr = _qb_pair(spark, rows, 0.4, 0.3)
    assert thr == exact


def test_threshold_variant_validates(spark):
    from datax_spark.functions.text import quality_buckets_threshold

    docs = spark.createDataFrame([(1, "xx")], "doc_id long, lang string")
    scores = spark.createDataFrame([(1, 0.0)], "doc_id long, lm_score double")
    with pytest.raises(ValueError):
        quality_buckets_threshold(docs, scores, head=0.9, middle=0.2)
    with pytest.raises(ValueError):
        quality_buckets_threshold(docs, scores, n_hist_buckets=0)


def test_threshold_variant_null_language_group(spark):
    """NULL lang is a language group of its own (review fix): both forms
    bucket it identically instead of the threshold form crashing."""
    rows = (
        [(i, None, float(i % 5)) for i in range(40)]
        + [(100 + i, "en", float(i)) for i in range(15)]
        + [(200 + i, None, None) for i in range(6)]  # NULL lang + NULL score
    )
    exact, thr = _qb_pair(spark, rows, 0.1, 0.4)
    assert thr == exact
    # all-NULL-score NULL-lang-only corpus (the by_null arm)
    rows2 = [(i, None, None) for i in range(12)]
    exact2, thr2 = _qb_pair(spark, rows2, 0.4, 0.3)
    assert thr2 == exact2
