"""Bigram LM quality scoring (functions/text.bigram_lm_*).

The oracle contract hinges on two pins: (1) the Spark fit and the local
DuckDB fit produce BIT-identical (w1, w2, logp) tables from the same
parquet — counts are integers, the log runs once driver-side; (2) the
per-doc sum is an ordered left fold, so engine accumulation order can
never change the result.
"""

from __future__ import annotations

import math

import pytest

from datax_spark.functions.text import (
    LM_ALPHA,
    bigram_lm_fit,
    bigram_lm_fit_local,
    bigram_lm_scores,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat ran"),
    (2, "solo"),           # 1 token -> no bigrams -> NULL score
    (3, ""),               # 0 tokens
    (4, "the cat sat on the mat the cat"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_local_fit_matches_spark_fit(spark, tmp_path, docs):
    p = str(tmp_path / "docs.parquet")
    docs.toPandas().to_parquet(p)
    table_s, oov_s = bigram_lm_fit(docs)
    table_l, oov_l = bigram_lm_fit_local(p)
    assert oov_s == oov_l  # bit equality, not approx
    assert table_s == table_l


def test_fit_probabilities_are_add_alpha(docs):
    table, oov = bigram_lm_fit(docs)
    d = {(w1, w2): lp for w1, w2, lp in table}
    # corpus: vocab = {the, cat, sat, on, mat, ran, solo} -> V=7
    # B('the','cat') = 4 (docs 0, 1, and twice in 4);
    # C('the') = 6 (the->cat x4, the->mat x2)
    v = 7
    assert d[("the", "cat")] == math.log(
        (4 + LM_ALPHA) / (6 + LM_ALPHA * v)
    )
    assert d[("cat", "ran")] == math.log(
        (1 + LM_ALPHA) / (3 + LM_ALPHA * v)
    )
    assert oov == math.log(1.0 / v)


def test_scores_shape_and_edges(spark, docs):
    fit = bigram_lm_fit(docs)
    rows = {
        r["doc_id"]: r for r in bigram_lm_scores(docs, fit).collect()
    }
    assert len(rows) == 5
    assert rows[2]["n_bigrams"] == 0 and rows[2]["lm_score"] is None
    assert rows[3]["n_bigrams"] == 0 and rows[3]["lm_score"] is None
    assert rows[0]["n_bigrams"] == 5
    assert rows[4]["n_bigrams"] == 7
    # repeating familiar bigrams scores HIGHER (less negative) than the
    # doc carrying the rare 'cat ran' transition
    assert rows[4]["lm_score"] > rows[1]["lm_score"]
    # exact value for doc 1: bigrams (the,cat) (cat,ran);
    # C('the')=6, C('cat')=3 (cat->sat x2, cat->ran x1)
    v = 7
    expect = (
        math.log((4 + LM_ALPHA) / (6 + LM_ALPHA * v))
        + math.log((1 + LM_ALPHA) / (3 + LM_ALPHA * v))
    ) / 2
    expect = math.floor(expect * 1e6 + 0.5) / 1e6
    assert rows[1]["lm_score"] == expect


def test_oov_arm_scores_out_of_corpus_docs(spark, docs):
    fit = bigram_lm_fit(docs)
    other = spark.createDataFrame(
        [(9, "zebra quagga")], "doc_id long, text string"
    )
    row = bigram_lm_scores(other, fit).first()
    assert row["n_bigrams"] == 1
    expect = math.floor(math.log(1.0 / 7) * 1e6 + 0.5) / 1e6
    assert row["lm_score"] == expect


def test_fit_table_guard(spark, monkeypatch):
    import datax_spark.functions.text as T

    monkeypatch.setattr(T, "LM_MAX_TABLE", 2)
    docs = spark.createDataFrame(
        [(0, "a b c d e")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="bigram table"):
        bigram_lm_fit(docs)
