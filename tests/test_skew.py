"""Hot-key skew behavior of the dedup/apply path.

The north rule calls out hot-repo skew (DataX defeats it with x5
over-split + resource-mark shuffling, ReaderSplitUtil.java:64-72,
JobAssignUtil.java:41-49). Our primary defense is the max_by aggregation
form (map-side partial combine bounds any reducer's input by the map
partition count); the salted window form covers the pathological case.
These tests pin the correctness of both under an extreme distribution.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datax_spark.operators.dedup import dedup_latest, dedup_latest_window


def _skewed_events(spark, n=20_000):
    """~90% of events hit one key; the rest spread over 1000 keys."""
    df = spark.range(n)
    hot = F.col("id") % 10 != 0
    return df.select(
        F.when(hot, F.lit("hot/repo")).otherwise(
            F.concat(F.lit("r"), (F.col("id") % 1000))
        ).alias("repo"),
        F.lit("p").alias("path"),
        F.when(hot, F.lit("c")).otherwise(
            F.concat(F.lit("c"), (F.col("id") % 1000))
        ).alias("commit"),
        F.lit("py").alias("lang"),
        F.concat(F.lit("v"), F.col("id")).alias("content"),
        F.lit("update").alias("op"),
        F.col("id").alias("seq"),
    )


def test_skewed_dedup_agg_correct(spark):
    ev = _skewed_events(spark)
    out = dedup_latest(ev, ["repo", "path", "commit"])
    rows = {(r["repo"], r["commit"]): r for r in out.collect()}
    hot = rows[("hot/repo", "c")]
    # the winner must be the max-seq event of the hot key
    max_hot = ev.filter(F.col("repo") == "hot/repo").agg(F.max("seq")).first()[0]
    assert hot["seq"] == max_hot and hot["content"] == f"v{max_hot}"
    assert len(rows) == 1 + ev.filter(F.col("repo") != "hot/repo").select(
        "repo", "commit").distinct().count()


def test_skewed_window_salted_matches_agg(spark):
    ev = _skewed_events(spark, n=10_000)
    agg = {(r["repo"], r["commit"]): r["seq"]
           for r in dedup_latest(ev, ["repo", "path", "commit"]).collect()}
    salted = {(r["repo"], r["commit"]): r["seq"]
              for r in dedup_latest_window(
                  ev, ["repo", "path", "commit"], salt_buckets=8).collect()}
    assert agg == salted


def test_partial_aggregation_in_plan(spark):
    """The plan must show partial max_by BEFORE the exchange."""
    ev = _skewed_events(spark, n=1000)
    plan = dedup_latest(ev, ["repo", "path", "commit"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "partial_max_by" in plan and "Exchange" in plan
    # executedPlan prints top-down: the final agg (above the Exchange)
    # comes first, the partial agg (below it, i.e. map-side) comes after.
    assert plan.index("partial_max_by") > plan.index("Exchange")
