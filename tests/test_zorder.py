"""Z-order clustering rewrite: file skipping on EVERY participating dim."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from datax_spark.lake.table import LakeTable
from datax_spark.lake.zorder import column_bounds, zorder_expr

SCHEMA = StructType(
    [
        StructField("repo", StringType()),
        StructField("x", LongType()),
        StructField("y", LongType()),
        StructField("content", StringType()),
    ]
)


def _rows(spark, n=20_000):
    """Two INDEPENDENT uniform dimensions (hash-derived, deterministic)."""
    return spark.range(n).select(
        F.concat(F.lit("r"), F.col("id")).alias("repo"),
        F.pmod(F.xxhash64(F.lit("x"), F.col("id")), F.lit(10_000)).alias("x"),
        F.pmod(F.xxhash64(F.lit("y"), F.col("id")), F.lit(10_000)).alias("y"),
        F.concat(F.lit("c"), F.col("id")).alias("content"),
    )


def test_zorder_expr_locality(spark):
    """Morton math: neighbors in rank space interleave as documented."""
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 3)], "x long, y long"
    )
    z = zorder_expr(["x", "y"], {"x": (0, 3), "y": (0, 3)}, bits=2)
    got = {(r["x"], r["y"]): r["z"] for r in df.select("x", "y", z.alias("z")).collect()}
    # bits little-endian, x is dim 0: z = interleave(x0 y0 x1 y1)
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(3, 3)] == 15


def test_zorder_rewrite_prunes_both_dims(spark, tmp_path):
    """After rewrite_zordered(["x","y"]), a 10% range scan on EITHER
    dimension skips files; lexicographic clustering only prunes its
    leading column. Results always equal the unpruned filter."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["repo"], "repo", 1,
        stats_cols=["x", "y"],
    )
    t.bulk_load(_rows(spark))
    t.rewrite_zordered(["x", "y"], target_file_rows=1250)
    snap = t.snapshot()
    n_files = sum(len(fs) for fs in snap.buckets.values())
    assert n_files >= 8, "need multiple files for pruning to mean anything"

    for col in ("x", "y"):
        plan = t.plan_scan([(col, ">=", 9000)])
        assert plan["files_kept"] < plan["files_total"], (
            col, plan["files_kept"], plan["files_total"],
        )
        got = sorted(r["repo"] for r in t.scan([(col, ">=", 9000)]).collect())
        want = sorted(
            r["repo"] for r in t.read().filter(f"{col} >= 9000").collect()
        )
        assert got == want and got

    # contrast: 1-D lexicographic on x leaves y unprunable
    t2 = LakeTable.create(
        spark, str(tmp_path / "t2"), SCHEMA, ["repo"], "repo", 1,
        stats_cols=["x", "y"],
    )
    t2.bulk_load(_rows(spark))
    t2.rewrite_clustered(["x"], target_file_rows=1250)
    px = t2.plan_scan([("x", ">=", 9000)])
    py = t2.plan_scan([("y", ">=", 9000)])
    assert px["files_kept"] < px["files_total"]
    assert py["files_kept"] == py["files_total"], "lex sort can't prune y"
    # and z-order's x-pruning is not catastrophically worse than lex
    zx = t.plan_scan([("x", ">=", 9000)])
    assert zx["files_kept"] < zx["files_total"]


def test_zorder_bounds_helper(spark):
    df = spark.createDataFrame([(1, 10), (5, 2), (None, 7)], "a long, b long")
    b = column_bounds(df, ["a", "b"])
    assert b == {"a": (1.0, 5.0), "b": (2.0, 10.0)}
