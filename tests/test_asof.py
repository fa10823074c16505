"""As-of join (operators/asof.py) — union+window formulation."""

import pytest
from pyspark.sql import functions as F

from datax_spark.operators.asof import asof_join

VERSIONS = [
    # (key, vt, op, val)
    ("a", 10, "insert", "a1"),
    ("a", 20, "update", "a2"),
    ("a", 30, "delete", None),
    ("a", 40, "insert", "a3"),
    ("b", 15, "insert", "b1"),
]


def _dfs(spark, probes):
    v = spark.createDataFrame(VERSIONS, "key string, vt long, op string, val string")
    p = spark.createDataFrame(probes, "key string, pt long, probe_id long")
    return p, v


def test_backward_match_and_ties(spark):
    p, v = _dfs(
        spark,
        [("a", 5, 1), ("a", 10, 2), ("a", 25, 3), ("a", 99, 4), ("b", 14, 5),
         ("c", 50, 6)],
    )
    out = asof_join(p, v, ["key"], "pt", "vt")
    got = {r["probe_id"]: (r["asof_t"], r["asof_val"]) for r in out.collect()}
    assert got[1] == (None, None)          # before any version
    assert got[2] == (10, "a1")            # equal-time version is visible
    assert got[3] == (20, "a2")
    assert got[4] == (40, "a3")
    assert got[5] == (None, None)          # b's first version is later
    assert got[6] == (None, None)          # unknown key


def test_delete_tombstone_via_payload_op(spark):
    p, v = _dfs(spark, [("a", 35, 1), ("a", 45, 2)])
    out = asof_join(p, v, ["key"], "pt", "vt")
    got = {
        r["probe_id"]: (r["asof_op"], r["asof_val"]) for r in out.collect()
    }
    # at t=35 the latest version is the delete: consumer sees op=delete
    assert got[1] == ("delete", None)
    assert got[2] == ("insert", "a3")


def test_tolerance_nulls_stale_matches(spark):
    p, v = _dfs(spark, [("a", 21, 1), ("a", 29, 2)])
    out = asof_join(p, v, ["key"], "pt", "vt", tolerance=5)
    got = {r["probe_id"]: r["asof_val"] for r in out.collect()}
    assert got[1] == "a2"   # 21 - 20 = 1 <= 5
    assert got[2] is None   # 29 - 20 = 9 > 5


def test_row_count_preserved(spark):
    probes = [("a", t, i) for i, t in enumerate(range(0, 100, 7))]
    p, v = _dfs(spark, probes)
    assert asof_join(p, v, ["key"], "pt", "vt").count() == len(probes)


def test_plan_has_no_join_node(spark):
    p, v = _dfs(spark, [("a", 5, 1)])
    plan = asof_join(p, v, ["key"], "pt", "vt")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_long_times_above_double_precision(spark):
    """Longs above 2^53 must order exactly (no double collapse): two
    adjacent versions stay distinct and the probe sees the right one."""
    base = 1 << 53
    v = spark.createDataFrame(
        [("a", base + 2, "old"), ("a", base + 3, "new")],
        "key string, vt long, val string",
    )
    p = spark.createDataFrame([("a", base + 2, 1)], "key string, pt long, probe_id long")
    out = asof_join(p, v, ["key"], "pt", "vt").collect()[0]
    assert out["asof_val"] == "old" and out["asof_t"] == base + 2


def test_forward_direction(spark):
    p, v = _dfs(spark, [("a", 5, 1), ("a", 10, 2), ("a", 25, 3), ("a", 99, 4)])
    out = asof_join(p, v, ["key"], "pt", "vt", direction="forward")
    got = {r["probe_id"]: (r["asof_t"], r["asof_val"]) for r in out.collect()}
    assert got[1] == (10, "a1")   # earliest at-or-after 5
    assert got[2] == (10, "a1")   # equal time matches
    assert got[3] == (30, None)   # next is the delete row at 30
    assert got[4] == (None, None)  # nothing after 99


def test_forward_tolerance(spark):
    p, v = _dfs(spark, [("a", 5, 1), ("a", 31, 2)])
    out = asof_join(p, v, ["key"], "pt", "vt", direction="forward", tolerance=6)
    got = {r["probe_id"]: r["asof_t"] for r in out.collect()}
    assert got[1] == 10   # 10 - 5 = 5 <= 6
    assert got[2] is None  # next version at 40: 40 - 31 = 9 > 6


def test_mixed_integral_time_types_stay_exact(spark):
    """int probes vs long versions above 2^53 (forward direction): a
    double coercion collapses 2^53+1 onto 2^53+2, making the "earliest
    version at-or-after" pick ambiguous and the returned asof_t wrong;
    a mixed-INTEGRAL pair must widen to long instead (round-4 s5)."""
    from datax_spark.operators.asof import asof_join

    b = 1 << 53
    versions = spark.createDataFrame(
        [("k", b + 1, "first"), ("k", b + 2, "second")],
        "k string, t long, val string",
    )
    probes = spark.createDataFrame([("k", 5)], "k string, pt int")
    got = asof_join(
        probes, versions, ["k"], "pt", "t", direction="forward"
    ).first()
    assert got["asof_val"] == "first"
    assert got["asof_t"] == b + 1  # exact long, not the collapsed double
