"""Metadata-only column rename / drop (lake/table.py rename_column,
drop_column) — the Iceberg ALTER TABLE RENAME/DROP COLUMN analog.

No data file rewrites: reads request both the current and every retired
physical name and coalesce forward. The cost of name-based (vs field-id)
resolution is enforced loudly: a retired name can never be re-added.
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from datax_spark.lake.mor import MorTable
from datax_spark.lake.table import LakeTable, SchemaEvolutionError
from datax_spark.operators.merge import merge_apply


def _table(spark, tmp_path, name="t", cls=LakeTable, **kw):
    schema = StructType(
        [
            StructField("k", StringType()),
            StructField("v", StringType()),
            StructField("n", IntegerType()),
        ]
    )
    return cls.create(
        spark, os.path.join(str(tmp_path), name), schema, ["k"], "k",
        num_buckets=4, **kw,
    )


def _apply(spark, t, batch_id, rows, ddl="k string, op string, seq long, v string, n int"):
    merge_apply(t, spark.createDataFrame(rows, ddl), batch_id)


def test_rename_preserves_old_files_and_mixes_eras(spark, tmp_path):
    t = _table(spark, tmp_path)
    _apply(spark, t, 0, [("a", "insert", 1, "va", 1), ("b", "insert", 2, "vb", 2)])
    t.rename_column("v", "content")
    assert [f.name for f in t.snapshot().schema.fields] == ["k", "content", "n"]
    # old files resolve under the new name
    got = {r["k"]: r["content"] for r in t.read().collect()}
    assert got == {"a": "va", "b": "vb"}
    # new writes use the new name; both eras coexist in one read
    _apply(
        spark, t, 1, [("c", "insert", 3, "vc", 3)],
        "k string, op string, seq long, content string, n int",
    )
    got = {r["k"]: r["content"] for r in t.read().collect()}
    assert got == {"a": "va", "b": "vb", "c": "vc"}
    # an update to a pre-rename key works (merge rewrites under new name)
    _apply(
        spark, t, 2, [("a", "update", 4, "va2", 1)],
        "k string, op string, seq long, content string, n int",
    )
    got = {r["k"]: r["content"] for r in t.read().collect()}
    assert got == {"a": "va2", "b": "vb", "c": "vc"}


def test_rename_chain_and_time_travel(spark, tmp_path):
    t = _table(spark, tmp_path)
    _apply(spark, t, 0, [("a", "insert", 1, "x", 1)])
    v_before = t.current_version()
    t.rename_column("v", "v2")
    t.rename_column("v2", "v3")
    assert t.snapshot().properties["renames"] == {"v3": ["v", "v2"]}
    assert {r["k"]: r["v3"] for r in t.read().collect()} == {"a": "x"}
    # time travel to before the rename shows the era's own name
    old = t.read(version=v_before)
    assert "v" in old.columns and "v3" not in old.columns
    assert old.collect()[0]["v"] == "x"


def test_retired_names_are_burned(spark, tmp_path):
    t = _table(spark, tmp_path)
    _apply(spark, t, 0, [("a", "insert", 1, "x", 1)])
    t.rename_column("v", "content")
    # batch re-introducing the retired name is refused at evolve time
    with pytest.raises(SchemaEvolutionError, match="RETIRED"):
        _apply(spark, t, 1, [("d", "insert", 9, "boom", 4)])
    # renaming another column INTO a retired name is refused
    with pytest.raises(SchemaEvolutionError, match="retired"):
        t.rename_column("n", "v")
    # renaming onto an existing column is refused
    with pytest.raises(SchemaEvolutionError, match="present"):
        t.rename_column("n", "content")


def test_drop_column_and_no_resurrection(spark, tmp_path):
    t = _table(spark, tmp_path)
    _apply(spark, t, 0, [("a", "insert", 1, "x", 7)])
    t.drop_column("n")
    assert [f.name for f in t.snapshot().schema.fields] == ["k", "v"]
    assert "n" not in t.read().columns
    # dropping also burns the name: old files still hold values under it
    with pytest.raises(SchemaEvolutionError, match="RETIRED"):
        _apply(spark, t, 1, [("b", "insert", 2, "y", 8)])
    # dropping a renamed column burns the whole chain
    t.rename_column("v", "content")
    t.drop_column("content")
    assert set(t.snapshot().properties["retired_cols"]) == {"v", "content", "n"}


def test_ddl_guards(spark, tmp_path):
    t = _table(
        spark, tmp_path, constraints={"n_pos": "n IS NULL OR n >= 0"}
    )
    _apply(spark, t, 0, [("a", "insert", 1, "x", 1)])
    with pytest.raises(SchemaEvolutionError, match="key / bucket"):
        t.rename_column("k", "key")
    with pytest.raises(SchemaEvolutionError, match="key / bucket"):
        t.drop_column("k")
    with pytest.raises(SchemaEvolutionError, match="constraint"):
        t.rename_column("n", "m")
    with pytest.raises(SchemaEvolutionError, match="constraint"):
        t.drop_column("n")
    with pytest.raises(SchemaEvolutionError, match="no such"):
        t.rename_column("zzz", "q")
    with pytest.raises(SchemaEvolutionError, match="invalid"):
        t.rename_column("v", "_meta")


def test_rename_then_widen(spark, tmp_path):
    t = _table(spark, tmp_path)
    _apply(spark, t, 0, [("a", "insert", 1, "x", 5)])
    t.rename_column("n", "num")
    big = 2**40
    _apply(
        spark, t, 1, [("b", "insert", 2, "y", big)],
        "k string, op string, seq long, v string, num long",
    )
    out = t.read()
    assert isinstance(out.schema["num"].dataType, LongType)
    assert {r["k"]: r["num"] for r in out.collect()} == {"a": 5, "b": big}


def test_mor_rename_across_base_and_delta(spark, tmp_path):
    t = _table(spark, tmp_path, cls=MorTable)
    _apply(spark, t, 0, [("a", "insert", 1, "va", 1), ("b", "insert", 2, "vb", 2)])
    t.compact()  # old-name BASE files
    t.rename_column("v", "content")
    _apply(
        spark, t, 1, [("b", "update", 3, "vb2", 2), ("c", "insert", 4, "vc", 3)],
        "k string, op string, seq long, content string, n int",
    )
    got = {r["k"]: r["content"] for r in t.read().collect()}
    assert got == {"a": "va", "b": "vb2", "c": "vc"}
    # compaction folds the delta'd buckets into files under the CURRENT
    # name; untouched buckets legitimately keep the retired physical name
    # (the rename is metadata-only). No file ever holds BOTH names.
    t.compact()
    got = {r["k"]: r["content"] for r in t.read().collect()}
    assert got == {"a": "va", "b": "vb2", "c": "vc"}
    import pyarrow.parquet as pq

    snap = t.snapshot()
    saw_new = False
    for b in snap.buckets:
        for rel in t._abs_files(snap, [int(b)], "base"):
            names = pq.read_schema(rel).names
            assert not ("content" in names and "v" in names)
            saw_new = saw_new or "content" in names
    assert saw_new  # the rewritten (delta'd) buckets migrated physically


def test_read_changes_across_rename(spark, tmp_path):
    t = _table(spark, tmp_path)
    _apply(spark, t, 0, [("a", "insert", 1, "va", 1)])
    v0 = t.current_version()
    _apply(spark, t, 1, [("b", "insert", 2, "vb", 2)])
    t.rename_column("v", "content")
    _apply(
        spark, t, 2, [("a", "update", 3, "va2", 1)],
        "k string, op string, seq long, content string, n int",
    )
    feed = t.read_changes(v0).collect()
    assert all("content" in r.asDict() for r in feed)
    by_type = {(r["k"], r["_change_type"]): r["content"] for r in feed}
    assert by_type[("b", "insert")] == "vb"
    assert by_type[("a", "update_preimage")] == "va"
    assert by_type[("a", "update_postimage")] == "va2"


def test_scan_filter_and_stats_fail_open_on_renamed_col(spark, tmp_path):
    t = _table(spark, tmp_path, stats_cols=["n"])
    _apply(spark, t, 0, [("a", "insert", 1, "x", 1), ("b", "insert", 2, "y", 9)])
    t.rename_column("n", "num")
    assert t.snapshot().properties["stats_cols"] == ["num"]
    # residual filter on the new name is correct; old files (stats keyed
    # under the retired name) are kept, never mis-pruned
    plan = t.plan_scan([("num", ">=", 5)])
    assert plan["files_kept"] == plan["files_total"]  # fail open
    got = {r["k"] for r in t.scan([("num", ">=", 5)]).collect()}
    assert got == {"b"}
    # a rewrite re-keys the stats under the current name and prunes again
    t.rewrite_clustered(["num"], target_file_rows=1)
    _apply(
        spark, t, 1, [("c", "insert", 3, "z", 100)],
        "k string, op string, seq long, v string, num int",
    )
    plan = t.plan_scan([("num", ">=", 50)])
    assert plan["files_kept"] < plan["files_total"]
    got = {r["k"] for r in t.scan([("num", ">=", 50)]).collect()}
    assert got == {"c"}


def test_rename_plan_stays_one_scan(spark, tmp_path):
    """The coalesce-forward read is still ONE parquet scan (no union of
    per-era reads, no extra exchange)."""
    t = _table(spark, tmp_path)
    _apply(spark, t, 0, [("a", "insert", 1, "x", 1)])
    t.rename_column("v", "content")
    _apply(
        spark, t, 1, [("b", "insert", 2, "y", 2)],
        "k string, op string, seq long, content string, n int",
    )
    plan = t.read()._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert "Exchange" not in plan


def test_streaming_apply_across_rename(spark, tmp_path):
    """tail_and_apply keeps working after a mid-stream rename: batches
    already written under the OLD upstream name fail LOUDLY (retired
    name), while a renamed upstream applies cleanly — schema evolution
    under streaming is explicit, never silent corruption."""
    from pyspark.sql.types import LongType, TimestampType

    from datax_spark.sources.changelog import generate_changelog, write_segments
    from datax_spark.streaming.pipeline import PipelineConfig, tail_and_apply

    schema = StructType(
        [
            StructField("repo", StringType()),
            StructField("path", StringType()),
            StructField("commit", StringType()),
            StructField("lang", StringType()),
            StructField("content", StringType()),
        ]
    )
    t = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t"), schema,
        ["repo", "path", "commit"], "repo", num_buckets=4,
    )
    log = generate_changelog(
        spark, n_events=800, n_keys=100, events_per_segment=400
    )
    logdir = os.path.join(str(tmp_path), "log")
    write_segments(log, logdir)
    cfg = PipelineConfig(quarantine_dir=os.path.join(str(tmp_path), "q"))
    tail_and_apply(
        spark, t.path, logdir, os.path.join(str(tmp_path), "ck1"),
        log.schema, config=cfg, max_files_per_trigger=10,
    )
    n_before = t.count()
    assert n_before > 0
    t.rename_column("content", "body")
    # a renamed upstream (new segments carry `body`) applies cleanly
    log2 = (
        generate_changelog(
            spark, n_events=400, n_keys=100, events_per_segment=400, seed=7
        )
        .withColumn("seq", F.col("seq") + 800)
        .withColumnRenamed("content", "body")
    )
    logdir2 = os.path.join(str(tmp_path), "log2")
    write_segments(log2, logdir2)
    cfg2 = PipelineConfig(
        quarantine_dir=os.path.join(str(tmp_path), "q"), stream_id="s2"
    )
    tail_and_apply(
        spark, t.path, logdir2, os.path.join(str(tmp_path), "ck2"),
        log2.schema, config=cfg2, max_files_per_trigger=10,
    )
    out = t.read()
    assert "body" in out.columns and out.count() > n_before
    # an upstream STILL sending the retired name fails loudly
    logdir3 = os.path.join(str(tmp_path), "log3")
    write_segments(
        generate_changelog(
            spark, n_events=100, n_keys=50, events_per_segment=100, seed=9
        ),
        logdir3,
    )
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from datax_spark.lake.table import SchemaEvolutionError as SEE

    cfg3 = PipelineConfig(
        quarantine_dir=os.path.join(str(tmp_path), "q"), stream_id="s3"
    )
    with pytest.raises((SEE, StreamingQueryException, Py4JJavaError)) as ei:
        tail_and_apply(
            spark, t.path, logdir3, os.path.join(str(tmp_path), "ck3"),
            log.schema, config=cfg3, max_files_per_trigger=10,
        )
    assert "RETIRED" in str(ei.value)
    # and the failed stream changed nothing
    assert "body" in t.read().columns


def test_rename_to_cdc_reserved_name_refused(spark, tmp_path):
    """Review fix: 'op'/'seq'/'ts'/'batch_file' are claimed by the
    change-apply conform step — a payload column renamed onto them would
    be silently overwritten with marker values on the next apply."""
    t = _table(spark, tmp_path)
    for bad in ("op", "seq", "ts", "batch_file"):
        with pytest.raises(SchemaEvolutionError, match="reserved"):
            t.rename_column("v", bad)
