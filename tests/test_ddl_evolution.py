"""Mid-stream binlog DDL -> additive schema evolution (streaming/ddl.py,
LakeTable.add_columns, sources/envelope.ddl_from_maxwell)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from datax_spark.lake.mor import MorTable
from datax_spark.lake.table import LakeTable, SchemaEvolutionError
from datax_spark.sources.envelope import (
    MAXWELL_CONTROL_TYPES,
    ddl_from_maxwell,
    mysql_type_to_spark,
)
from datax_spark.streaming.ddl import (
    apply_batch_ddl,
    apply_segments_ddl,
    ddl_new_fields,
    tail_and_apply_ddl,
)
from datax_spark.streaming.pipeline import PipelineConfig, apply_segments

PCOLS = ["repo", "path", "commit", "lang", "content"]
KEYS = ["repo", "path", "commit"]
SCHEMA = StructType([StructField(c, StringType()) for c in PCOLS])


def _mx(typ, data, pos):
    return json.dumps(
        {"database": "db", "table": "repos", "type": typ, "ts": 1,
         "xid": pos, "position": f"bin.000001:{pos}", "data": data}
    )


def _row(repo, content, **extra):
    d = {"repo": repo, "path": "p", "commit": "c", "lang": "na",
         "content": content}
    d.update(extra)
    return d


def _alter(new_cols, table="repos"):
    """A Maxwell table-alter whose def carries the FULL post-alter
    column list (the base payload plus new_cols)."""
    cols = [{"type": "varchar", "name": c} for c in PCOLS] + [
        {"type": t, "name": n, "signed": True} for n, t in new_cols
    ]
    return json.dumps(
        {"type": "table-alter", "database": "db", "table": table,
         "ts": 2, "sql": "alter table ...",
         "def": {"database": "db", "table": table, "columns": cols,
                 "primary-key": KEYS}}
    )


def _write_segments(root, segments):
    logdir = os.path.join(root, "log")
    for i, lines in enumerate(segments):
        d = os.path.join(logdir, f"seg={i}")
        os.makedirs(d)
        with open(os.path.join(d, "part.json"), "w") as f:
            f.write("\n".join(lines) + "\n")
    return logdir


def _create(spark, root, name="t", mor=False):
    cls = MorTable if mor else LakeTable
    return cls.create(
        spark, os.path.join(root, name), SCHEMA, KEYS, "repo", num_buckets=4
    )


# ------------------------------------------------------------ type map


def test_mysql_type_map():
    assert mysql_type_to_spark("bigint") == LongType()
    assert mysql_type_to_spark("int") == LongType()
    assert mysql_type_to_spark("tinyint") == LongType()
    assert mysql_type_to_spark("decimal") == DoubleType()
    assert mysql_type_to_spark("varchar") == StringType()
    assert mysql_type_to_spark("longtext") == StringType()
    assert mysql_type_to_spark("blob") == StringType()  # JSON transport
    assert mysql_type_to_spark("bool") == BooleanType()
    assert mysql_type_to_spark("date") == DateType()
    assert mysql_type_to_spark("DATETIME ") == TimestampType()  # normalized
    with pytest.raises(ValueError, match="unmapped MySQL type"):
        mysql_type_to_spark("geometry")


def test_ddl_from_maxwell_parses_and_filters(spark):
    raw = spark.createDataFrame(
        [(_alter([("stars", "bigint")]),),
         (_alter([("other", "int")], table="elsewhere"),),
         (_mx("insert", _row("r1", "a"), 1),),
         (json.dumps({"type": "bootstrap-start", "table": "repos"}),)],
        "value string",
    )
    rows = ddl_from_maxwell(raw, table="repos").collect()
    assert len(rows) == 1
    cols = {c["name"]: c["type"] for c in rows[0]["columns"]}
    assert cols["stars"] == "bigint" and cols["repo"] == "varchar"
    # no table filter: both alters surface
    assert ddl_from_maxwell(raw).count() == 2


# ------------------------------------------------------------ add_columns


def test_add_columns_metadata_only_idempotent(spark, tmp_path):
    table = _create(spark, str(tmp_path))
    v0 = table.current_version()
    snap = table.add_columns([StructField("stars", LongType())])
    assert snap.version == v0 + 1
    assert "stars" in [f.name for f in table.snapshot().schema.fields]
    # replay: same field -> NO new version published
    snap2 = table.add_columns([StructField("stars", LongType())])
    assert snap2.version == snap.version
    # type conflict with an existing column raises
    with pytest.raises(SchemaEvolutionError, match="type changes"):
        table.add_columns([StructField("stars", StringType())])


def test_add_columns_guards(spark, tmp_path):
    table = _create(spark, str(tmp_path))
    with pytest.raises(SchemaEvolutionError, match="invalid"):
        table.add_columns([StructField("_hidden", LongType())])
    with pytest.raises(SchemaEvolutionError, match="reserved"):
        table.add_columns([StructField("seq", LongType())])
    table.add_columns([StructField("tmp", LongType())])
    table.drop_column("tmp")
    with pytest.raises(SchemaEvolutionError, match="RETIRED"):
        table.add_columns([StructField("tmp", LongType())])


def test_add_columns_old_rows_read_null(spark, tmp_path):
    table = _create(spark, str(tmp_path))
    logdir = _write_segments(
        str(tmp_path), [[_mx("insert", _row("r1", "a"), 1)]]
    )
    apply_segments(spark, table, logdir, envelope="maxwell")
    table.add_columns([StructField("stars", LongType())])
    row = table.read().select("repo", "stars").first()
    assert row["repo"] == "r1" and row["stars"] is None


# ------------------------------------------------------------ apply drivers


def _ddl_segments():
    """seg0: 2 inserts (pre-alter). seg1: alter + update/insert carrying
    the new column + a delete. Final latest-wins state:
    r1 -> ('a2', 7), r3 -> ('x', 9); r2 deleted; r4 never altered-in."""
    seg0 = [_mx("insert", _row("r1", "a"), 1),
            _mx("insert", _row("r2", "b"), 2),
            _mx("insert", _row("r4", "keep"), 3)]
    seg1 = [_alter([("stars", "bigint")]),
            _mx("update", _row("r1", "a2", stars=7), 4),
            _mx("insert", _row("r3", "x", stars=9), 5),
            _mx("delete", _row("r2", "b"), 6)]
    return [seg0, seg1]


EXPECT = [("r1", "a2", 7), ("r3", "x", 9), ("r4", "keep", None)]


def _final(table):
    return [
        (r["repo"], r["content"], r["stars"])
        for r in table.read().orderBy("repo")
        .select("repo", "content", "stars").collect()
    ]


@pytest.mark.parametrize("mor", [False, True], ids=["cow", "mor"])
def test_mid_stream_alter_batch_driver(spark, tmp_path, mor):
    table = _create(spark, str(tmp_path), mor=mor)
    logdir = _write_segments(str(tmp_path), _ddl_segments())
    ms = apply_segments_ddl(spark, table, logdir)
    assert [m.applied for m in ms] == [True, True]
    assert _final(table) == EXPECT
    # pre-alter row (r4, never touched after the DDL) reads null — the
    # upstream database's own semantics for rows never updated since.
    v = table.current_version()
    ms2 = apply_segments_ddl(spark, table, logdir, start_after_batch=-1)
    assert all(not m.applied for m in ms2)
    assert table.current_version() == v  # replay: no empty DDL commits


def test_without_ddl_driver_column_is_dropped(spark, tmp_path):
    """Documents the gap the feature closes: the fixed-schema envelope
    mode silently loses post-alter column values."""
    table = _create(spark, str(tmp_path))
    logdir = _write_segments(str(tmp_path), _ddl_segments())
    apply_segments(spark, table, logdir, envelope="maxwell")
    assert "stars" not in table.read().columns


def test_control_types_not_quarantined(spark, tmp_path):
    """DDL/control messages are CONSUMED, not dirty; a genuinely unknown
    op still quarantines."""
    qdir = str(tmp_path / "q")
    table = _create(spark, str(tmp_path))
    seg = [_alter([("stars", "bigint")]),
           json.dumps({"type": "bootstrap-start", "table": "repos"}),
           _mx("insert", _row("r1", "a"), 1),
           _mx("mystery-op", _row("r9", "z"), 2)]
    logdir = _write_segments(str(tmp_path), [seg])
    cfg = PipelineConfig(quarantine_dir=qdir)
    ms = apply_segments_ddl(spark, table, logdir, config=cfg)
    assert ms[0].dirty_records == 1  # only mystery-op
    reasons = {
        r["_dirty_reason"]
        for r in spark.read.parquet(qdir).select("_dirty_reason").collect()
    }
    assert reasons == {"invalid_op"}
    assert set(MAXWELL_CONTROL_TYPES) >= {"table-alter", "bootstrap-start"}


def test_fat_topic_source_table_filter(spark, tmp_path):
    """source_table scopes BOTH planes: another table's alter must not
    evolve this table, and its rows must not apply."""
    table = _create(spark, str(tmp_path))
    seg = [_alter([("noise", "bigint")], table="elsewhere"),
           json.dumps({"database": "db", "table": "elsewhere",
                       "type": "insert", "ts": 1, "xid": 1,
                       "position": "bin.000001:1",
                       "data": _row("rX", "nope")}),
           _mx("insert", _row("r1", "a"), 2)]
    logdir = _write_segments(str(tmp_path), [seg])
    apply_segments_ddl(spark, table, logdir, source_table="repos")
    cols = table.read().columns
    assert "noise" not in cols
    assert _final_repos(table) == [("r1", "a")]


def _final_repos(table):
    return [
        (r["repo"], r["content"])
        for r in table.read().orderBy("repo").select("repo", "content").collect()
    ]


def test_ddl_new_fields_rejects_non_maxwell(spark, tmp_path):
    table = _create(spark, str(tmp_path))
    raw = spark.createDataFrame([("{}",)], "value string")
    with pytest.raises(ValueError, match="only 'maxwell'"):
        ddl_new_fields(table, raw, envelope="debezium")


def test_streaming_tail_ddl(spark, tmp_path):
    """Structured Streaming twin: per-micro-batch dynamic schema, then a
    RESTART with more post-alter segments resumes from checkpoint."""
    table = _create(spark, str(tmp_path))
    logdir = _write_segments(str(tmp_path), _ddl_segments())
    ckpt = str(tmp_path / "ckpt")
    tail_and_apply_ddl(
        spark, table.path, logdir, ckpt, timeout_sec=180.0
    )
    assert _final(table) == EXPECT
    # new post-alter segment after restart: schema already evolved,
    # fence resumes past applied batches
    d = os.path.join(logdir, "seg=2")
    os.makedirs(d)
    with open(os.path.join(d, "part.json"), "w") as f:
        f.write(_mx("update", _row("r4", "keep2", stars=11), 7) + "\n")
    tail_and_apply_ddl(
        spark, table.path, logdir, ckpt, timeout_sec=180.0
    )
    assert _final(table) == [("r1", "a2", 7), ("r3", "x", 9),
                             ("r4", "keep2", 11)]


# ------------------------------------------------------------ routed DDL


def _mx_t(table, typ, data, pos):
    return json.dumps(
        {"database": "db", "table": table, "type": typ, "ts": 1,
         "xid": pos, "position": f"bin.000001:{pos}", "data": data}
    )


def test_routed_ddl_per_table_evolution(spark, tmp_path):
    """One fat topic, two destinations: the alter evolves ONLY its own
    table; both tables' states converge; replay is a full no-op."""
    from datax_spark.streaming.ddl import apply_batch_routed_ddl

    tables = {
        "even": _create(spark, str(tmp_path), "even"),
        "odd": _create(spark, str(tmp_path), "odd"),
    }
    raw0 = spark.createDataFrame(
        [(_mx_t("even", "insert", _row("e1", "a"), 1),),
         (_mx_t("odd", "insert", _row("o1", "b"), 2),)],
        "value string",
    )
    raw1 = spark.createDataFrame(
        [(_alter([("stars", "bigint")], table="even"),),
         (_mx_t("even", "update", _row("e1", "a2", stars=5), 3),),
         (_mx_t("odd", "update", _row("o1", "b2"), 4),)],
        "value string",
    )
    apply_batch_routed_ddl(tables, raw0, 0)
    rb = apply_batch_routed_ddl(tables, raw1, 1)
    assert set(rb.metrics) == {"even", "odd"}
    assert _final(tables["even"]) == [("e1", "a2", 5)]
    assert "stars" not in tables["odd"].read().columns
    assert _final_repos(tables["odd"]) == [("o1", "b2")]
    # replay both batches: fences hold, no empty DDL versions
    vs = {n: t.current_version() for n, t in tables.items()}
    rb0 = apply_batch_routed_ddl(tables, raw0, 0)
    rb1 = apply_batch_routed_ddl(tables, raw1, 1)
    assert all(not m.applied for m in {**rb0.metrics, **rb1.metrics}.values())
    assert vs == {n: t.current_version() for n, t in tables.items()}


def test_routed_ddl_unknown_table(spark, tmp_path):
    from datax_spark.streaming.ddl import apply_batch_routed_ddl
    from datax_spark.streaming.router import UnroutableTableError

    tables = {"even": _create(spark, str(tmp_path), "even")}
    raw = spark.createDataFrame(
        [(_alter([("stars", "bigint")], table="ghost"),),
         (_mx_t("even", "insert", _row("e1", "a"), 1),)],
        "value string",
    )
    with pytest.raises(UnroutableTableError, match="ghost"):
        apply_batch_routed_ddl(tables, raw, 0)
    # skip mode: the ghost alter is ignored, the data applies
    apply_batch_routed_ddl(tables, raw, 0, on_unknown="skip")
    assert _final_repos(tables["even"]) == [("e1", "a")]


def test_routed_ddl_streaming(spark, tmp_path):
    from datax_spark.streaming.ddl import tail_and_apply_routed_ddl

    tables = {
        "even": _create(spark, str(tmp_path), "even"),
        "odd": _create(spark, str(tmp_path), "odd"),
    }
    seg0 = [_mx_t("even", "insert", _row("e1", "a"), 1),
            _mx_t("odd", "insert", _row("o1", "b"), 2)]
    seg1 = [_alter([("stars", "bigint")], table="even"),
            _mx_t("even", "update", _row("e1", "a2", stars=5), 3)]
    logdir = _write_segments(str(tmp_path), [seg0, seg1])
    results = []
    tail_and_apply_routed_ddl(
        spark, tables, logdir, str(tmp_path / "ckpt"),
        timeout_sec=180.0, results=results,
    )
    assert len(results) == 2
    assert _final(tables["even"]) == [("e1", "a2", 5)]
    assert "stars" not in tables["odd"].read().columns


# ------------------------------------------------------------ CLI


def test_cli_ddl_batch(spark, tmp_path):
    """jobs/cdc_apply_job.py --envelope maxwell --ddl drives the same
    evolve-then-apply path (in-process: get_spark reuses the session)."""
    import jobs.cdc_apply_job as job

    logdir = _write_segments(str(tmp_path), _ddl_segments())
    tpath = str(tmp_path / "cli_t")
    rc = job.main([
        "--log-dir", logdir, "--table", tpath, "--create",
        "--buckets", "4", "--envelope", "maxwell", "--ddl",
    ])
    assert rc in (0, None)
    assert _final(LakeTable(spark, tpath)) == EXPECT


def test_cli_ddl_guards(tmp_path):
    import jobs.cdc_apply_job as job

    assert job.main(["--log-dir", "x", "--table", "y",
                     "--envelope", "debezium", "--ddl"]) == 2
    # streaming SCD2 fuses a fixed parse schema; batch --scd2 --ddl works
    assert job.main(["--log-dir", "x", "--table", "y", "--scd2",
                     "--envelope", "maxwell", "--ddl", "--streaming",
                     "--checkpoint", "z"]) == 2


def test_scd2_segments_ddl(spark, tmp_path):
    """History-mode DDL: intervals closed BEFORE the alter read NULL in
    the new column (audit-faithful: the column did not exist then);
    post-alter intervals carry it. Replay is a complete no-op."""
    from datax_spark.operators.scd2 import (
        VALID_TO,
        apply_segments_scd2,
        create_scd2_table,
    )

    table = create_scd2_table(
        spark, str(tmp_path / "h"), SCHEMA,
        natural_key=KEYS, bucket_key="repo", num_buckets=4,
    )
    logdir = _write_segments(str(tmp_path), _ddl_segments())
    rs = apply_segments_scd2(
        spark, table, logdir, envelope="maxwell", ddl=True
    )
    assert [r.applied for r in rs] == [True, True]
    hist = {
        (r["repo"], r["content"]): (r["stars"], r[VALID_TO] is None)
        for r in table.read().collect()
    }
    # r1: 'a' closed pre-alter (stars null), 'a2' current with stars=7
    assert hist[("r1", "a")] == (None, False)
    assert hist[("r1", "a2")] == (7, True)
    # r2 deleted post-alter: its insert interval closed, stars null
    assert hist[("r2", "b")][0] is None
    assert hist[("r3", "x")] == (9, True)
    assert hist[("r4", "keep")] == (None, True)
    v = table.current_version()
    rs2 = apply_segments_scd2(
        spark, table, logdir, envelope="maxwell", ddl=True,
        start_after_batch=-1,
    )
    assert all(not r.applied for r in rs2)
    assert table.current_version() == v


def test_change_feed_across_ddl(spark, tmp_path):
    """read_changes diffing a pre-alter version against a post-alter one
    conforms both sides: the pre-image reads NULL in the added column."""
    from datax_spark.streaming.ddl import apply_batch_ddl

    table = _create(spark, str(tmp_path))
    seg0, seg1 = _ddl_segments()

    def _raw(lines):
        return spark.createDataFrame([(x,) for x in lines], "value string")

    apply_batch_ddl(table, _raw(seg0), 0)
    v_pre = table.current_version()
    apply_batch_ddl(table, _raw(seg1), 1)
    ch = table.read_changes(v_pre, table.current_version())
    rows = {
        (r["repo"], r["_change_type"]): r["stars"] for r in ch.collect()
    }
    assert rows[("r1", "update_preimage")] is None
    assert rows[("r1", "update_postimage")] == 7
    assert rows[("r3", "insert")] == 9
    assert ("r2", "delete") in rows
