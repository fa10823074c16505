"""Fat-topic routing: one envelope stream, several destination tables.

Covers streaming/router.py — union-schema parse, per-table fenced
fan-out, zero-row skip, unknown-table policy, and the streaming tail.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from datax_spark.lake.mor import MorTable
from datax_spark.lake.table import LakeTable
from datax_spark.sources.envelope import from_debezium
from datax_spark.streaming.pipeline import PipelineConfig
from datax_spark.streaming.router import (
    UnroutableTableError,
    apply_batch_routed,
    tail_and_apply_routed,
    union_payload_schema,
)

DOCS = StructType(
    [StructField(c, StringType()) for c in
     ["repo", "path", "commit", "lang", "content"]]
)
USERS = StructType(
    [
        StructField("id", StringType()),
        StructField("name", StringType()),
        StructField("score", LongType()),
    ]
)


def _dbz(table, after, op, lsn, before=None):
    return json.dumps(
        {"before": before, "after": after, "op": op, "ts_ms": 1,
         "source": {"lsn": lsn, "table": table}}
    )


def _doc(repo, content):
    return {"repo": repo, "path": "p", "commit": "c",
            "lang": "na", "content": content}


def _user(uid, name, score):
    return {"id": uid, "name": name, "score": score}


def _mk_tables(spark, tmp_path):
    docs = LakeTable.create(
        spark, str(tmp_path / "docs"), DOCS,
        ["repo", "path", "commit"], "repo", 4,
    )
    users = MorTable.create(
        spark, str(tmp_path / "users"), USERS, ["id"], "id", 4
    )
    return {"docs": docs, "users": users}


def _parse(spark, tables, lines):
    raw = spark.createDataFrame([(x,) for x in lines], "value string")
    return from_debezium(
        raw, union_payload_schema(tables), table_col="_table"
    )


MIXED_B1 = [
    _dbz("docs", _doc("r1", "a"), "c", 1),
    _dbz("docs", _doc("r2", "b"), "c", 2),
    _dbz("users", _user("u1", "ada", 10), "c", 3),
    _dbz("users", _user("u1", "ada", 11), "u", 4),
    _dbz("docs", None, "d", 5, before=_doc("r2", "b")),
]


def test_routed_apply_two_tables(spark, tmp_path):
    tables = _mk_tables(spark, tmp_path)
    rb = apply_batch_routed(tables, _parse(spark, tables, MIXED_B1), 1)
    assert sorted(rb.metrics) == ["docs", "users"]
    assert rb.metrics["docs"].total_records == 3
    assert rb.metrics["users"].total_records == 2
    assert rb.unknown == {} and rb.total_records == 5
    docs = {r["repo"]: r["content"] for r in tables["docs"].read().collect()}
    assert docs == {"r1": "a"}  # r2 inserted then deleted
    users = {
        (r["id"], r["name"]): r["score"]
        for r in tables["users"].read().collect()
    }
    assert users == {("u1", "ada"): 11}  # latest-wins on lsn


def test_routed_replay_and_fence_independence(spark, tmp_path):
    """A replayed batch id no-ops pointwise; a table absent from batch 1
    still applies batch 1's id later (its own fence never advanced)."""
    tables = _mk_tables(spark, tmp_path)
    docs_only = [_dbz("docs", _doc("r1", "a"), "c", 1)]
    rb1 = apply_batch_routed(tables, _parse(spark, tables, docs_only), 1)
    assert sorted(rb1.metrics) == ["docs"]  # zero users rows: skipped
    assert rb1.metrics["docs"].applied
    v_users = tables["users"].snapshot().version
    # replay of batch 1: docs fences, users (now with rows) APPLIES —
    # exactly the crash-between-tables recovery contract
    rb2 = apply_batch_routed(tables, _parse(spark, tables, MIXED_B1), 1)
    assert not rb2.metrics["docs"].applied
    assert rb2.metrics["users"].applied
    assert tables["users"].snapshot().version > v_users
    users = {r["id"]: r["score"] for r in tables["users"].read().collect()}
    assert users == {"u1": 11}
    # docs kept batch 1's original state (stale replay rows fenced out)
    docs = {r["repo"]: r["content"] for r in tables["docs"].read().collect()}
    assert docs == {"r1": "a"}


def test_unknown_table_policy(spark, tmp_path):
    tables = _mk_tables(spark, tmp_path)
    lines = MIXED_B1 + [_dbz("ghost", {"id": "x"}, "c", 9)]
    with pytest.raises(UnroutableTableError, match="ghost"):
        apply_batch_routed(tables, _parse(spark, tables, lines), 1)
    # error mode must not half-apply: both tables untouched
    assert tables["docs"].read().count() == 0
    rb = apply_batch_routed(
        tables, _parse(spark, tables, lines), 1, on_unknown="skip"
    )
    assert rb.unknown == {"ghost": 1}
    assert rb.metrics["docs"].applied and rb.metrics["users"].applied
    assert rb.total_records == 6


def test_union_schema_conflict_raises(spark, tmp_path):
    docs = LakeTable.create(
        spark, str(tmp_path / "d2"), DOCS, ["repo", "path", "commit"],
        "repo", 2,
    )
    clash = StructType(
        [StructField("id", StringType()),
         StructField("content", LongType())]  # content is string in DOCS
    )
    other = LakeTable.create(
        spark, str(tmp_path / "o2"), clash, ["id"], "id", 2
    )
    with pytest.raises(ValueError, match="content"):
        union_payload_schema({"docs": docs, "other": other})


def test_tail_routed_stream(spark, tmp_path):
    """Streaming tail of a fat-topic JSON-lines dump: two segments, two
    destination tables, per-table exactly-once state."""
    tables = _mk_tables(spark, tmp_path)
    seg0 = MIXED_B1
    seg1 = [
        _dbz("users", _user("u2", "bob", 1), "c", 6),
        _dbz("docs", _doc("r1", "a2"), "u", 7),
        _dbz("users", None, "d", 8, before=_user("u1", "ada", 11)),
    ]
    log_dir = tmp_path / "fatlog"
    for i, seg in enumerate([seg0, seg1]):
        (spark.createDataFrame([(x,) for x in seg], "value string")
            .coalesce(1).write.text(str(log_dir / f"seg={i}")))
    results = []
    tail_and_apply_routed(
        spark, tables, str(log_dir), str(tmp_path / "ckpt"),
        envelope="debezium", results=results,
    )
    assert len(results) == 2
    docs = {r["repo"]: r["content"] for r in tables["docs"].read().collect()}
    assert docs == {"r1": "a2"}
    users = {r["id"]: r["name"] for r in tables["users"].read().collect()}
    assert users == {"u2": "bob"}


def test_envelope_table_col_all_parsers(spark):
    """All three envelope parsers surface the source-table name."""
    from datax_spark.sources.envelope import from_canal, from_maxwell

    dbz = spark.createDataFrame(
        [(_dbz("t1", _doc("r", "x"), "c", 1),)], "value string"
    )
    assert from_debezium(dbz, DOCS, table_col="_t").collect()[0]["_t"] == "t1"
    canal = spark.createDataFrame(
        [(json.dumps({"data": [_doc("r", "x")], "old": None,
                      "type": "INSERT", "es": 1, "ts": 2, "id": 1,
                      "isDdl": "false", "table": "t2"}),)],
        "value string",
    )
    assert from_canal(canal, DOCS, table_col="_t").collect()[0]["_t"] == "t2"
    mx = spark.createDataFrame(
        [(json.dumps({"database": "db", "table": "t3", "type": "insert",
                      "ts": 1, "xid": 1, "position": "bin.000001:4",
                      "data": _doc("r", "x")}),)],
        "value string",
    )
    assert from_maxwell(mx, DOCS, table_col="_t").collect()[0]["_t"] == "t3"


# ------------------------------------------------------ consistent reads


MIXED_B2 = [
    _dbz("docs", _doc("r1", "a2"), "u", 6),
    _dbz("users", _user("u1", "ada", 20), "u", 7),
]


def test_read_consistent_over_torn_fanout(spark, tmp_path):
    """A crash mid-fan-out leaves current-state reads straddling a batch;
    read_consistent resolves every table to the cut marker's position."""
    from datax_spark.streaming.router import read_consistent

    tables = _mk_tables(spark, tmp_path)
    cut = str(tmp_path / "cut.json")
    apply_batch_routed(
        tables, _parse(spark, tables, MIXED_B1), 1, cut_path=cut
    )
    # simulate the crash: batch 2 reaches docs, dies before users (and
    # before the cut marker advances) — exactly what a partial
    # apply_batch_routed leaves behind
    docs_half = [x for x in MIXED_B2 if '"docs"' in x]
    apply_batch_routed(
        {"docs": tables["docs"]},
        _parse(spark, tables, docs_half), 2,
    )
    # current-state reads straddle batch 2...
    assert {r["repo"]: r["content"] for r in
            tables["docs"].read().collect()} == {"r1": "a2"}
    assert {r["id"]: r["score"] for r in
            tables["users"].read().collect()} == {"u1": 11}
    # ...the consistent cut does not
    views = read_consistent(tables, cut)
    assert {r["repo"]: r["content"] for r in
            views["docs"].collect()} == {"r1": "a"}
    assert {r["id"]: r["score"] for r in
            views["users"].collect()} == {"u1": 11}
    # recovery replays batch 2 whole: docs fences, users applies, the
    # marker advances, and the cut now shows both at batch 2
    rb = apply_batch_routed(
        tables, _parse(spark, tables, MIXED_B2), 2, cut_path=cut
    )
    assert not rb.metrics["docs"].applied and rb.metrics["users"].applied
    views = read_consistent(tables, cut)
    assert {r["repo"]: r["content"] for r in
            views["docs"].collect()} == {"r1": "a2"}
    assert {r["id"]: r["score"] for r in
            views["users"].collect()} == {"u1": 20}


def test_cut_marker_never_regresses(spark, tmp_path):
    from datax_spark.streaming.router import read_cut_marker

    tables = _mk_tables(spark, tmp_path)
    cut = str(tmp_path / "cut.json")
    apply_batch_routed(tables, _parse(spark, tables, MIXED_B1), 1,
                       cut_path=cut)
    apply_batch_routed(tables, _parse(spark, tables, MIXED_B2), 2,
                       cut_path=cut)
    assert read_cut_marker(cut) == 2
    # replayed old batch: every table no-ops AND the marker stays put
    apply_batch_routed(tables, _parse(spark, tables, MIXED_B1), 1,
                       cut_path=cut)
    assert read_cut_marker(cut) == 2


def test_version_at_batch(spark, tmp_path):
    """Time travel by replay position on a single table."""
    from datax_spark.streaming.pipeline import apply_batch

    table = LakeTable.create(
        spark, str(tmp_path / "t"), DOCS, ["repo", "path", "commit"],
        "repo", 4,
    )
    v_create = table.current_version()
    raw1 = _parse(spark, {"docs": table}, [_dbz("docs", _doc("r1", "a"), "c", 1)])
    raw2 = _parse(spark, {"docs": table}, [_dbz("docs", _doc("r1", "b"), "u", 2)])
    apply_batch(table, raw1.drop("_table"), 0)
    v0 = table.current_version()
    apply_batch(table, raw2.drop("_table"), 1)
    assert table.version_at_batch("default", 0) == v0
    assert table.version_at_batch("default", 1) == table.current_version()
    # a version predating the stream's first apply qualifies for batch -1
    assert table.version_at_batch("default", -1) == v_create
    assert {r["repo"]: r["content"]
            for r in table.read(version=table.version_at_batch("default", 0))
            .collect()} == {"r1": "a"}
