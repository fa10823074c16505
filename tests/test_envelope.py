"""Debezium / Canal CDC envelope parsers -> canonical changelog."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from datax_spark.lake.table import LakeTable
from datax_spark.oracle import replay_oracle_pandas, state_fingerprint
from datax_spark.sources.changelog import generate_changelog
from datax_spark.sources.envelope import from_canal, from_debezium
from datax_spark.streaming.pipeline import apply_batch

PAYLOAD = StructType(
    [StructField(c, StringType()) for c in
     ["repo", "path", "commit", "lang", "content"]]
)
KEYS = ["repo", "path", "commit"]
PCOLS = [f.name for f in PAYLOAD.fields]


def _dbz(before, after, op, lsn):
    return json.dumps(
        {"before": before, "after": after, "op": op,
         "ts_ms": 1, "source": {"lsn": lsn}}
    )


def _row(repo, content):
    return {"repo": repo, "path": "p", "commit": "c",
            "lang": "na", "content": content}


def test_debezium_op_mapping_and_images(spark):
    raw = spark.createDataFrame(
        [
            (_dbz(None, _row("r1", "a"), "c", 1),),
            (_dbz(None, _row("r2", "b"), "r", 2),),   # snapshot read
            (_dbz(_row("r1", "a"), _row("r1", "a2"), "u", 3),),
            (_dbz(_row("r2", "b"), None, "d", 4),),   # delete: before image
            (_dbz(None, _row("r3", "x"), "t", 5),),   # truncate -> raw op
        ],
        "value string",
    )
    got = {
        r["seq"]: (r["repo"], r["content"], r["op"])
        for r in from_debezium(raw, PAYLOAD).collect()
    }
    assert got == {
        1: ("r1", "a", "insert"),
        2: ("r2", "b", "insert"),
        3: ("r1", "a2", "update"),
        4: ("r2", "b", "delete"),
        5: ("r3", "x", "t"),  # unknown op passes raw -> quarantine classifies
    }


def test_debezium_mysql_pos_row_seq(spark):
    """Without an lsn the default seq composes binlog (file, pos, row)."""
    e = json.dumps(
        {"after": _row("r1", "a"), "op": "c", "ts_ms": 1,
         "source": {"file": "mysql-bin.000005", "pos": 7, "row": 3}}
    )
    got = from_debezium(
        spark.createDataFrame([(e,)], "value string"), PAYLOAD
    ).collect()[0]
    assert got["seq"] == 5 * (1 << 42) + 7 * (1 << 12) + 3
    # no file (older connector configs): the PRE-round-4 formula exactly,
    # so tables built on the old default keep a consistent seq scale
    e2 = json.dumps(
        {"after": _row("r1", "a"), "op": "c", "ts_ms": 1,
         "source": {"pos": 7, "row": 3}}
    )
    got2 = from_debezium(
        spark.createDataFrame([(e2,)], "value string"), PAYLOAD
    ).collect()[0]
    assert got2["seq"] == 7 * (1 << 20) + 3


def test_debezium_mysql_seq_survives_binlog_rotation(spark):
    """A post-rotation update (later file, SMALLER pos) must outrank the
    pre-rotation image in latest-wins dedup — binlog position resets to
    ~0 at every file rotation (ADVICE r3)."""
    pre = json.dumps(
        {"after": _row("r1", "old"), "op": "c", "ts_ms": 1,
         "source": {"file": "mysql-bin.000001", "pos": 900_000, "row": 0}}
    )
    post = json.dumps(
        {"after": _row("r1", "new"), "op": "u", "ts_ms": 2,
         "source": {"file": "mysql-bin.000002", "pos": 4, "row": 0}}
    )
    parsed = from_debezium(
        spark.createDataFrame([(pre,), (post,)], "value string"), PAYLOAD
    )
    from datax_spark.operators.dedup import dedup_latest

    rows = dedup_latest(parsed, ["repo", "path", "commit"]).collect()
    assert len(rows) == 1 and rows[0]["content"] == "new"


def _canal(data, typ, mid, ddl=False):
    return json.dumps(
        {"data": data, "old": None, "type": typ, "es": 1, "ts": 2,
         "id": mid, "isDdl": "true" if ddl else "false"}
    )


def test_canal_statement_batch_explodes(spark):
    raw = spark.createDataFrame(
        [
            (_canal([_row("r1", "a"), _row("r2", "b")], "INSERT", 1),),
            (_canal([_row("r1", "a2")], "UPDATE", 2),),
            (_canal([_row("r2", "b")], "DELETE", 3),),
            (_canal(None, "CREATE", 4, ddl=True),),  # DDL -> dirty op
        ],
        "value string",
    )
    rows = from_canal(raw, PAYLOAD).collect()
    got = {(r["repo"], r["op"]): r["seq"] for r in rows}
    assert got[("r1", "insert")] == 1 * (1 << 20) + 0
    assert got[("r2", "insert")] == 1 * (1 << 20) + 1
    assert got[("r1", "update")] == 2 * (1 << 20) + 0
    assert got[("r2", "delete")] == 3 * (1 << 20) + 0
    ddl = [r for r in rows if r["op"] == "ddl"]
    assert len(ddl) == 1 and ddl[0]["repo"] is None


def _synth_debezium(log):
    """Re-encode a generated changelog as Debezium envelopes (round-trip
    fixture: valid ops map to dbz codes, corrupted ops ride through as
    their raw string so quarantine behavior stays comparable)."""
    img = F.struct(*[F.col(c) for c in PCOLS])
    dbz_op = (
        F.when(F.col("op") == "insert", F.lit("c"))
        .when(F.col("op") == "update", F.lit("u"))
        .when(F.col("op") == "delete", F.lit("d"))
        .otherwise(F.col("op"))
    )
    is_del = F.col("op") == "delete"
    env = F.to_json(
        F.struct(
            F.when(is_del, img).alias("before"),
            F.when(~is_del, img).alias("after"),
            dbz_op.alias("op"),
            F.lit(1).cast("long").alias("ts_ms"),
            F.struct(F.col("seq").alias("lsn")).alias("source"),
        )
    )
    return log.select(env.alias("value"))


def test_debezium_end_to_end_matches_oracle(spark, tmp_path):
    """Generated changelog -> Debezium JSON -> parse -> fenced apply ->
    final state equals the direct replay oracle (the envelope is
    lossless for everything the engine consumes)."""
    log = generate_changelog(
        spark, n_events=4000, n_keys=500, events_per_segment=2000
    ).persist()
    parsed = from_debezium(_synth_debezium(log), PAYLOAD)
    t = LakeTable.create(spark, str(tmp_path / "t"), PAYLOAD, KEYS, "repo", 8)
    mid = log.agg(F.max("seq") / 2).first()[0]
    apply_batch(t, parsed.filter(F.col("seq") <= mid), 0)
    apply_batch(t, parsed.filter(F.col("seq") > mid), 1)
    got = state_fingerprint(t.read().orderBy(KEYS).toPandas())
    want = state_fingerprint(replay_oracle_pandas(log.toPandas()))
    log.unpersist()
    assert got == want


def test_canal_end_to_end_matches_oracle(spark, tmp_path):
    """Same round trip through Canal flat messages (one row per message,
    message id = seq: the default id*2^20+pos seq is order-isomorphic,
    so latest-wins resolves identically)."""
    log = generate_changelog(
        spark, n_events=4000, n_keys=500, events_per_segment=2000
    ).persist()
    data = F.array(
        F.map_from_arrays(
            F.array(*[F.lit(c) for c in PCOLS]),
            F.array(*[F.col(c) for c in PCOLS]),
        )
    )
    typ = (
        F.when(F.col("op") == "insert", F.lit("INSERT"))
        .when(F.col("op") == "update", F.lit("UPDATE"))
        .when(F.col("op") == "delete", F.lit("DELETE"))
        .otherwise(F.col("op"))
    )
    env = F.to_json(
        F.struct(
            data.alias("data"),
            typ.alias("type"),
            F.lit(1).cast("long").alias("es"),
            F.lit(2).cast("long").alias("ts"),
            F.col("seq").alias("id"),
            F.lit("false").alias("isDdl"),
        )
    )
    parsed = from_canal(log.select(env.alias("value")), PAYLOAD)
    t = LakeTable.create(spark, str(tmp_path / "t"), PAYLOAD, KEYS, "repo", 8)
    mid_raw = log.agg(F.max("seq") / 2).first()[0]
    mid = int(mid_raw) * (1 << 20)
    apply_batch(t, parsed.filter(F.col("seq") <= mid), 0)
    apply_batch(t, parsed.filter(F.col("seq") > mid), 1)
    got = state_fingerprint(t.read().orderBy(KEYS).toPandas())
    want = state_fingerprint(replay_oracle_pandas(log.toPandas()))
    log.unpersist()
    assert got == want


def test_envelope_parse_is_codegen_only(spark):
    """The parse stage is pure Column expressions: no Python UDFs, no
    shuffle — the whole parse fuses into the scan."""
    raw = spark.createDataFrame(
        [(_dbz(None, _row("r1", "a"), "c", 1),)], "value string"
    )
    plan = from_debezium(raw, PAYLOAD)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def _mxw(data, typ, position=None, xid=None):
    d = {"database": "db", "table": "t", "type": typ, "ts": 1,
         "data": data}
    if position is not None:
        d["position"] = position
    if xid is not None:
        d["xid"] = xid
    return json.dumps(d)


def test_maxwell_op_mapping_and_seq(spark):
    from datax_spark.sources.envelope import from_maxwell

    raw = spark.createDataFrame(
        [
            (_mxw(_row("r1", "a"), "insert", "bin.000001:100"),),
            (_mxw(_row("r2", "b"), "bootstrap-insert", "bin.000001:200"),),
            (_mxw(_row("r1", "a2"), "update", "bin.000002:50"),),
            (_mxw(_row("r2", "b"), "delete", "bin.000002:60"),),  # data = image
            (_mxw(_row("r3", "x"), "table-create", "bin.000002:70"),),  # ddl
            (_mxw(_row("r4", "y"), "insert", None, 77),),  # no position -> xid
        ],
        "value string",
    )
    out = from_maxwell(raw, PAYLOAD)
    rows = {(r["repo"], r["op"]): r for r in out.collect()}
    assert rows[("r1", "insert")]["seq"] == (1 << 40) + 100
    assert rows[("r2", "insert")]["seq"] == (1 << 40) + 200
    assert rows[("r1", "update")]["seq"] == 2 * (1 << 40) + 50
    # delete carries the full image in data
    assert rows[("r2", "delete")]["content"] == "b"
    # DDL passes through raw for quarantine
    assert ("r3", "table-create") in rows
    # position fallback
    assert rows[("r4", "insert")]["seq"] == 77


def test_maxwell_end_to_end_matches_oracle(spark, tmp_path):
    from datax_spark.sources.envelope import from_maxwell

    log = generate_changelog(spark, n_events=4000, n_keys=500,
                             events_per_segment=4000)
    img = F.struct(*[F.col(c) for c in PCOLS])
    env = F.to_json(F.struct(
        F.lit("db").alias("database"), F.lit("t").alias("table"),
        F.col("op").alias("type"), F.lit(1).cast("long").alias("ts"),
        F.col("seq").alias("xid"),
        F.concat(F.lit("bin.000001:"), F.col("seq")).alias("position"),
        img.alias("data"),
    ))
    parsed = from_maxwell(log.select(env.alias("value")), PAYLOAD)
    t = LakeTable.create(spark, str(tmp_path / "mxw"), PAYLOAD, KEYS, "repo", 8)
    apply_batch(t, parsed, 0)
    got = state_fingerprint(t.read().orderBy(KEYS).toPandas())
    want = state_fingerprint(replay_oracle_pandas(log.toPandas()))
    assert got == want


def test_maxwell_parse_is_codegen_only(spark):
    from datax_spark.sources.envelope import from_maxwell

    raw = spark.createDataFrame([(_mxw(_row("r", "x"), "insert", "bin.000001:1"),)],
                                "value string")
    plan = from_maxwell(raw, PAYLOAD)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def _maxwell_log_segments(spark, log, log_dir):
    img = F.struct(*[F.col(c) for c in PCOLS])
    env = F.to_json(F.struct(
        F.lit("db").alias("database"), F.lit("t").alias("table"),
        F.col("op").alias("type"), F.lit(1).cast("long").alias("ts"),
        F.col("seq").alias("xid"),
        F.concat(F.lit("bin.000001:"), F.col("seq")).alias("position"),
        img.alias("data"),
    ))
    mid = log.agg(F.max("seq") / 2).first()[0]
    for i, cond in enumerate([F.col("seq") <= mid, F.col("seq") > mid]):
        (log.filter(cond).orderBy("seq").select(env.alias("value"))
            .coalesce(1).write.text(f"{log_dir}/seg={i}"))


def test_apply_segments_envelope_mode(spark, tmp_path):
    """JSON-lines Maxwell dump dirs applied directly (no parquet
    pre-conversion): final state equals the direct replay oracle."""
    from datax_spark.streaming.pipeline import PipelineConfig, apply_segments

    log = generate_changelog(spark, n_events=4000, n_keys=500,
                             events_per_segment=4000).persist()
    log_dir = str(tmp_path / "mlog")
    _maxwell_log_segments(spark, log, log_dir)
    t = LakeTable.create(spark, str(tmp_path / "t"), PAYLOAD, KEYS, "repo", 8)
    metrics = apply_segments(spark, t, log_dir, config=PipelineConfig(),
                             envelope="maxwell")
    assert len(metrics) == 2 and all(m.applied for m in metrics)
    got = state_fingerprint(t.read().orderBy(KEYS).toPandas())
    want = state_fingerprint(replay_oracle_pandas(log.toPandas()))
    log.unpersist()
    assert got == want


def test_tail_envelope_mode(spark, tmp_path):
    """Streaming tail of the same JSON-lines dump (envelope parse inside
    the micro-batch scan)."""
    from datax_spark.streaming.pipeline import PipelineConfig, tail_and_apply

    log = generate_changelog(spark, n_events=2000, n_keys=300,
                             events_per_segment=2000).persist()
    log_dir = str(tmp_path / "slog")
    _maxwell_log_segments(spark, log, log_dir)
    tpath = str(tmp_path / "st")
    LakeTable.create(spark, tpath, PAYLOAD, KEYS, "repo", 8)
    tail_and_apply(spark, tpath, log_dir, str(tmp_path / "ckpt"), PAYLOAD,
                   config=PipelineConfig(), envelope="maxwell")
    t = LakeTable(spark, tpath)
    got = state_fingerprint(t.read().orderBy(KEYS).toPandas())
    want = state_fingerprint(replay_oracle_pandas(log.toPandas()))
    log.unpersist()
    assert got == want
