"""SCD type-2 history apply (operators/scd2.py).

The load-bearing property: INCREMENTAL application of any batch split
equals the single from-scratch lead() window over the whole log — which
is also what the driver oracle (cdc_scd2_apply) checks against DuckDB.
"""

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from datax_spark.operators.scd2 import (
    VALID_FROM,
    VALID_TO,
    create_scd2_table,
    scd2_apply,
    scd2_as_of,
    scd2_current,
)

# (key, op, seq, content) — keys with multiple images, deletes, re-inserts,
# a delete-then-reinsert across a batch boundary, and a key seen once.
LOG = [
    ("a", "insert", 1, "a1"),
    ("b", "insert", 2, "b1"),
    ("a", "update", 3, "a2"),
    ("c", "insert", 4, "c1"),
    ("b", "delete", 5, None),
    # --- batch boundary at seq 5 ---
    ("b", "insert", 6, "b2"),
    ("a", "update", 7, "a3"),
    ("d", "insert", 8, "d1"),
    ("c", "delete", 9, None),
    # --- batch boundary at seq 9 ---
    ("c", "insert", 10, "c2"),
    ("a", "delete", 11, None),
    ("d", "update", 12, "d2"),
]


def _log_df(spark, rows):
    return spark.createDataFrame(rows, "key string, op string, seq long, content string")


def _expected_history(spark, rows):
    """From-scratch oracle: one lead() window over the whole log."""
    df = _log_df(spark, rows)
    w = Window.partitionBy("key").orderBy("seq")
    return (
        df.withColumn(VALID_TO, F.lead("seq").over(w))
        .filter(F.col("op") != "delete")
        .select(
            "key", "content", F.col("seq").alias(VALID_FROM), F.col(VALID_TO)
        )
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def table(spark, tmp_path):
    return create_scd2_table(
        spark,
        os.path.join(str(tmp_path), "scd2"),
        StructType([StructField("key", StringType()), StructField("content", StringType())]),
        natural_key=["key"],
        bucket_key="key",
        num_buckets=4,
    )


def _apply_batches(spark, table, bounds):
    lo = 0
    for i, hi in enumerate(bounds):
        batch = [r for r in LOG if lo < r[2] <= hi]
        scd2_apply(table, _log_df(spark, batch), batch_id=i)
        lo = hi


def test_incremental_equals_from_scratch(spark, table):
    _apply_batches(spark, table, [5, 9, 99])
    got = table.read().select("key", "content", VALID_FROM, VALID_TO)
    assert _rows(got) == _rows(_expected_history(spark, LOG))


def test_single_batch_equals_from_scratch(spark, tmp_path):
    t = create_scd2_table(
        spark,
        os.path.join(str(tmp_path), "one"),
        StructType([StructField("key", StringType()), StructField("content", StringType())]),
        natural_key=["key"],
        bucket_key="key",
        num_buckets=4,
    )
    scd2_apply(t, _log_df(spark, LOG), batch_id=0)
    got = t.read().select("key", "content", VALID_FROM, VALID_TO)
    assert _rows(got) == _rows(_expected_history(spark, LOG))


def test_current_equals_latest_wins(spark, table):
    _apply_batches(spark, table, [5, 9, 99])
    cur = _rows(scd2_current(table).select("key", "content"))
    # latest-wins replay of the same log: a deleted, b=b2, c=c2, d=d2
    assert cur == [("b", "b2"), ("c", "c2"), ("d", "d2")]


def test_as_of_equals_prefix_replay(spark, table):
    _apply_batches(spark, table, [5, 9, 99])
    for seq in (1, 4, 5, 6, 9, 10, 11, 12):
        asof = _rows(scd2_as_of(table, seq).select("key", "content"))
        # replay oracle: latest non-delete image per key among seq' <= seq
        prefix = [r for r in LOG if r[2] <= seq]
        state = {}
        for k, op, s, c in sorted(prefix, key=lambda r: r[2]):
            if op == "delete":
                state.pop(k, None)
            else:
                state[k] = c
        assert asof == sorted(state.items()), f"as_of({seq})"


def test_fence_replay_is_noop(spark, table):
    _apply_batches(spark, table, [5])
    v = table.current_version()
    res = scd2_apply(table, _log_df(spark, [r for r in LOG if r[2] <= 5]), batch_id=0)
    assert not res.applied and res.version is None
    assert table.current_version() == v


def test_untouched_buckets_carry_forward(spark, table):
    """A batch touching one key must not rewrite other keys' buckets."""
    scd2_apply(table, _log_df(spark, [r for r in LOG if r[2] <= 5]), batch_id=0)
    before = table.snapshot().buckets
    res = scd2_apply(table, _log_df(spark, [("a", "update", 6, "a9")]), batch_id=1)
    after = table.snapshot().buckets
    assert len(res.affected_buckets) == 1
    for b, files in before.items():
        if int(b) not in res.affected_buckets:
            assert after[b] == files, f"bucket {b} was rewritten needlessly"


def test_schema_evolution_additive(spark, table):
    scd2_apply(table, _log_df(spark, [r for r in LOG if r[2] <= 5]), batch_id=0)
    evolved = spark.createDataFrame(
        [("e", "insert", 6, "e1", "py")],
        "key string, op string, seq long, content string, lang string",
    )
    scd2_apply(table, evolved, batch_id=1)
    out = table.read()
    assert "lang" in out.columns
    got = {r["key"]: r["lang"] for r in out.filter(F.col(VALID_TO).isNull()).collect()}
    assert got["e"] == "py" and got["a"] is None


def test_streaming_tail_scd2(spark, tmp_path):
    """Streaming SCD2 tail == from-scratch window over the whole log."""
    import pyspark.sql.functions as SF
    from pyspark.sql.types import LongType, TimestampType

    from datax_spark.operators.scd2 import tail_and_apply_scd2

    log_dir = os.path.join(str(tmp_path), "log")
    for seg_id, (lo, hi) in enumerate([(0, 5), (5, 9), (9, 99)]):
        rows = [r for r in LOG if lo < r[2] <= hi]
        (
            _log_df(spark, rows)
            .withColumn("ts", SF.timestamp_seconds(SF.col("seq")))
            .coalesce(1)
            .write.parquet(os.path.join(log_dir, f"seg={seg_id}"))
        )
    tpath = os.path.join(str(tmp_path), "t")
    create_scd2_table(
        spark,
        tpath,
        StructType([StructField("key", StringType()), StructField("content", StringType())]),
        natural_key=["key"],
        bucket_key="key",
        num_buckets=4,
    )
    schema = StructType(
        [
            StructField("key", StringType()),
            StructField("op", StringType()),
            StructField("seq", LongType()),
            StructField("content", StringType()),
            StructField("ts", TimestampType()),
        ]
    )
    tail_and_apply_scd2(
        spark, tpath, log_dir, os.path.join(str(tmp_path), "ckpt"), schema
    )
    from datax_spark.lake.table import LakeTable

    got = LakeTable(spark, tpath).read().select("key", "content", VALID_FROM, VALID_TO)
    assert _rows(got) == _rows(_expected_history(spark, LOG))


def test_bucket_key_must_be_natural_key_col(spark, tmp_path):
    with pytest.raises(ValueError, match="natural key"):
        create_scd2_table(
            spark,
            os.path.join(str(tmp_path), "bk"),
            StructType([StructField("key", StringType()), StructField("content", StringType())]),
            natural_key=["key"],
            bucket_key="content",
            num_buckets=4,
        )


def test_replayed_segment_does_not_duplicate_quarantine(spark, tmp_path):
    """Exactly-once includes the quarantine side channel: a forced
    re-run from batch -1 must not re-append committed batches' dirty
    rows (fence precedes the quarantine write)."""
    from datax_spark.operators.scd2 import apply_segments_scd2

    log_dir = os.path.join(str(tmp_path), "qlog")
    rows = [("a", "insert", 1, "x"), (None, "insert", 2, "y")]  # 1 dirty
    _log_df(spark, rows).coalesce(1).write.parquet(os.path.join(log_dir, "seg=0"))
    t = create_scd2_table(
        spark,
        os.path.join(str(tmp_path), "qt"),
        StructType([StructField("key", StringType()), StructField("content", StringType())]),
        natural_key=["key"],
        bucket_key="key",
        num_buckets=4,
    )
    qdir = os.path.join(str(tmp_path), "q")
    apply_segments_scd2(spark, t, log_dir, quarantine_dir=qdir)
    assert spark.read.parquet(qdir).count() == 1
    # forced replay past the fence: table AND quarantine unchanged
    res = apply_segments_scd2(spark, t, log_dir, quarantine_dir=qdir,
                              start_after_batch=-1)
    assert res and not res[0].applied
    assert spark.read.parquet(qdir).count() == 1


def test_quarantined_apply_without_content_col(spark, tmp_path):
    """ADVICE r3: an SCD2 table whose payload schema has no 'content'
    column (the generic envelope-driven case) must quarantine-split on
    the schema it HAS — null_content simply doesn't apply — instead of
    failing with an unresolved-column AnalysisException."""
    from datax_spark.operators.scd2 import _scd2_apply_quarantined, scd2_current

    t = create_scd2_table(
        spark,
        os.path.join(str(tmp_path), "nocontent"),
        StructType([StructField("id", StringType()), StructField("val", StringType())]),
        natural_key=["id"],
        bucket_key="id",
        num_buckets=4,
    )
    events = spark.createDataFrame(
        [
            ("a", "v1", "insert", 1),
            ("a", "v2", "update", 2),
            (None, "x", "insert", 3),  # dirty: null key
            ("b", None, "insert", 4),  # NULL payload is CLEAN here
        ],
        "id string, val string, op string, seq long",
    )
    qdir = os.path.join(str(tmp_path), "q")
    res = _scd2_apply_quarantined(t, events, 0, qdir)
    assert res.applied
    q = spark.read.parquet(qdir)
    assert q.count() == 1
    assert q.collect()[0]["_dirty_reason"] == "null_key"
    cur = {r["id"]: r["val"] for r in scd2_current(t).collect()}
    assert cur == {"a": "v2", "b": None}


def test_scd2_over_maxwell_dump(spark, tmp_path):
    """SCD2 history built straight off a Maxwell JSON-lines binlog dump
    (envelope mode): intervals equal the from-scratch window, with the
    envelope's 2^40-based seq scale."""
    import json

    from datax_spark.operators.scd2 import apply_segments_scd2

    log_dir = os.path.join(str(tmp_path), "mxlog")
    for seg_id, (lo, hi) in enumerate([(0, 5), (5, 99)]):
        seg = os.path.join(log_dir, f"seg={seg_id}")
        os.makedirs(seg)
        with open(os.path.join(seg, "part-0.json"), "w") as f:
            for k, op, s, c in LOG:
                if lo < s <= hi:
                    f.write(json.dumps({
                        "database": "db", "table": "t", "type": op, "ts": 1,
                        "position": f"bin.000001:{s}",
                        "data": {"key": k, "content": c},
                    }) + "\n")
    t = create_scd2_table(
        spark,
        os.path.join(str(tmp_path), "mxt"),
        StructType([StructField("key", StringType()), StructField("content", StringType())]),
        natural_key=["key"],
        bucket_key="key",
        num_buckets=4,
    )
    res = apply_segments_scd2(spark, t, log_dir, envelope="maxwell")
    assert len(res) == 2 and all(r.applied for r in res)
    got = t.read().select(
        "key", "content",
        (F.col(VALID_FROM) - (1 << 40)).alias(VALID_FROM),
        (F.col(VALID_TO) - (1 << 40)).alias(VALID_TO),
    )
    assert _rows(got) == _rows(_expected_history(spark, LOG))


def test_scd2_validate(spark, table, tmp_path):
    _apply_batches(spark, table, [5, 9, 99])
    rep = __import__("datax_spark.operators.scd2", fromlist=["scd2_validate"]).scd2_validate(table)
    assert rep == {"bad_intervals": 0, "overlaps": 0, "multi_open_keys": 0, "ok": True}

    # corrupt the history via an external writer: a second open interval
    # for key 'b' — the validator must catch it
    from datax_spark.lake.table import LakeTable

    bad = spark.createDataFrame(
        [("b", "dup-open", 99, None)],
        f"key string, content string, {VALID_FROM} long, {VALID_TO} long",
    )
    snap = table.snapshot()
    props = snap.properties
    rel = table.write_bucket_data(bad, props["num_buckets"], props["bucket_key"])
    table.commit_append_buckets(snap.version, rel)
    rep2 = __import__("datax_spark.operators.scd2", fromlist=["scd2_validate"]).scd2_validate(table)
    assert not rep2["ok"] and rep2["multi_open_keys"] == 1


def test_payload_dedup_equals_plain_history(spark, tmp_path):
    """Content-addressed SCD2 == plain SCD2 after re-materialization;
    the store holds one row per DISTINCT payload; replay stays fenced
    across BOTH commits."""
    from datax_spark.operators.scd2 import _payload_store

    # contents repeat across versions and across keys (the dedupe win)
    log = [
        ("a", "insert", 1, "shared"),
        ("b", "insert", 2, "shared"),
        ("a", "update", 3, "unique-a"),
        ("a", "update", 4, "shared"),   # back to an existing payload
        ("b", "delete", 5, None),
        ("b", "insert", 6, "shared"),
        ("c", "insert", 7, None),       # NULL payload image
    ]
    t = create_scd2_table(
        spark,
        os.path.join(str(tmp_path), "dd"),
        StructType([StructField("key", StringType()), StructField("content", StringType())]),
        natural_key=["key"],
        bucket_key="key",
        num_buckets=4,
        dedup_payload_cols=["content"],
    )
    for i, (lo, hi) in enumerate([(0, 4), (4, 99)]):
        scd2_apply(t, _log_df(spark, [r for r in log if lo < r[2] <= hi]), batch_id=i)

    from datax_spark.operators.scd2 import scd2_read_resolved

    got = sorted(
        tuple(r)
        for r in scd2_read_resolved(t)
        .select("key", "content", VALID_FROM, VALID_TO)
        .collect()
    )
    assert got == _rows(_expected_history(spark, log))
    # history rows store hashes, not contents
    assert "content" not in t.read().columns and "_chash" in t.read().columns
    # store: distinct payloads only — 'shared', 'unique-a', NULL => 3
    store = _payload_store(t)
    assert store.count() == 3
    # replay: both commits fenced, store unchanged
    v, sv = t.current_version(), store.current_version()
    res = scd2_apply(t, _log_df(spark, [r for r in log if r[2] <= 4]), batch_id=0)
    assert not res.applied
    assert t.current_version() == v and store.current_version() == sv


def test_payload_dedup_current_and_asof_resolve(spark, tmp_path):
    t = create_scd2_table(
        spark,
        os.path.join(str(tmp_path), "dd2"),
        StructType([StructField("key", StringType()), StructField("content", StringType())]),
        natural_key=["key"],
        bucket_key="key",
        num_buckets=4,
        dedup_payload_cols=["content"],
    )
    scd2_apply(t, _log_df(spark, LOG), batch_id=0)
    cur = sorted(tuple(r) for r in scd2_current(t).select("key", "content").collect())
    assert cur == [("b", "b2"), ("c", "c2"), ("d", "d2")]
    asof = sorted(tuple(r) for r in scd2_as_of(t, 4).select("key", "content").collect())
    assert asof == [("a", "a2"), ("b", "b1"), ("c", "c1")]
