"""Exactly-once CDC tail into a LIVE RDBMS (Derby, embedded in Spark's
jars): the stream fence is a ROW IN THE SINK DATABASE and advances in
the same transaction as the MERGE + DELETE, so any crash/replay point
converges — the transactional-sink half of the engine's exactly-once
story (the lake sink proves the manifest-CAS half).

Reference parity: CommonRdbmsWriter.java:176-609 (write modes) has no
delete or exactly-once semantics — DataX jobs re-run with truncate
preSql; this is the streaming CDC upgrade of that path.

NB: the changelog's natural key column ``commit`` is a RESERVED word in
Derby, so the sink-facing log renames it to ``rev`` — exactly what a
real binlog-to-RDBMS pipeline hits with reserved-word columns.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from datax_spark.oracle import replay_oracle_pandas, state_fingerprint
from datax_spark.sources.changelog import generate_changelog, write_segments
from datax_spark.sources.jdbc import (
    ensure_stream_fence,
    jdbc_apply_exactly_once,
    jdbc_execute,
    jdbc_query,
    tail_to_jdbc,
)

EVENT_SCHEMA = StructType(
    [
        StructField("repo", StringType()),
        StructField("path", StringType()),
        StructField("rev", StringType()),
        StructField("lang", StringType()),
        StructField("content", StringType()),
        StructField("op", StringType()),
        StructField("seq", LongType()),
        StructField("ts", TimestampType()),
        StructField("batch_file", IntegerType()),
    ]
)
COLS = ["repo", "path", "rev", "lang", "content"]
KEYS = ["repo", "path", "rev"]
TGT = "DX_CDC_TGT"


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby_eo") / "db"
    return f"jdbc:derby:{db};create=true"


@pytest.fixture(scope="module")
def log(spark, tmp_path_factory):
    df = generate_changelog(
        spark, n_events=3000, n_keys=400, events_per_segment=750
    ).persist()
    logdir = str(tmp_path_factory.mktemp("eolog"))
    write_segments(df.withColumnRenamed("commit", "rev"), logdir)
    yield df, logdir
    df.unpersist()


@pytest.fixture(scope="module")
def target(spark, derby_url):
    jdbc_execute(
        spark,
        derby_url,
        [
            f"CREATE TABLE {TGT} (REPO VARCHAR(100) NOT NULL, "
            "PATH VARCHAR(256) NOT NULL, REV VARCHAR(100) NOT NULL, "
            "LANG VARCHAR(32), CONTENT VARCHAR(8000), "
            "PRIMARY KEY (REPO, PATH, REV))"
        ],
    )
    return TGT


def _db_fingerprint(spark, derby_url):
    rows = jdbc_query(
        spark, derby_url,
        f"SELECT REPO, PATH, REV, LANG, CONTENT FROM {TGT}",
    )
    pdf = pd.DataFrame(
        rows, columns=["repo", "path", "commit", "lang", "content"]
    )
    return state_fingerprint(pdf), len(pdf)


def test_tail_to_jdbc_matches_oracle_then_replay_is_noop(
    spark, derby_url, log, target, tmp_path
):
    log_df, logdir = log
    tail_to_jdbc(
        spark, logdir, str(tmp_path / "ckpt"), EVENT_SCHEMA,
        derby_url, TGT, COLS, KEYS,
        stream_id="eo_sink", timeout_sec=600,
        quarantine_dir=str(tmp_path / "quar"),
    )
    got_fp, got_n = _db_fingerprint(spark, derby_url)
    oracle = replay_oracle_pandas(log_df.toPandas())
    assert got_n == len(oracle)
    assert got_fp == state_fingerprint(oracle)
    fence = ensure_stream_fence(spark, derby_url, "eo_sink")
    assert fence >= 0  # at least one batch committed its fence

    # full re-tail under a FRESH checkpoint: every batch id replays from
    # 0 and the in-database fence must eat all of them
    tail_to_jdbc(
        spark, logdir, str(tmp_path / "ckpt2"), EVENT_SCHEMA,
        derby_url, TGT, COLS, KEYS,
        stream_id="eo_sink", timeout_sec=600,
    )
    assert _db_fingerprint(spark, derby_url) == (got_fp, got_n)
    assert ensure_stream_fence(spark, derby_url, "eo_sink") == fence

    # no staging tables left behind
    leftovers = jdbc_query(
        spark, derby_url,
        "SELECT COUNT(*) FROM SYS.SYSTABLES WHERE TABLENAME LIKE 'DX_CDC_TGT_DX%'",
    )
    assert leftovers == [(0,)]


def test_direct_apply_fenced_and_failed_txn_rolls_back(
    spark, derby_url, log, target
):
    log_df, _ = log
    base_fp = _db_fingerprint(spark, derby_url)
    fence = ensure_stream_fence(spark, derby_url, "eo_sink")
    empty = spark.createDataFrame(
        [], "repo string, path string, rev string, lang string, content string"
    )
    # replayed batch id: refused before any staging work
    assert not jdbc_apply_exactly_once(
        empty, empty.select(*KEYS), derby_url, TGT, COLS, KEYS,
        batch_id=fence, stream_id="eo_sink",
    )
    # a MERGE with duplicate source keys fails MID-TRANSACTION: the
    # rollback must leave both the data and the fence untouched
    dup = spark.createDataFrame(
        [("r", "p", "c", "go", "x"), ("r", "p", "c", "go", "y")],
        "repo string, path string, rev string, lang string, content string",
    )
    with pytest.raises(Exception):
        jdbc_apply_exactly_once(
            dup, empty.select(*KEYS), derby_url, TGT, COLS, KEYS,
            batch_id=fence + 1, stream_id="eo_sink",
        )
    assert _db_fingerprint(spark, derby_url) == base_fp
    assert ensure_stream_fence(spark, derby_url, "eo_sink") == fence

    # and the stream recovers: the next well-formed batch applies
    one = spark.createDataFrame(
        [("r", "p", "c", "go", "x")],
        "repo string, path string, rev string, lang string, content string",
    )
    assert jdbc_apply_exactly_once(
        one, empty.select(*KEYS), derby_url, TGT, COLS, KEYS,
        batch_id=fence + 1, stream_id="eo_sink",
    )
    assert ensure_stream_fence(spark, derby_url, "eo_sink") == fence + 1
    n = jdbc_query(
        spark, derby_url,
        f"SELECT COUNT(*) FROM {TGT} WHERE REPO='r' AND PATH='p' AND REV='c'",
    )
    assert n == [(1,)]
    # delete arm: a keyed delete batch kills exactly that row
    assert jdbc_apply_exactly_once(
        empty,
        spark.createDataFrame([("r", "p", "c")], "repo string, path string, rev string"),
        derby_url, TGT, COLS, KEYS, batch_id=fence + 2, stream_id="eo_sink",
    )
    assert jdbc_query(
        spark, derby_url,
        f"SELECT COUNT(*) FROM {TGT} WHERE REPO='r' AND PATH='p' AND REV='c'",
    ) == [(0,)]
