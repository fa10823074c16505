"""Watermarked stream-stream interval join (streaming/join.py):
bounded-state correlation of two live change feeds — match within
tolerance, late rows dropped by the watermark, left-outer emits
unmatched rows only after eviction proves no match can arrive."""

import datetime as dt
import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from datax_spark.streaming.join import stream_interval_join

BASE = dt.datetime(2024, 1, 1, 10, 0, 0)

L_SCHEMA = StructType([
    StructField("k", StringType()),
    StructField("ts", TimestampType()),
    StructField("lv", StringType()),
])
R_SCHEMA = StructType([
    StructField("k", StringType()),
    StructField("ts", TimestampType()),
    StructField("rv", StringType()),
])


def _write_batches(spark, logdir, schema, batches):
    now = time.time()
    for i, rows in enumerate(batches):
        seg = os.path.join(logdir, f"seg={i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(seg)
        for f in os.listdir(seg):
            os.utime(os.path.join(seg, f), (now + i, now + i))


def _stream(spark, logdir, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(logdir + "/seg=*")
    )


def _mins(m):
    return BASE + dt.timedelta(minutes=m)


def test_interval_join_matches_within_tolerance_and_drops_late(
    spark, tmp_path
):
    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    _write_batches(spark, ldir, L_SCHEMA, [
        [("a", _mins(0), "L0"), ("b", _mins(1), "L1")],
        [("adv", _mins(240), "LADV")],          # watermark advance
        [("adv2", _mins(241), "LADV2")],        # state EVICTED this batch
        [("adv3", _mins(242), "LADV3")],
    ])
    _write_batches(spark, rdir, R_SCHEMA, [
        [("a", _mins(3), "R0"),                 # within 5 min of L0
         ("b", _mins(30), "RFAR")],             # outside tolerance
        [("adv", _mins(240), "RADV")],
        [("adv2", _mins(241), "RADV2")],
        # late row lands a batch AFTER eviction: Spark admits late rows
        # while matching state exists (eviction runs at END of batch, the
        # same edge the windowed-agg test pins), so the drop needs the
        # state already gone
        [("a", _mins(2), "RLATE")],
    ])
    j = stream_interval_join(
        _stream(spark, ldir, L_SCHEMA),
        _stream(spark, rdir, R_SCHEMA),
        on=["k"], tolerance="5 minutes", watermark="10 minutes",
    )
    q = (
        j.writeStream.format("memory").queryName("ssj_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(600), "stream did not finish"
    rows = {
        (r["k"], r["lv"], r["r_rv"])
        for r in spark.sql("SELECT * FROM ssj_out").collect()
    }
    assert ("a", "L0", "R0") in rows
    assert ("adv", "LADV", "RADV") in rows
    assert not any(r[2] == "RFAR" for r in rows)   # outside tolerance
    assert not any(r[2] == "RLATE" for r in rows)  # behind the watermark
    dropped = sum(
        so["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        for so in p["stateOperators"]
    )
    assert dropped >= 1


def test_left_outer_emits_unmatched_after_eviction(spark, tmp_path):
    ldir, rdir = str(tmp_path / "lo_l"), str(tmp_path / "lo_r")
    _write_batches(spark, ldir, L_SCHEMA, [
        [("a", _mins(0), "L0"), ("z", _mins(1), "LNOMATCH")],
        [("adv", _mins(240), "LADV")],
        [("adv2", _mins(300), "LADV2")],
    ])
    _write_batches(spark, rdir, R_SCHEMA, [
        [("a", _mins(2), "R0")],
        [("adv", _mins(240), "RADV")],
        [("adv2", _mins(300), "RADV2")],
    ])
    j = stream_interval_join(
        _stream(spark, ldir, L_SCHEMA),
        _stream(spark, rdir, R_SCHEMA),
        on=["k"], tolerance="5 minutes", watermark="10 minutes",
        how="left_outer",
    )
    q = (
        j.writeStream.format("memory").queryName("ssj_lo")
        .outputMode("append").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(600), "stream did not finish"
    got = {
        r["lv"]: r["r_rv"]
        for r in spark.sql("SELECT * FROM ssj_lo").collect()
    }
    assert got["L0"] == "R0"
    # unmatched left row emitted with NULL right side once the watermark
    # proved no match can still arrive
    assert "LNOMATCH" in got and got["LNOMATCH"] is None


def test_stream_static_enrichment_needs_no_state(spark, tmp_path):
    """One side static (the dimension-enrichment shape): joins without
    watermark state — every left row matches the static snapshot."""
    ldir = str(tmp_path / "ss_l")
    _write_batches(spark, ldir, L_SCHEMA, [
        [("a", _mins(0), "L0"), ("b", _mins(1), "L1")],
    ])
    dim = spark.createDataFrame(
        [("a", _mins(0), "DA"), ("b", _mins(0), "DB")], R_SCHEMA
    )
    j = stream_interval_join(
        _stream(spark, ldir, L_SCHEMA), dim,
        on=["k"], tolerance="60 minutes",
    )
    q = (
        j.writeStream.format("memory").queryName("ssj_static")
        .outputMode("append").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(600), "stream did not finish"
    got = {r["lv"]: r["r_rv"] for r in spark.sql("SELECT * FROM ssj_static").collect()}
    assert got == {"L0": "DA", "L1": "DB"}


def test_join_guards(spark, tmp_path):
    ldir = str(tmp_path / "g_l")
    _write_batches(spark, ldir, L_SCHEMA, [[("a", _mins(0), "L0")]])
    s = _stream(spark, ldir, L_SCHEMA)
    with pytest.raises(ValueError, match="unsupported how"):
        stream_interval_join(s, s, on=["k"], how="full_outer")
    with pytest.raises(ValueError, match="at least one key"):
        stream_interval_join(s, s, on=[])
    with pytest.raises(ValueError, match="absent"):
        stream_interval_join(s, s, on=["nope"])
