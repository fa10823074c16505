"""Structured Streaming tail -> fenced MERGE apply, incl. kill/resume."""

import os

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

from datax_spark.lake.table import LakeTable
from datax_spark.oracle import replay_oracle_pandas, state_fingerprint
from datax_spark.sources.changelog import generate_changelog, write_segments
from datax_spark.streaming.pipeline import PipelineConfig, tail_and_apply

EVENT_SCHEMA = StructType(
    [
        StructField("repo", StringType()),
        StructField("path", StringType()),
        StructField("commit", StringType()),
        StructField("lang", StringType()),
        StructField("content", StringType()),
        StructField("op", StringType()),
        StructField("seq", LongType()),
        StructField("ts", TimestampType()),
        StructField("batch_file", IntegerType()),
    ]
)

TABLE_SCHEMA = StructType(
    [
        StructField("repo", StringType()),
        StructField("path", StringType()),
        StructField("commit", StringType()),
        StructField("lang", StringType()),
        StructField("content", StringType()),
    ]
)


@pytest.fixture(scope="module")
def stream_log(spark, tmp_path_factory):
    df = generate_changelog(spark, n_events=6000, n_keys=700, events_per_segment=1500)
    d = str(tmp_path_factory.mktemp("streamlog"))
    write_segments(df, d)
    return d, df.toPandas()


def _mk_table(spark, path):
    return LakeTable.create(
        spark,
        path,
        TABLE_SCHEMA,
        key_cols=["repo", "path", "commit"],
        bucket_key="repo",
        num_buckets=4,
    )


def _state_fp(table):
    pdf = (
        table.read()
        .select("repo", "path", "commit", "lang", "content")
        .orderBy("repo", "path", "commit")
        .toPandas()
    )
    return state_fingerprint(pdf), len(pdf)


def test_stream_tail_matches_oracle(spark, stream_log, tmp_path):
    log_dir, events_pdf = stream_log
    table = _mk_table(spark, str(tmp_path / "tbl"))
    tail_and_apply(
        spark,
        table.path,
        log_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        schema=EVENT_SCHEMA,
        config=PipelineConfig(quarantine_dir=str(tmp_path / "quar")),
        max_files_per_trigger=2,
    )
    oracle = replay_oracle_pandas(events_pdf)
    fp, n = _state_fp(table)
    assert n == len(oracle)
    assert fp == state_fingerprint(oracle)


def test_stream_restart_resumes_and_stays_exactly_once(spark, stream_log, tmp_path):
    """Run the stream twice over the same checkpoint: second run applies
    nothing new and the state is unchanged (offsets + fence compose)."""
    log_dir, events_pdf = stream_log
    table = _mk_table(spark, str(tmp_path / "tbl2"))
    ckpt = str(tmp_path / "ckpt2")
    cfg = PipelineConfig(quarantine_dir=str(tmp_path / "quar2"))
    oracle = replay_oracle_pandas(events_pdf)
    oracle_fp = state_fingerprint(oracle)
    # The FIRST run alone must complete the log (a retry here would mask
    # dropped-segment regressions). Environmental early-death is handled
    # at the root: -Xss16m in conftest (a StackOverflowError once killed
    # a stream thread late in the full suite) + the 600s await budget.
    tail_and_apply(spark, table.path, log_dir, ckpt, EVENT_SCHEMA, cfg, 1,
                   timeout_sec=600)
    fp1, n1 = _state_fp(table)
    assert fp1 == oracle_fp
    v1 = table.current_version()
    # "restart": same checkpoint dir, no new files -> applies nothing
    tail_and_apply(spark, table.path, log_dir, ckpt, EVENT_SCHEMA, cfg, 1)
    fp2, n2 = _state_fp(table)
    assert (fp2, n2) == (fp1, n1)
    assert table.current_version() == v1


def test_stream_late_segment_arrival(spark, stream_log, tmp_path):
    """New segments landing after a run are picked up by the next run."""
    log_dir, events_pdf = stream_log
    import shutil

    partial = str(tmp_path / "partial_log")
    os.makedirs(partial)
    segs = sorted(d for d in os.listdir(log_dir) if d.startswith("seg="))
    for s in segs[:2]:
        shutil.copytree(os.path.join(log_dir, s), os.path.join(partial, s))
    table = _mk_table(spark, str(tmp_path / "tbl3"))
    ckpt = str(tmp_path / "ckpt3")
    tail_and_apply(spark, table.path, partial, ckpt, EVENT_SCHEMA, None, 1)
    _, n_partial = _state_fp(table)
    for s in segs[2:]:
        shutil.copytree(os.path.join(log_dir, s), os.path.join(partial, s))
    tail_and_apply(spark, table.path, partial, ckpt, EVENT_SCHEMA, None, 1)
    fp, n = _state_fp(table)
    oracle = replay_oracle_pandas(events_pdf)
    assert n == len(oracle)
    assert fp == state_fingerprint(oracle)


def test_stream_lineage_in_metrics_and_listener(spark, stream_log, tmp_path):
    """Per-batch LINEAGE on the streaming path: every applied micro-batch
    writes a metrics JSONL line whose ``lineage`` maps bucket -> max_seq
    (ShardCheckpoint.java:8-51 analog), the per-bucket watermarks compose
    monotonically to the final snapshot lineage, and the
    ProgressJsonListener emits matching per-batch progress lines — the
    DataX speed/stat reporting trail (CommunicationTool.java:56-108)."""
    import json

    from datax_spark.streaming.listener import ProgressJsonListener

    log_dir, _ = stream_log
    table = _mk_table(spark, str(tmp_path / "tbl_lin"))
    metrics_path = str(tmp_path / "metrics.jsonl")
    progress_path = str(tmp_path / "progress.jsonl")
    listener = ProgressJsonListener(progress_path)
    spark.streams.addListener(listener)
    try:
        tail_and_apply(
            spark,
            table.path,
            log_dir,
            checkpoint_dir=str(tmp_path / "ckpt_lin"),
            schema=EVENT_SCHEMA,
            config=PipelineConfig(
                quarantine_dir=str(tmp_path / "quar_lin"),
                metrics_path=metrics_path,
            ),
            max_files_per_trigger=2,
        )
    finally:
        spark.streams.removeListener(listener)

    lines = [json.loads(x) for x in open(metrics_path)]
    applied = [m for m in lines if m["applied"]]
    assert len(applied) >= 2  # genuinely multiple micro-batches
    assert all(m["lineage"] for m in applied), "every batch exposes lineage"
    # per-bucket max_seq must be monotone across batches and compose to
    # the final snapshot's recorded lineage
    high: dict = {}
    for m in applied:
        for b, s in m["lineage"].items():
            assert s >= high.get(b, -1), "lineage watermark regressed"
            high[b] = s
    snap_lineage = {
        b: st["max_seq"] for b, st in table.snapshot().lineage.items()
    }
    assert snap_lineage == high

    # listener delivery is async (event-bus): poll briefly for the tail
    import time as _time

    deadline = _time.monotonic() + 15
    while _time.monotonic() < deadline:
        progress = [json.loads(x) for x in open(progress_path)]
        batches = [p for p in progress
                   if p["event"] == "progress" and p["numInputRows"] > 0]
        if len(batches) >= len(applied):
            break
        _time.sleep(0.5)
    # one listener line per batch (allow the final event to be dropped by
    # the bus when the query stops before delivery)
    assert len(batches) >= len(applied) - 1 >= 1


def test_stream_bytes_per_trigger(spark, stream_log, tmp_path):
    """bps-style trigger budget (maxBytesPerTrigger, soft cap >= 1 file):
    state still converges to the oracle under byte-bounded batches."""
    log_dir, events_pdf = stream_log
    table = _mk_table(spark, str(tmp_path / "tblb"))
    tail_and_apply(
        spark,
        table.path,
        log_dir,
        checkpoint_dir=str(tmp_path / "ckptb"),
        schema=EVENT_SCHEMA,
        max_bytes_per_trigger=1,  # forces one file per micro-batch
        timeout_sec=600,  # ~100 one-file batches; 120s flakes on a loaded JVM
    )
    oracle = replay_oracle_pandas(events_pdf)
    fp, n = _state_fp(table)
    assert n == len(oracle)
    assert fp == state_fingerprint(oracle)


def test_watermark_windowed_agg_drops_late_events(spark, tmp_path):
    """Watermark + windowed agg (append mode): a finalized window emits
    once the watermark passes it, and an event older than the watermark
    is dropped instead of corrupting the emitted count — the late-data
    contract for windowed aggregations (the CDC apply path itself
    handles lateness via latest-wins, which needs no watermark)."""
    import datetime as dt
    import os as _os
    import time as _time

    from pyspark.sql.types import TimestampType

    logdir = str(tmp_path / "wmlog")
    schema = StructType([
        StructField("k", StringType()), StructField("ts", TimestampType()),
    ])
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    batches = [
        # 5 on-time events in the 10:00-10:05 window
        [(f"k{i}", base + dt.timedelta(seconds=i)) for i in range(5)],
        # far-future event: advances the watermark past 10:05
        [("adv", base + dt.timedelta(hours=1))],
        # second advancing batch: the 10:00 window is EVICTED + emitted
        # here (eviction uses the watermark computed by the previous
        # batch — Spark admits late rows until the state is gone)
        [("adv2", base + dt.timedelta(hours=1, minutes=1))],
        # late event for the already-emitted window -> dropped
        [("late", base + dt.timedelta(seconds=30))],
    ]
    now = _time.time()
    for i, rows in enumerate(batches):
        seg = _os.path.join(logdir, f"seg={i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(seg)
        for f in _os.listdir(seg):
            _os.utime(_os.path.join(seg, f), (now + i, now + i))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(logdir + "/seg=*")
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"))
        .count()
    )
    q = (
        agg.writeStream.format("memory").queryName("wm_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(600), "stream did not finish"
    dropped = sum(
        so["numRowsDroppedByWatermark"]
        for p in q.recentProgress for so in p["stateOperators"]
    )
    rows = {
        r["window"]["start"].strftime("%H:%M"): r["count"]
        for r in spark.sql("SELECT * FROM wm_out").collect()
    }
    assert rows.get("10:00") == 5  # late event NOT counted
    assert dropped >= 1


def test_stateful_repo_stats_accumulate_across_batches(spark, stream_log, tmp_path):
    """applyInPandasWithState custom operator: per-repo counters persist
    in the state store ACROSS micro-batches — the final emitted row per
    repo equals the batch-agnostic aggregate of the whole log."""
    from datax_spark.streaming.stateful import repo_stats_stream

    log_dir, events_pdf = stream_log
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(log_dir + "/seg=*")
        .filter(F.col("repo").isNotNull())  # quarantine runs first IRL
    )
    out = repo_stats_stream(stream)
    q = (
        out.writeStream.format("memory").queryName("repo_stats")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "st_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not finish"
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches > 1  # state genuinely crossed batch boundaries

    # memory sink in update mode appends each emission (collect order is
    # not emission order); counters are cumulative, so the max-events row
    # per repo is the final state
    got = {}
    for r in spark.sql("SELECT * FROM repo_stats").collect():
        cur = got.get(r["repo"])
        cand = (r["events"], r["deletes"], r["max_seq"])
        if cur is None or cand[0] > cur[0]:
            got[r["repo"]] = cand
    clean_pdf = events_pdf[events_pdf["repo"].notna()]
    want_events = clean_pdf.groupby("repo").size()
    want_deletes = (
        clean_pdf[clean_pdf["op"] == "delete"].groupby("repo").size()
    )
    want_maxseq = clean_pdf.groupby("repo")["seq"].max()
    for repo, (ev, de, mx) in got.items():
        assert ev == int(want_events[repo])
        assert de == int(want_deletes.get(repo, 0))
        assert mx == int(want_maxseq[repo])
    assert set(got) == set(want_events.index)


def test_stream_auto_compact_bounds_deltas(spark, stream_log, tmp_path):
    """PipelineConfig(auto_compact=True) runs the compaction policy after
    every committed micro-batch: the MOR table's deltas stay bounded by
    the policy while the streamed state still matches the oracle — the
    steady-state contract the 10^10-event extrapolation assumes."""
    from datax_spark.lake.mor import MorTable

    log_dir, events_pdf = stream_log
    table = MorTable.create(
        spark, str(tmp_path / "tbl_ac"), TABLE_SCHEMA,
        key_cols=["repo", "path", "commit"], bucket_key="repo",
        num_buckets=4,
    )
    tail_and_apply(
        spark,
        table.path,
        log_dir,
        checkpoint_dir=str(tmp_path / "ckpt_ac"),
        schema=EVENT_SCHEMA,
        config=PipelineConfig(
            quarantine_dir=str(tmp_path / "quar_ac"),
            auto_compact=True,
            compact_options={"max_delta_ratio": 0.2, "max_files_per_bucket": 2},
        ),
        max_files_per_trigger=2,
    )
    snap = table.snapshot()
    # the policy kept per-bucket fragmentation at/below its bound
    # (at most one post-policy batch of deltas can be outstanding)
    for b in set(snap.buckets) | set(snap.deltas):
        n = len(snap.buckets.get(b, [])) + len(snap.deltas.get(b, []))
        assert n <= 3, f"bucket {b} fragmented to {n} files"
    oracle = replay_oracle_pandas(events_pdf)
    pdf = (
        table.read()
        .select("repo", "path", "commit", "lang", "content")
        .orderBy("repo", "path", "commit")
        .toPandas()
    )
    assert len(pdf) == len(oracle)
    assert state_fingerprint(pdf) == state_fingerprint(oracle)


def test_streaming_session_window_merges_and_emits(spark, tmp_path):
    """Streaming session_window + watermark (append mode): events within
    the gap merge into ONE session row across micro-batches; the session
    emits once the watermark passes its end. Batch twin value-checked in
    cdc_session_windows; this pins the streaming state semantics."""
    import datetime as dt
    import os as _os
    import time as _time

    from pyspark.sql.types import TimestampType

    logdir = str(tmp_path / "sesslog")
    schema = StructType([
        StructField("k", StringType()), StructField("ts", TimestampType()),
    ])
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    batches = [
        # two bursts for k1 split across micro-batches but within the
        # 5-minute gap -> must merge to one session
        [("k1", base), ("k1", base + dt.timedelta(minutes=2))],
        [("k1", base + dt.timedelta(minutes=4))],
        # a separate burst past the gap -> second session
        [("k1", base + dt.timedelta(minutes=20))],
        # watermark advancer
        [("adv", base + dt.timedelta(hours=2))],
        [("adv2", base + dt.timedelta(hours=2, minutes=1))],
    ]
    now = _time.time()
    for i, rows in enumerate(batches):
        seg = _os.path.join(logdir, f"seg={i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(seg)
        for f in _os.listdir(seg):
            _os.utime(_os.path.join(seg, f), (now + i, now + i))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(logdir + "/seg=*")
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "5 minutes"), "k")
        .count()
    )
    q = (
        agg.writeStream.format("memory").queryName("sess_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(600), "stream did not finish"
    got = {
        (r["k"], r["session_window"]["start"].strftime("%H:%M")): r["count"]
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    # the three cross-batch k1 events merged into ONE 10:00 session
    assert got.get(("k1", "10:00")) == 3
    # the 10:20 burst is its own session
    assert got.get(("k1", "10:20")) == 1
