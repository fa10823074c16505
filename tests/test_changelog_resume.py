"""Offsets ride the commit — file-changelog leg: each applied batch
records a log position claim ({"max_seg", "seen"}) inside the stream's
fence entry in the SAME atomic commit as the data, read from the
checkpoint's own source log (zero extra Spark actions). A LOST
checkpoint then resumes from the table itself (start_from='table'),
tailing only the segments beyond the last fully-applied one, under a
version-derived stream id. Re-reading a partially-applied tail segment
is safe by construction: the resume replays a whole ORDERED suffix of
the log, which is idempotent under the seq replay-order contract.
"""

from __future__ import annotations

import shutil

import pytest
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
from datax_spark.streaming.resume import (
    advance_claim,
    best_claim,
    changelog_batch_files,
    completed_segment,
    remaining_segments_glob,
)

TABLE_SCHEMA = StructType(
    [StructField(c, StringType()) for c in
     ["repo", "path", "commit", "lang", "content"]]
)
EVENT_SCHEMA = StructType(
    TABLE_SCHEMA.fields
    + [
        StructField("op", StringType()),
        StructField("seq", LongType()),
        StructField("ts", TimestampType()),
        StructField("batch_file", IntegerType()),
    ]
)
KEYS = ["repo", "path", "commit"]


@pytest.fixture(scope="module")
def stream_log(spark, tmp_path_factory):
    df = generate_changelog(
        spark, n_events=6000, n_keys=700, events_per_segment=1500
    )
    d = str(tmp_path_factory.mktemp("resumelog"))
    write_segments(df, d)
    return d, df.toPandas()


def _mk(spark, path):
    return LakeTable.create(
        spark, path, TABLE_SCHEMA, key_cols=KEYS,
        bucket_key="repo", num_buckets=4,
    )


def _fp(table):
    pdf = (
        table.read().select(*TABLE_SCHEMA.fieldNames())
        .orderBy(*KEYS).toPandas()
    )
    return state_fingerprint(pdf)


def _tail(spark, table, log_dir, ckpt, **kw):
    return tail_and_apply(
        spark, table.path, log_dir, ckpt, EVENT_SCHEMA,
        max_files_per_trigger=3, timeout_sec=180.0, **kw,
    )


def test_advance_claim_folding():
    f = ["file:/x/seg=0/p1", "file:/x/seg=0/p2", "file:/x/seg=1/p1"]
    c = advance_claim(None, f)
    assert c == {"max_seg": 1, "seen": 1}
    c = advance_claim(c, ["file:/x/seg=1/p2", "file:/x/seg=2/p1"])
    assert c == {"max_seg": 2, "seen": 1}
    c = advance_claim(c, ["file:/x/seg=2/p2"])
    assert c == {"max_seg": 2, "seen": 2}
    # no segment-shaped paths -> claim unchanged, never regressed
    assert advance_claim(c, ["file:/y/other"]) == c
    assert advance_claim(c, ["file:/x/seg=1/late"]) == c


def test_completed_segment_resolution(tmp_path):
    log = tmp_path / "log"
    (log / "seg=0").mkdir(parents=True)
    (log / "seg=1").mkdir()
    for n in ("a.parquet", "b.parquet"):
        (log / "seg=1" / n).write_text("x")
    (log / "seg=1" / "_SUCCESS").write_text("")
    assert completed_segment(str(log), None) == -1
    assert completed_segment(str(log), {"max_seg": 1, "seen": 1}) == 0
    assert completed_segment(str(log), {"max_seg": 1, "seen": 2}) == 1
    assert remaining_segments_glob(str(log), 1) is None
    assert remaining_segments_glob(str(log), 0) == str(log) + "/seg=1"
    assert remaining_segments_glob(str(log), -1) == str(log) + "/seg=*"


def test_position_rides_the_commit(spark, stream_log, tmp_path):
    log_dir, events_pdf = stream_log
    table = _mk(spark, str(tmp_path / "tbl"))
    ckpt = str(tmp_path / "ck")
    _tail(spark, table, log_dir, ckpt)
    assert _fp(table) == state_fingerprint(replay_oracle_pandas(events_pdf))

    claim = best_claim(table)
    assert claim is not None
    # the final claim covers the whole log: every segment applied
    assert completed_segment(log_dir, claim) == max(_seg_ids(log_dir))
    # and the recorded file count matches the checkpoint's own source
    # log for the last batch (the zero-action read really read it)
    assert changelog_batch_files(ckpt, 0), "source log unreadable"
    # caught-up table + lost checkpoint -> nothing to do, no query
    assert _tail(spark, table, log_dir, str(tmp_path / "ck_x"),
                 start_from="table") is None


def _seg_ids(log_dir):
    import os

    return sorted(
        int(d.split("=")[1]) for d in os.listdir(log_dir)
        if d.startswith("seg=")
    )


def test_lost_checkpoint_resumes_from_table(spark, stream_log, tmp_path):
    import os

    log_dir, events_pdf = stream_log
    oracle_fp = state_fingerprint(replay_oracle_pandas(events_pdf))
    table = _mk(spark, str(tmp_path / "tbl"))
    ckpt = str(tmp_path / "ck")
    # tail a partial copy holding only the first two segments, then
    # "lose" the checkpoint while the remaining segments land
    partial = str(tmp_path / "partial")
    os.makedirs(partial)
    for s in (0, 1):
        shutil.copytree(
            os.path.join(log_dir, f"seg={s}"),
            os.path.join(partial, f"seg={s}"), copy_function=shutil.copy2,
        )
    _tail(spark, table, partial, ckpt)
    shutil.rmtree(ckpt)
    claim = best_claim(table)
    assert claim is not None and claim["max_seg"] == 1
    assert completed_segment(log_dir, claim) == 1
    # the resume must tail ONLY the remaining segments
    glob = remaining_segments_glob(log_dir, 1)
    assert "seg=0" not in glob and "seg=1," not in glob

    before = table.current_version()
    _tail(spark, table, log_dir, str(tmp_path / "ck2"), start_from="table")
    assert _fp(table) == oracle_fp
    # the resumed stream ran under a version-derived id whose fence
    # accepted the fresh checkpoint's batch 0
    streams = table.snapshot().properties["streams"]
    sids = [s for s in streams if f"@v{before}" in s]
    assert sids, streams
    # and it kept recording: the new entry's claim covers the whole log
    assert completed_segment(log_dir, streams[sids[0]]["changelog_pos"]) \
        == max(_seg_ids(log_dir))


def test_partial_segment_claim_is_conservative(spark, stream_log, tmp_path):
    """Kill the tail mid-segment: the claim resolves to the last FULL
    segment, and the table-resume replays the ordered suffix to the
    exact oracle state (re-reading the partial segment is idempotent)."""
    import os

    log_dir, events_pdf = stream_log
    oracle_fp = state_fingerprint(replay_oracle_pandas(events_pdf))
    table = _mk(spark, str(tmp_path / "tbl"))
    ckpt = str(tmp_path / "ck")
    # one file per micro-batch; stop after 2 micro-batches => seg 0
    # (which has >2 part files at this n_parts) is only partially applied
    n_files_seg0 = sum(
        1 for f in os.listdir(os.path.join(log_dir, "seg=0"))
        if not f.startswith((".", "_"))
    )
    applied = {"n": 0}

    cfg = PipelineConfig()

    def counting_sink(batch_df, batch_id):
        from datax_spark.streaming.pipeline import apply_batch
        from datax_spark.streaming.resume import (
            advance_claim as adv, changelog_batch_files as cbf,
            stream_claim as sc,
        )

        t = LakeTable(batch_df.sparkSession, table.path)
        files = cbf(ckpt, batch_id)
        extras = None
        if files:
            pos = adv(sc(t, cfg.stream_id), files)
            if pos:
                extras = {"changelog_pos": pos}
        apply_batch(t, batch_df, batch_id, cfg, stream_extras=extras)
        applied["n"] += 1
        if applied["n"] >= 2:
            raise RuntimeError("simulated crash mid-segment")

    try:
        tail_and_apply(
            spark, table.path, log_dir, ckpt, EVENT_SCHEMA,
            max_files_per_trigger=1, timeout_sec=120.0, sink=counting_sink,
        )
    except Exception as e:  # the simulated crash surfaces via the query
        assert "simulated crash" in str(e)
    assert applied["n"] >= 2
    claim = best_claim(table)
    assert claim is not None
    if n_files_seg0 > 2:
        # mid-segment: claim must NOT mark seg 0 complete
        assert completed_segment(log_dir, claim) == -1
    shutil.rmtree(ckpt)
    _tail(spark, table, log_dir, str(tmp_path / "ck2"), start_from="table")
    assert _fp(table) == oracle_fp


def test_record_position_off_keeps_entry_lean(spark, stream_log, tmp_path):
    log_dir, _ = stream_log
    table = _mk(spark, str(tmp_path / "tbl"))
    _tail(spark, table, log_dir, str(tmp_path / "ck"),
          record_position=False)
    for e in table.snapshot().properties["streams"].values():
        assert "changelog_pos" not in e
    assert best_claim(table) is None
    with pytest.raises(ValueError, match="start_from"):
        _tail(spark, table, log_dir, str(tmp_path / "ck3"),
              start_from="nope")
