"""Lake -> envelope-segment -> lake relay (streaming/relay.py).

End-to-end exactly-once: at-least-once emit (cursor advances after
publish; crash re-emits into the same dirs) x fenced apply (batch_id =
commit version) = the consumer converges on the producer's state no
matter how often either side reruns.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.types import StringType, StructField, StructType

from datax_spark.lake.table import LakeTable
from datax_spark.oracle import state_fingerprint
from datax_spark.streaming.pipeline import apply_batch
from datax_spark.streaming.relay import (
    apply_emitted_segments,
    emit_changes_segments,
)

PAYLOAD = StructType(
    [StructField(c, StringType()) for c in
     ["repo", "path", "commit", "lang", "content"]]
)
KEYS = ["repo", "path", "commit"]


def _chg(spark, rows):
    return spark.createDataFrame(
        [(r, "p", "c", "na", c, op, s) for (r, c, op, s) in rows],
        "repo string, path string, commit string, lang string, "
        "content string, op string, seq long",
    )


def _mk(spark, tmp_path, name):
    return LakeTable.create(
        spark, str(tmp_path / name), PAYLOAD, KEYS, "repo", 4
    )


def _fp(t):
    return state_fingerprint(t.read().orderBy(KEYS).toPandas())


def test_relay_replicates_and_is_exactly_once(spark, tmp_path):
    src = _mk(spark, tmp_path, "src")
    dst = _mk(spark, tmp_path, "dst")
    emit_dir = str(tmp_path / "bus")

    apply_batch(src, _chg(spark, [
        ("r1", "v1", "insert", 1), ("r2", "w1", "insert", 2),
    ]), 0)
    apply_batch(src, _chg(spark, [
        ("r1", "v2", "update", 10), ("r2", None, "delete", 11),
        ("r3", "x1", "insert", 12),
    ]), 1)

    segs = emit_changes_segments(src, emit_dir)
    assert [v for v, _ in segs] == list(
        range(2, src.current_version() + 1)
    )
    applied = apply_emitted_segments(spark, dst, emit_dir, PAYLOAD)
    assert applied, "nothing applied"
    assert _fp(dst) == _fp(src)

    # re-apply: every segment fenced, state unchanged
    assert apply_emitted_segments(spark, dst, emit_dir, PAYLOAD) == []
    assert _fp(dst) == _fp(src)

    # nothing new -> no emit
    assert emit_changes_segments(src, emit_dir) == []


def test_relay_incremental_and_crash_reemit(spark, tmp_path):
    src = _mk(spark, tmp_path, "src")
    dst = _mk(spark, tmp_path, "dst")
    emit_dir = str(tmp_path / "bus")

    apply_batch(src, _chg(spark, [("r1", "v1", "insert", 1)]), 0)
    emit_changes_segments(src, emit_dir)
    apply_emitted_segments(spark, dst, emit_dir, PAYLOAD)
    assert _fp(dst) == _fp(src)

    # a second producer batch emits ONLY the new commits
    apply_batch(src, _chg(spark, [("r1", "v2", "update", 5)]), 1)
    before = set(os.listdir(emit_dir))
    segs = emit_changes_segments(src, emit_dir)
    assert len(segs) >= 1
    assert all(os.path.basename(d) not in before for _, d in segs)

    # crash between publish and cursor write: rewind the cursor, re-emit
    # -> same dirs replaced atomically, consumer stays fenced + equal
    cur = json.load(open(os.path.join(emit_dir, "_cursor.json")))
    with open(os.path.join(emit_dir, "_cursor.json"), "w") as f:
        json.dump({"emitted_version": cur["emitted_version"] - 1}, f)
    re_segs = emit_changes_segments(src, emit_dir)
    assert len(re_segs) == 1
    apply_emitted_segments(spark, dst, emit_dir, PAYLOAD)
    assert _fp(dst) == _fp(src)
