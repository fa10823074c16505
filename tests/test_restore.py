"""RESTORE-to-version (Delta RESTORE / Iceberg rollback analog).

The contract under test: restore publishes a NEW version equal to the
target's complete state (files, schema, properties INCLUDING stream
fences), history stays addressable, and — the CDC point — a changelog
replay from the restored position re-applies instead of being fenced,
so restore + replay reconstructs the full state exactly-once.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from datax_spark.lake.mor import MorTable
from datax_spark.lake.table import LakeTable, RestoreError
from datax_spark.oracle import replay_oracle_pandas, state_fingerprint
from datax_spark.sources.changelog import generate_changelog
from datax_spark.streaming.pipeline import apply_batch

SCHEMA = StructType(
    [StructField(c, StringType()) for c in
     ["repo", "path", "commit", "lang", "content"]]
)
KEYS = ["repo", "path", "commit"]


@pytest.fixture(scope="module")
def halves(spark):
    log = generate_changelog(
        spark, n_events=4000, n_keys=500, events_per_segment=1000
    ).persist()
    mid = log.agg(F.floor(F.max("seq") / 2)).first()[0]
    b0 = log.filter(F.col("seq") <= mid)
    b1 = log.filter(F.col("seq") > mid)
    yield log, b0, b1
    log.unpersist()


def _fp(table, version=None):
    return state_fingerprint(
        table.read(version=version).orderBy(KEYS).toPandas()
    )


def test_restore_rewinds_state_and_fences_then_replay(spark, tmp_path, halves):
    log, b0, b1 = halves
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, "repo", 8)
    apply_batch(t, b0, 0)
    v_after_b0 = t.current_version()
    fp_after_b0 = _fp(t)
    apply_batch(t, b1, 1)
    v_after_b1 = t.current_version()
    fp_full = _fp(t)

    snap = t.restore(v_after_b0)
    # new version published, history preserved
    assert snap.version == v_after_b1 + 1
    assert _fp(t) == fp_after_b0
    assert _fp(t, version=v_after_b1) == fp_full  # rolled-back still readable
    # fence rewound with the properties: batch 1 is NOT a duplicate now
    assert t.last_batch_id("default") == 0
    m = apply_batch(t, b1, 1)
    assert m.applied
    assert _fp(t) == fp_full
    want = state_fingerprint(
        replay_oracle_pandas(log.toPandas()).sort_values(KEYS).reset_index(drop=True)
    )
    got = state_fingerprint(
        t.read().select(*SCHEMA.fieldNames()).orderBy(KEYS).toPandas()
    )
    assert got == want


def test_restore_is_noop_at_current_state(spark, tmp_path, halves):
    _, b0, _ = halves
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, "repo", 8)
    apply_batch(t, b0, 0)
    v = t.current_version()
    snap = t.restore(v)
    assert snap.version == v  # nothing published
    assert t.current_version() == v


def test_restore_to_empty_and_restore_of_restore(spark, tmp_path, halves):
    _, b0, b1 = halves
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, "repo", 8)
    v_empty = t.current_version()
    apply_batch(t, b0, 0)
    apply_batch(t, b1, 1)
    v_full = t.current_version()
    fp_full = _fp(t)
    t.restore(v_empty)
    assert t.read().count() == 0
    # a bad restore is itself restorable
    t.restore(v_full)
    assert _fp(t) == fp_full


def test_restore_raises_on_vacuumed_manifest(spark, tmp_path, halves):
    _, b0, b1 = halves
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, "repo", 8)
    apply_batch(t, b0, 0)
    v_old = t.current_version()
    apply_batch(t, b1, 1)
    t.compact()
    t.vacuum(keep_last=1)
    with pytest.raises(RestoreError, match="not retained"):
        t.restore(v_old)


def test_restore_raises_on_missing_data_file(spark, tmp_path, halves):
    _, b0, b1 = halves
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, "repo", 8)
    apply_batch(t, b0, 0)
    v_old = t.current_version()
    snap_old = t.snapshot(v_old)
    apply_batch(t, b1, 1)
    rel = next(iter(fs[0] for fs in snap_old.buckets.values() if fs))
    os.unlink(os.path.join(t.path, rel))
    with pytest.raises(RestoreError, match="no longer exist"):
        t.restore(v_old)
    # and nothing was published by the failed attempt
    assert t.last_batch_id("default") == 1


def test_tagged_version_survives_vacuum_and_restores(spark, tmp_path, halves):
    _, b0, b1 = halves
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, "repo", 8)
    apply_batch(t, b0, 0)
    v_tagged = t.current_version()
    fp_tagged = _fp(t)
    t.create_tag("pre_b1", v_tagged)
    apply_batch(t, b1, 1)
    t.compact()
    t.vacuum(keep_last=1)
    t.restore(t.resolve_tag("pre_b1"))
    assert _fp(t) == fp_tagged


def test_restore_across_rebucket_reverts_layout(spark, tmp_path, halves):
    _, b0, b1 = halves
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, "repo", 4)
    apply_batch(t, b0, 0)
    v_old = t.current_version()
    fp_old = _fp(t)
    t.rebucket(16)
    apply_batch(t, b1, 1)
    t.restore(v_old)
    snap = t.snapshot()
    assert snap.properties["num_buckets"] == 4  # layout props revert together
    assert _fp(t) == fp_old
    # the restored layout is live: the next apply hashes into 4 buckets
    m = apply_batch(t, b1, 1)
    assert m.applied


def test_mor_restore_to_precompact_state(spark, tmp_path, halves):
    log, b0, b1 = halves
    t = MorTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, "repo", 8)
    apply_batch(t, b0, 0)
    apply_batch(t, b1, 1)
    v_pre = t.current_version()
    fp_pre = _fp(t)
    assert any(t.snapshot(v_pre).deltas.values())
    t.compact()
    assert not any(t.snapshot().deltas.values())
    t.restore(v_pre)
    snap = t.snapshot()
    assert any(snap.deltas.values())  # delta lists restored verbatim
    assert _fp(t) == fp_pre
