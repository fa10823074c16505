"""Sharded manifests: O(num_buckets) snapshot JSON at any file count.

The Iceberg manifest-list analog: per-bucket file lists live in
content-addressed side files; the versioned snapshot holds pointers.
Untouched buckets re-use the previous ref (no hashing), identical
content shares one side file, vacuum collects unreferenced refs.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.types import StringType, StructField, StructType

from datax_spark.lake.mor import MorTable
from datax_spark.lake.table import REFS_DIR, LakeTable
from datax_spark.oracle import replay_oracle_pandas, state_fingerprint
from datax_spark.sources.changelog import generate_changelog, write_segments
from datax_spark.streaming.pipeline import apply_segments

SCHEMA = StructType(
    [StructField(c, StringType()) for c in
     ["repo", "path", "commit", "lang", "content"]]
)
KEYS = ["repo", "path", "commit"]


def _manifest_doc(table, version):
    with open(table._manifest_path(version)) as f:
        return json.load(f)


def test_sharded_lifecycle_matches_oracle_and_stays_small(spark, tmp_path):
    logdir = str(tmp_path / "log")
    log = generate_changelog(
        spark, n_events=6000, n_keys=800, events_per_segment=1500
    )
    write_segments(log, logdir)
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, KEYS, "repo", 8,
        manifest_mode="sharded",
    )
    apply_segments(spark, t, logdir)
    # correctness unchanged by the manifest layout
    got = state_fingerprint(t.read().orderBy(KEYS).toPandas())
    want = state_fingerprint(replay_oracle_pandas(log.toPandas()))
    assert got == want
    # on-disk snapshot stores pointers, not file lists
    doc = _manifest_doc(t, t.current_version())
    assert all("@ref" in v for v in doc["buckets"].values())
    assert os.listdir(os.path.join(t.path, REFS_DIR))
    # in-memory view is fully resolved
    snap = t.snapshot()
    assert all(isinstance(fs, list) and fs for fs in snap.buckets.values())


def test_snapshot_json_growth_is_bounded(spark, tmp_path):
    """Inline snapshots grow with total file count; sharded snapshots
    stay O(num_buckets) as batches accumulate."""
    def run(mode, name):
        t = LakeTable.create(
            spark, str(tmp_path / name), SCHEMA, KEYS, "repo", 8,
            manifest_mode=mode,
        )
        for b in range(6):
            ev = generate_changelog(spark, n_events=400, n_keys=300, seed=b)
            t.append_insert_only(ev.select(*SCHEMA.fieldNames()), batch_id=b)
        sizes = [
            os.path.getsize(t._manifest_path(v))
            for v in range(2, t.current_version() + 1)
        ]
        return sizes

    inline = run("inline", "ti")
    sharded = run("sharded", "ts")
    assert inline[-1] > inline[0]  # inline grows with files
    # sharded growth is pointer-sized: last snapshot much smaller than
    # the equivalent inline one
    assert sharded[-1] < inline[-1] / 2


def test_untouched_buckets_reuse_refs(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t2"), SCHEMA, KEYS, "repo", 8,
        manifest_mode="sharded",
    )
    ev = generate_changelog(spark, n_events=2000, n_keys=300, dirty_pct=0.0)
    from datax_spark.streaming.pipeline import apply_batch
    apply_batch(t, ev, batch_id=0)
    v1 = t.current_version()
    doc1 = _manifest_doc(t, v1)
    # second batch touching only one repo -> most buckets carry refs fwd
    import pyspark.sql.functions as F
    one = ev.filter(F.col("repo") == ev.first()["repo"])
    apply_batch(t, one, batch_id=1)
    doc2 = _manifest_doc(t, t.current_version())
    same = [
        b for b in doc1["buckets"]
        if doc2["buckets"].get(b) == doc1["buckets"][b]
    ]
    assert same  # untouched buckets share the identical ref pointer


def test_vacuum_collects_unreferenced_refs(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t3"), SCHEMA, KEYS, "repo", 4,
        manifest_mode="sharded",
    )
    from datax_spark.streaming.pipeline import apply_batch
    for b in range(4):
        ev = generate_changelog(spark, n_events=300, n_keys=120, seed=b)
        apply_batch(t, ev, batch_id=b)
    n_refs_before = len(os.listdir(os.path.join(t.path, REFS_DIR)))
    fp = state_fingerprint(t.read().orderBy(KEYS).toPandas())
    stats = t.vacuum(keep_last=1)
    assert stats["removed_refs"] > 0
    assert len(os.listdir(os.path.join(t.path, REFS_DIR))) < n_refs_before
    assert state_fingerprint(t.read().orderBy(KEYS).toPandas()) == fp


def test_mor_sharded_roundtrip(spark, tmp_path):
    logdir = str(tmp_path / "mlog")
    log = generate_changelog(
        spark, n_events=4000, n_keys=500, events_per_segment=1000
    )
    write_segments(log, logdir)
    t = MorTable.create(spark, str(tmp_path / "m"), SCHEMA, KEYS, "repo", 8)
    assert t.snapshot().properties["manifest_mode"] == "sharded"
    apply_segments(spark, t, logdir)
    doc = _manifest_doc(t, t.current_version())
    assert all("@ref" in v for v in doc["deltas"].values())
    got = state_fingerprint(t.read().orderBy(KEYS).toPandas())
    want = state_fingerprint(replay_oracle_pandas(log.toPandas()))
    assert got == want
    t.compact()
    assert state_fingerprint(t.read().orderBy(KEYS).toPandas()) == got
