"""Delta Lake transaction-log export / import (lake/delta.py).

The interop claims verified here:

- round trip: ``read_delta`` reconstructs the table from ``_delta_log``
  ALONE (the lake's own manifests are never consulted) and matches
  ``table.read()`` value-for-value, including time travel by Delta
  version and by lake version across incremental exports;
- the commit JSON carries the spec-required action fields (protocol,
  metaData with Spark-JSON schemaString, add with URL-encoded relative
  path + size + stats, remove tombstones, commitInfo), versions are
  consecutive from 0, and incremental exports emit only the changed
  files;
- checkpoints: the parquet checkpoint + ``_last_checkpoint`` replay to
  the same state as the JSON log, reads work after ``clean_delta_log``
  removes the subsumed commits;
- refusals: live MOR deltas / eq-deletes, branches, re-exports fail
  loudly; renamed columns export via spec column mapping (mode=name)
  when live files agree on ONE physical name, and the mixed-era state
  refuses until a rewrite;
- retention coupling: vacuum keeps every file the mirror's head
  references (delta_pinned_versions).
"""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from datax_spark.lake.delta import (
    DeltaUnexportableState,
    _current_delta_version,
    _read_commit,
    _replay,
    checkpoint_delta,
    clean_delta_log,
    delta_pinned_versions,
    export_delta,
    read_delta,
    sync_delta,
)
from datax_spark.lake.mor import MorTable
from datax_spark.lake.table import LakeTable
from datax_spark.sources.changelog import generate_changelog
from datax_spark.streaming.pipeline import PipelineConfig, apply_batch

SCHEMA = StructType(
    [
        StructField(c, StringType())
        for c in ["repo", "path", "commit", "lang", "content"]
    ]
)
KEYS = ["repo", "path", "commit"]


def _sorted_rows(df, cols=("repo", "path", "commit", "lang", "content")):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


@pytest.fixture(scope="module")
def log_df(spark):
    df = generate_changelog(
        spark, n_events=3000, n_keys=400, events_per_segment=1500
    ).persist()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def exported(spark, log_df, tmp_path_factory):
    """COW table, two batches, exported after EACH batch (incremental)."""
    root = str(tmp_path_factory.mktemp("delta_cow"))
    table = LakeTable.create(
        spark, os.path.join(root, "t"), SCHEMA, KEYS, "repo", num_buckets=4
    )
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(table, log_df.filter(F.col("seq") <= mid), 0)
    v1 = table.current_version()
    c1 = export_delta(table)
    apply_batch(table, log_df.filter(F.col("seq") > mid), 1)
    c2 = export_delta(table)
    return {
        "table": table,
        "v_first": v1,
        "commit1": c1,
        "commit2": c2,
        "location": os.path.abspath(table.path),
    }


def test_round_trip_current_version(spark, exported):
    table = exported["table"]
    got = _sorted_rows(read_delta(spark, exported["location"]))
    want = _sorted_rows(table.read())
    assert len(want) > 0
    assert got == want


def test_time_travel_by_delta_and_lake_version(spark, exported):
    table = exported["table"]
    want = _sorted_rows(table.read(version=exported["v_first"]))
    assert (
        _sorted_rows(read_delta(spark, exported["location"], version=0))
        == want
    )
    assert (
        _sorted_rows(
            read_delta(
                spark,
                exported["location"],
                lake_version=exported["v_first"],
            )
        )
        == want
    )


def test_commit_json_spec_fields_and_incrementality(exported):
    loc = exported["location"]
    assert exported["commit1"].endswith("00000000000000000000.json")
    assert exported["commit2"].endswith("00000000000000000001.json")
    a0 = _read_commit(loc, 0)
    kinds0 = [next(iter(a)) for a in a0]
    assert kinds0[0] == "commitInfo"
    assert "protocol" in kinds0 and "metaData" in kinds0
    proto = next(a["protocol"] for a in a0 if "protocol" in a)
    assert proto == {"minReaderVersion": 1, "minWriterVersion": 2}
    meta = next(a["metaData"] for a in a0 if "metaData" in a)
    assert meta["format"] == {"provider": "parquet", "options": {}}
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    assert {f.name for f in schema.fields} >= set(KEYS)
    adds0 = [a["add"] for a in a0 if "add" in a]
    assert adds0
    for add in adds0:
        assert not os.path.isabs(add["path"])
        assert add["size"] > 0 and add["modificationTime"] > 0
        assert json.loads(add["stats"])["numRecords"] > 0
    # second export: unchanged schema -> no metaData; COW batch rewrites
    # touched buckets -> removes for replaced files, adds for new ones;
    # no re-add of genuinely unchanged files
    a1 = _read_commit(loc, 1)
    kinds1 = {next(iter(a)) for a in a1}
    assert "metaData" not in kinds1 and "protocol" not in kinds1
    adds1 = {a["add"]["path"] for a in a1 if "add" in a}
    assert adds1 and adds1.isdisjoint({a["path"] for a in adds0})
    info1 = next(a["commitInfo"] for a in a1 if "commitInfo" in a)
    assert info1["lakeVersion"] == exported["table"].current_version()


def test_reexport_same_and_older_lake_version_refuse(exported):
    table = exported["table"]
    with pytest.raises(ValueError, match="already exported"):
        export_delta(table)
    with pytest.raises(ValueError, match="older than"):
        export_delta(table, version=exported["v_first"])


def test_sync_delta_noop_and_catch_up(spark, log_df, tmp_path):
    table = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(table, log_df.filter(F.col("seq") <= mid), 0)
    assert sync_delta(table) is not None
    assert sync_delta(table) is None  # in sync
    apply_batch(table, log_df.filter(F.col("seq") > mid), 1)
    assert sync_delta(table) is not None
    assert _current_delta_version(os.path.abspath(table.path)) == 1
    got = _sorted_rows(read_delta(spark, os.path.abspath(table.path)))
    assert got == _sorted_rows(table.read())


def test_roaring_serialization_matches_java_reference(spark):
    """The portable 32-bit roaring bytes must be byte-identical to
    org.roaringbitmap (the format real Delta DV readers parse; the jar
    ships with pyspark) — array containers, a bitmap container
    (cardinality > 4096), multi-container, empty."""
    import random

    from datax_spark.lake.delta import (
        deserialize_dv,
        deserialize_roaring32,
        serialize_dv,
        serialize_roaring32,
    )

    jvm = spark.sparkContext._jvm
    gw = spark.sparkContext._gateway

    def java_bytes(values):
        arr = gw.new_array(jvm.int, len(values))
        for i, v in enumerate(values):
            arr[i] = v
        bm = jvm.org.roaringbitmap.RoaringBitmap.bitmapOf(arr)
        baos = jvm.java.io.ByteArrayOutputStream()
        bm.serialize(jvm.java.io.DataOutputStream(baos))
        return bytes(baos.toByteArray())

    rng = random.Random(7)
    cases = [
        [],
        [0],
        [65535, 65536],
        sorted(rng.sample(range(1 << 20), 500)),
        sorted(rng.sample(range(1 << 16), 6000)),  # bitmap container
        sorted(rng.sample(range(1 << 31), 3000)),
    ]
    for vals in cases:
        assert serialize_roaring32(vals) == java_bytes(vals)
        assert deserialize_roaring32(serialize_roaring32(vals))[0] == vals
    # the 64-bit RoaringBitmapArray framing round-trips incl. >2^32
    for vals in [[], [0, (1 << 32) + 7, (3 << 32) + 5]]:
        assert sorted(deserialize_dv(serialize_dv(vals))) == vals


def test_mor_live_deltas_export_with_deletion_vectors(spark, log_df, tmp_path):
    """Live MOR (inline tombstones) exports as data files + DVs masking
    every row the resolved read hides; protocol upgrades to 3/7 with the
    deletionVectors feature; incremental exports grow the masks;
    checkpoints carry the descriptors; compaction swaps the files."""
    mor = MorTable.create(
        spark, os.path.join(str(tmp_path), "m"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(mor, log_df.filter(F.col("seq") <= mid), 0)
    assert any(mor.snapshot().deltas.values())
    loc = os.path.abspath(mor.path)
    export_delta(mor)
    a0 = _read_commit(loc, 0)
    proto = next(a["protocol"] for a in a0 if "protocol" in a)
    assert proto["minReaderVersion"] == 3 and proto["minWriterVersion"] == 7
    assert "deletionVectors" in proto["readerFeatures"]
    meta = next(a["metaData"] for a in a0 if "metaData" in a)
    assert meta["configuration"]["delta.enableDeletionVectors"] == "true"
    # the mirror exposes the RESOLVED schema: no private meta columns
    names = [f["name"] for f in json.loads(meta["schemaString"])["fields"]]
    assert "_seq" not in names and "_op" not in names
    dv_adds = [
        a["add"] for a in a0 if "add" in a and a["add"].get("deletionVector")
    ]
    assert dv_adds, "live deltas must produce masked files"
    d = dv_adds[0]["deletionVector"]
    assert d["storageType"] == "u" and d["cardinality"] >= 1
    assert _sorted_rows(read_delta(spark, loc)) == _sorted_rows(mor.read())

    # incremental export: new batch supersedes more rows -> masks grow,
    # re-emitted adds carry new descriptors, state still matches
    apply_batch(mor, log_df.filter(F.col("seq") > mid), 1)
    export_delta(mor)
    assert _sorted_rows(read_delta(spark, loc)) == _sorted_rows(mor.read())

    # checkpoint + log-clean keep the DV descriptors
    checkpoint_delta(loc)
    clean_delta_log(loc)
    assert _sorted_rows(read_delta(spark, loc)) == _sorted_rows(mor.read())

    # compaction swaps the file set; the next export removes the old
    # masked files and the masks disappear (key-unique base)
    mor.compact(max_files_per_bucket=0)
    assert sync_delta(mor) is not None
    assert _sorted_rows(read_delta(spark, loc)) == _sorted_rows(mor.read())


def test_mor_eq_deletes_export_with_deletion_vectors(spark, log_df, tmp_path):
    mor = MorTable.create(
        spark, os.path.join(str(tmp_path), "m"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    cfg = PipelineConfig(delete_encoding="eq")
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(mor, log_df.filter(F.col("seq") <= mid), 0, cfg)
    apply_batch(mor, log_df.filter(F.col("seq") > mid), 1, cfg)
    assert any(mor.snapshot().eq_deletes.values())
    loc = os.path.abspath(mor.path)
    export_delta(mor)
    assert _sorted_rows(read_delta(spark, loc)) == _sorted_rows(mor.read())


def test_mor_patch_deltas_still_refuse(spark, log_df, tmp_path):
    mor = MorTable.create(
        spark, os.path.join(str(tmp_path), "m"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    apply_batch(mor, log_df, 0)
    mor.compact(max_files_per_bucket=0)
    patch = PipelineConfig(write_mode="update")
    upd = (
        log_df.limit(50)
        .withColumn("content", F.lit(None).cast("string"))
        .withColumn("seq", F.col("seq") + 10_000_000)
    )
    apply_batch(mor, upd, 1, patch)
    assert mor.snapshot().properties.get("mor_patch")
    with pytest.raises(DeltaUnexportableState, match="patch"):
        export_delta(mor)
    assert sync_delta(mor) is None  # transient: skipped, not raised


def test_branch_refuses(spark, log_df, tmp_path):
    table = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    apply_batch(table, log_df, 0)
    table.create_branch("audit")
    branch = LakeTable(spark, table.path, branch="audit")
    with pytest.raises(ValueError, match="branch"):
        export_delta(branch)


def test_schema_evolution_emits_new_metadata(spark, log_df, tmp_path):
    table = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    apply_batch(table, log_df, 0)
    export_delta(table)
    table.add_columns([StructField("stars", LongType())])
    export_delta(table)
    loc = os.path.abspath(table.path)
    a1 = _read_commit(loc, 1)
    meta = next(a["metaData"] for a in a1 if "metaData" in a)
    names = [
        f["name"] for f in json.loads(meta["schemaString"])["fields"]
    ]
    assert "stars" in names
    df = read_delta(spark, loc)
    assert "stars" in df.columns
    assert df.where(F.col("stars").isNotNull()).count() == 0
    # metaData id is stable across exports (spec: table identity)
    a0 = _read_commit(loc, 0)
    meta0 = next(a["metaData"] for a in a0 if "metaData" in a)
    assert meta0["id"] == meta["id"]


def test_rename_exports_via_column_mapping(spark, log_df, tmp_path):
    """Metadata-only rename exports through spec column mapping
    (mode=name, protocol 2/5): live files still store the retired
    physical name, the schemaString maps logical->physical, and the
    reader resolves it. The MIXED state (files on both sides of the
    rename) refuses until a rewrite homogenizes; after the rewrite the
    mapping stays enabled (spec: never disables) with physicalName
    flipped to the current name, ids stable."""
    table = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(table, log_df.filter(F.col("seq") <= mid), 0)
    table.rename_column("lang", "language")
    loc = os.path.abspath(table.path)

    # pure metadata-rename state: exports with column mapping
    path = export_delta(table)
    assert path.endswith("00000000000000000000.json")
    a0 = _read_commit(loc, 0)
    proto = next(a["protocol"] for a in a0 if "protocol" in a)
    assert proto == {"minReaderVersion": 2, "minWriterVersion": 5}
    meta = next(a["metaData"] for a in a0 if "metaData" in a)
    assert meta["configuration"]["delta.columnMapping.mode"] == "name"
    fields = {
        f["name"]: f["metadata"]
        for f in json.loads(meta["schemaString"])["fields"]
    }
    assert fields["language"]["delta.columnMapping.physicalName"] == "lang"
    assert fields["repo"]["delta.columnMapping.physicalName"] == "repo"
    ids = {m["delta.columnMapping.id"] for m in fields.values()}
    assert len(ids) == len(fields)  # unique, all stamped
    df = read_delta(spark, loc)
    assert "language" in df.columns and "lang" not in df.columns
    assert df.where(F.col("language").isNull()).count() < df.count()
    cols = ("repo", "path", "commit", "language", "content")
    assert _sorted_rows(df, cols) == _sorted_rows(table.read(), cols)

    # second batch touches ONE repo (= one bucket): its bucket rewrites
    # under the NEW name while the others keep retired-name files ->
    # the mixed-era state refuses
    one_repo = log_df.filter(F.col("seq") > mid).select("repo").first()[0]
    apply_batch(
        table,
        log_df.filter(
            (F.col("seq") > mid) & (F.col("repo") == one_repo)
        ).withColumnRenamed("lang", "language"),
        1,
    )
    with pytest.raises(DeltaUnexportableState, match="both sides"):
        export_delta(table)
    assert sync_delta(table) is None  # transient: hook skips

    # rewrite homogenizes; mapping stays on, physicalName flips forward
    table.rewrite_clustered(["repo"])
    export_delta(table)
    v1 = _current_delta_version(loc)
    _protocol, meta1, _adds, _removes, _v = _replay(loc)
    f1 = {
        f["name"]: f["metadata"]
        for f in json.loads(meta1["schemaString"])["fields"]
    }
    assert f1["language"]["delta.columnMapping.physicalName"] == "language"
    assert (
        f1["language"]["delta.columnMapping.id"]
        == fields["language"]["delta.columnMapping.id"]
    )
    assert meta1["configuration"]["delta.columnMapping.mode"] == "name"
    got = read_delta(spark, loc)
    assert _sorted_rows(got, cols) == _sorted_rows(table.read(), cols)
    # time travel to the pre-rewrite mapped version still resolves
    old = read_delta(spark, loc, version=0)
    assert "language" in old.columns
    assert old.count() > 0 and v1 >= 1

    # checkpoint under mapping: the non-empty configuration + mapped
    # schemaString survive the pyarrow map round-trip
    checkpoint_delta(loc)
    clean_delta_log(loc)
    again = read_delta(spark, loc)
    assert _sorted_rows(again, cols) == _sorted_rows(table.read(), cols)


def test_checkpoint_replay_and_log_cleanup(spark, log_df, tmp_path):
    table = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    top = log_df.agg(F.max("seq")).first()[0]
    bounds = [0] + [int(top * f) for f in (0.25, 0.5, 0.75)] + [top]
    lake_versions = []
    for i in range(4):
        batch = log_df.filter(
            (F.col("seq") > bounds[i]) & (F.col("seq") <= bounds[i + 1])
        )
        apply_batch(table, batch, i)
        lake_versions.append(table.current_version())
        export_delta(table, checkpoint_interval=0)
    loc = os.path.abspath(table.path)
    want = _sorted_rows(table.read())
    ckpt = checkpoint_delta(loc)
    assert ckpt.endswith("00000000000000000003.checkpoint.parquet")
    hint = json.load(open(os.path.join(loc, "_delta_log", "_last_checkpoint")))
    assert hint["version"] == 3
    assert _sorted_rows(read_delta(spark, loc)) == want
    # pre-checkpoint versions still replay from JSON before cleanup
    assert _sorted_rows(read_delta(spark, loc, version=0)) == _sorted_rows(
        table.read(version=lake_versions[0])
    )
    removed = clean_delta_log(loc)
    assert removed["removed_commits"] == 3
    # current read now starts AT the checkpoint
    assert _sorted_rows(read_delta(spark, loc)) == want


def test_vacuum_keeps_mirror_head_readable(spark, log_df, tmp_path):
    table = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(table, log_df.filter(F.col("seq") <= mid), 0)
    export_delta(table)
    loc = os.path.abspath(table.path)
    assert delta_pinned_versions(loc) == {table.current_version()}
    apply_batch(table, log_df.filter(F.col("seq") > mid), 1)  # mirror behind
    table.vacuum(keep_last=1)
    got = _sorted_rows(read_delta(spark, loc))
    assert got == _sorted_rows(
        table.read(version=table.current_version() - 1)
    )


def test_dv_files_reclaimed_by_log_clean(spark, log_df, tmp_path):
    """Continuous DV exports accumulate one _dv/ file per masked export;
    clean_delta_log reclaims the ones no surviving log artifact
    references, keeps every referenced one (multiple DV files can be
    live at once — unchanged masks keep their prior descriptor), honors
    the min-age guard, and reads stay exact throughout."""
    from datax_spark.lake.delta import _referenced_dv_files

    mor = MorTable.create(
        spark, os.path.join(str(tmp_path), "m"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    third = log_df.agg(F.floor(F.max("seq") / 3)).first()[0]
    parts = [
        log_df.filter(F.col("seq") <= third),
        log_df.filter((F.col("seq") > third) & (F.col("seq") <= 2 * third)),
        log_df.filter(F.col("seq") > 2 * third),
    ]
    for i, p in enumerate(parts):
        apply_batch(mor, p, i)
        export_delta(mor)
    loc = os.path.abspath(mor.path)
    dv_dir = os.path.join(loc, "_dv")
    before = set(os.listdir(dv_dir))
    assert len(before) >= 2, "each masked export writes a DV file"

    checkpoint_delta(loc)
    # min-age guard: nothing young enough gets reclaimed
    res = clean_delta_log(loc, dv_min_age_sec=3600)
    assert res["removed_dv_files"] == 0
    assert set(os.listdir(dv_dir)) == before

    res = clean_delta_log(loc)
    assert res["removed_dv_files"] >= 1
    remaining = {
        os.path.abspath(os.path.join(dv_dir, n)) for n in os.listdir(dv_dir)
    }
    assert remaining, "the current masks' DV file(s) survive"
    assert remaining <= _referenced_dv_files(loc)
    assert _sorted_rows(read_delta(spark, loc)) == _sorted_rows(mor.read())


def test_dv_mask_job_plan_shape(spark, log_df, tmp_path):
    """The DV mask computation must stay shaped for 100 TB: exactly two
    hash exchanges — the key window over the base+delta scan and the
    eq-delete keys' partial-aggregated max-seq (delta-sized) — with the
    dmax join BROADCAST, no sort-merge join, and a key-projected scan
    that never reads the payload columns."""
    from datax_spark.lake.delta import _dead_rows_frame

    mor = MorTable.create(
        spark, os.path.join(str(tmp_path), "m"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    cfg = PipelineConfig(delete_encoding="eq")
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(mor, log_df.filter(F.col("seq") <= mid), 0, cfg)
    apply_batch(mor, log_df.filter(F.col("seq") > mid), 1, cfg)
    assert any(mor.snapshot().deltas.values())
    assert any(mor.snapshot().eq_deletes.values())
    dead = _dead_rows_frame(mor, mor.snapshot())
    dead.collect()  # let AQE finalize the executed plan
    plan = dead._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 2
    assert "SortMergeJoin" not in final
    assert "BroadcastHashJoin" in final
    assert "partial_max" in final, "delete keys must combine map-side"
    assert "content" not in final, "payload columns must not be scanned"


def test_dv_export_is_incremental_per_changed_bucket(
    spark, log_df, tmp_path
):
    """The second DV export recomputes masks ONLY for buckets whose
    file lists changed: the new commit's DV-bearing add actions all
    reference changed buckets' files, unchanged buckets keep their
    prior descriptors, and the read stays exact."""
    import urllib.parse

    from datax_spark.lake.delta import _changed_buckets

    mor = MorTable.create(
        spark, os.path.join(str(tmp_path), "m"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(mor, log_df.filter(F.col("seq") <= mid), 0)
    export_delta(mor)
    snap1 = mor.snapshot()
    one_repo = (
        log_df.filter((F.col("seq") > mid) & F.col("repo").isNotNull())
        .select("repo").distinct().orderBy("repo").first()[0]
    )
    apply_batch(
        mor,
        log_df.filter((F.col("seq") > mid) & (F.col("repo") == one_repo)),
        1,
    )
    snap2 = mor.snapshot()
    changed = _changed_buckets(snap2, snap1)
    assert changed is not None and 0 < len(changed) < 4
    export_delta(mor)

    loc = os.path.abspath(mor.path)
    changed_rels = set()
    for b in changed:
        changed_rels.update(snap2.buckets.get(str(b), []))
        changed_rels.update(snap2.deltas.get(str(b), []))
    dv_rels = {
        urllib.parse.unquote(a["add"]["path"])
        for a in _read_commit(loc, 1)
        if "add" in a and a["add"].get("deletionVector")
    }
    assert dv_rels and dv_rels <= changed_rels
    assert _sorted_rows(read_delta(spark, loc)) == _sorted_rows(mor.read())


def test_change_data_feed_roundtrip(spark, log_df, tmp_path):
    """Spec CDF: sync_delta(change_data=True) writes _change_data files
    + cdc actions per post-bootstrap commit; read_delta_changes equals
    LakeTable.read_changes value-for-value, the bootstrap commit
    derives inserts from its adds (the spec's append-only fallback),
    metaData carries delta.enableChangeDataFeed, and cdc actions mark
    dataChange=false."""
    from datax_spark.lake.delta import read_delta_changes

    table = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    cfg = PipelineConfig(
        on_commit=[lambda m: sync_delta(table, change_data=True)]
    )
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(table, log_df.filter(F.col("seq") <= mid), 0, cfg)
    v1 = table.current_version()
    apply_batch(table, log_df.filter(F.col("seq") > mid), 1, cfg)
    loc = os.path.abspath(table.path)

    def chrows(df):
        return sorted(
            tuple(r)
            for r in df.select(
                "repo", "path", "commit", "content", "_change_type"
            ).collect()
        )

    assert chrows(
        read_delta_changes(spark, loc, from_lake_version=v1)
    ) == chrows(table.read_changes(v1))
    # bootstrap: version 0 derives inserts from add actions
    boot = chrows(read_delta_changes(spark, loc, to_version=0))
    want0 = sorted(
        tuple(r) + ("insert",)
        for r in table.read(version=v1)
        .select("repo", "path", "commit", "content")
        .collect()
    )
    assert boot == want0
    a1 = _read_commit(loc, 1)
    cdcs = [a["cdc"] for a in a1 if "cdc" in a]
    assert cdcs and all(c["dataChange"] is False for c in cdcs)
    assert all(c["path"].startswith("_change_data/") for c in cdcs)
    meta = next(
        a["metaData"] for a in _read_commit(loc, 0) if "metaData" in a
    )
    assert meta["configuration"]["delta.enableChangeDataFeed"] == "true"


def test_change_data_feed_on_mor_dv_table(spark, log_df, tmp_path):
    """CDF composes with the deletion-vector mirror: a live MOR stream
    syncing with change_data=True produces both DV-masked state AND a
    change feed, each matching the engine's own."""
    from datax_spark.lake.delta import read_delta_changes

    mor = MorTable.create(
        spark, os.path.join(str(tmp_path), "m"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    cfg = PipelineConfig(
        on_commit=[lambda m: sync_delta(mor, change_data=True)]
    )
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(mor, log_df.filter(F.col("seq") <= mid), 0, cfg)
    v1 = mor.current_version()
    apply_batch(mor, log_df.filter(F.col("seq") > mid), 1, cfg)
    loc = os.path.abspath(mor.path)

    def chrows(df):
        return sorted(
            tuple(r)
            for r in df.select(
                "repo", "path", "commit", "content", "_change_type"
            ).collect()
        )

    assert chrows(
        read_delta_changes(spark, loc, from_lake_version=v1)
    ) == chrows(mor.read_changes(v1))
    assert _sorted_rows(read_delta(spark, loc)) == _sorted_rows(mor.read())


def test_cdf_files_reclaimed_and_range_bounded_by_retention(
    spark, log_df, tmp_path
):
    """Cleaning commits below a checkpoint reclaims their change-data
    files and bounds read_delta_changes to log retention (real Delta's
    table_changes contract); the surviving range still reads."""
    from datax_spark.lake.delta import read_delta_changes

    table = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    cfg = PipelineConfig(
        on_commit=[lambda m: sync_delta(table, change_data=True)]
    )
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(table, log_df.filter(F.col("seq") <= mid), 0, cfg)
    apply_batch(table, log_df.filter(F.col("seq") > mid), 1, cfg)
    upd = (
        log_df.filter(F.col("seq") > mid).limit(200)
        .withColumn("seq", F.col("seq") + 10_000_000)
    )
    apply_batch(table, upd, 2, cfg)
    loc = os.path.abspath(table.path)
    checkpoint_delta(loc)
    res = clean_delta_log(loc)
    assert res["removed_commits"] >= 2 and res["removed_cdf_files"] >= 1
    with pytest.raises(ValueError, match="cleaned below"):
        read_delta_changes(spark, loc, to_version=1)
    assert read_delta_changes(spark, loc, from_version=1).count() > 0


def test_delta_cdf_relay_converges_exactly_once(spark, log_df, tmp_path):
    """The inverse leg: lake A -> CDF-enabled Delta mirror ->
    apply_delta_changes -> lake B. B converges on A after the seed and
    after an incremental commit; re-running is a no-op (the destination
    fence IS the cursor — no external checkpoint); a MOR source with
    deletion vectors relays the same way."""
    from datax_spark.lake.delta import apply_delta_changes

    def rows(t):
        return _sorted_rows(t.read())

    a = LakeTable.create(
        spark, os.path.join(str(tmp_path), "a"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    cfg = PipelineConfig(
        on_commit=[lambda m: sync_delta(a, change_data=True)]
    )
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(a, log_df.filter(F.col("seq") <= mid), 0, cfg)

    b = LakeTable.create(
        spark, os.path.join(str(tmp_path), "b"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    m1 = apply_delta_changes(spark, b, a.path)
    assert [m.applied for m in m1] == [True]
    assert rows(b) == rows(a)

    apply_batch(a, log_df.filter(F.col("seq") > mid), 1, cfg)
    m2 = apply_delta_changes(spark, b, a.path)
    assert [m.batch_id for m in m2] == [1] and m2[0].applied
    assert rows(b) == rows(a)
    assert apply_delta_changes(spark, b, a.path) == []  # in sync

    # MOR source: DV-masked state + CDF relays identically
    ma = MorTable.create(
        spark, os.path.join(str(tmp_path), "ma"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    mcfg = PipelineConfig(
        on_commit=[lambda m: sync_delta(ma, change_data=True)]
    )
    apply_batch(ma, log_df.filter(F.col("seq") <= mid), 0, mcfg)
    apply_batch(ma, log_df.filter(F.col("seq") > mid), 1, mcfg)
    mb = LakeTable.create(
        spark, os.path.join(str(tmp_path), "mb"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    ms = apply_delta_changes(spark, mb, ma.path)
    assert [m.applied for m in ms] == [True, True]
    assert rows(mb) == rows(ma)


def test_uniform_both_mirrors_on_one_table(spark, log_df, tmp_path):
    """The UniForm pattern: ONE MOR table continuously mirrored as BOTH
    open formats in the same stream (sync_iceberg with position deletes
    + sync_delta with DVs and CDF) — external Iceberg and Delta readers
    and the engine all see the same rows at every commit."""
    from datax_spark.lake.delta import read_delta_changes
    from datax_spark.lake.iceberg import read_iceberg, sync_iceberg

    mor = MorTable.create(
        spark, os.path.join(str(tmp_path), "m"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    cfg = PipelineConfig(
        on_commit=[
            lambda m: sync_iceberg(mor, delete_files="pos"),
            lambda m: sync_delta(mor, change_data=True),
        ]
    )
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(mor, log_df.filter(F.col("seq") <= mid), 0, cfg)
    v1 = mor.current_version()
    apply_batch(mor, log_df.filter(F.col("seq") > mid), 1, cfg)
    loc = os.path.abspath(mor.path)
    want = _sorted_rows(mor.read())
    assert _sorted_rows(read_iceberg(spark, loc)) == want
    assert _sorted_rows(read_delta(spark, loc)) == want
    # time travel agrees across formats too
    want1 = _sorted_rows(mor.read(version=v1))
    assert _sorted_rows(read_iceberg(spark, loc, snapshot_id=v1)) == want1
    assert _sorted_rows(read_delta(spark, loc, lake_version=v1)) == want1
    # and the Delta CDF matches the engine's own feed
    got = sorted(
        tuple(r)
        for r in read_delta_changes(spark, loc, from_lake_version=v1)
        .select("repo", "path", "commit", "content", "_change_type")
        .collect()
    )
    want_chg = sorted(
        tuple(r)
        for r in mor.read_changes(v1)
        .select("repo", "path", "commit", "content", "_change_type")
        .collect()
    )
    assert got == want_chg


def test_read_delta_prunes_files_by_stats(spark, tmp_path):
    """filters= on read_delta: add-action stats JSON (minValues/
    maxValues) skips files at plan time and the filtered read equals
    the unpruned read + filter exactly."""
    from pyspark.sql.types import LongType
    from datax_spark.lake.delta import (
        _replay,
        _stats_may_match,
        read_delta,
        sync_delta,
    )

    schema = StructType([
        StructField("repo", StringType()),
        StructField("seq", LongType()),
        StructField("content", StringType()),
    ])
    t = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t"), schema, ["repo"],
        "repo", num_buckets=4, stats_cols=["seq"],
    )
    for i in range(4):
        rows = spark.range(i * 100, (i + 1) * 100).select(
            F.concat(F.lit("r"), F.col("id")).alias("repo"),
            F.col("id").alias("seq"),
            F.concat(F.lit("c"), F.col("id")).alias("content"),
        )
        t.append_insert_only(rows, batch_id=i)
        sync_delta(t)
    loc = os.path.abspath(t.path)

    _p, _m, adds, _r, _v = _replay(loc, None)
    filters = [("seq", ">=", 300)]
    kept = [
        p for p, a in adds.items()
        if _stats_may_match(a.get("stats"), filters, {})
    ]
    assert 0 < len(kept) < len(adds)
    assert len(kept) <= len(adds) // 4 + 1  # one century per commit

    got = sorted(
        r["seq"] for r in read_delta(spark, loc, filters=filters).collect()
    )
    assert got == list(range(300, 400))
    got2 = read_delta(
        spark, loc, filters=[("seq", "<", 100), ("repo", "=", "r42")]
    ).collect()
    assert [(r["repo"], r["seq"]) for r in got2] == [("r42", 42)]
    # empty result when every file is pruned
    assert read_delta(
        spark, loc, filters=[("seq", ">", 10_000)]
    ).count() == 0
    with pytest.raises(ValueError, match="unsupported filter op"):
        read_delta(spark, loc, filters=[("seq", "!=", 1)]).collect()


def test_delta_history_describes_commits(spark, tmp_path):
    """DESCRIBE HISTORY over the mirror: one row per surviving commit,
    newest first, with the lakeVersion mapping and action counts; a
    cleaned log truncates history at the checkpoint."""
    from pyspark.sql.types import LongType
    from datax_spark.lake.delta import (
        checkpoint_delta,
        clean_delta_log,
        delta_history,
        sync_delta,
    )

    schema = StructType([
        StructField("repo", StringType()),
        StructField("seq", LongType()),
        StructField("content", StringType()),
    ])
    t = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t"), schema, ["repo"],
        "repo", num_buckets=4,
    )
    for i in range(3):
        rows = spark.range(i * 10, (i + 1) * 10).select(
            F.concat(F.lit("r"), F.col("id")).alias("repo"),
            F.col("id").alias("seq"),
            F.lit("c").alias("content"),
        )
        t.append_insert_only(rows, batch_id=i)
        sync_delta(t)
    loc = os.path.abspath(t.path)
    h = delta_history(spark, loc).collect()
    assert [r["version"] for r in h] == [2, 1, 0]
    assert [r["lakeVersion"] for r in h] == [
        t.current_version(), t.current_version() - 1,
        t.current_version() - 2,
    ]
    assert all(r["operation"] == "WRITE" for r in h)
    assert all(r["numAddedFiles"] > 0 for r in h)
    assert h[0]["timestamp"] is not None
    assert h[0]["operationParameters"] == {"mode": "Append"}

    checkpoint_delta(loc)
    clean_delta_log(loc)
    h2 = delta_history(spark, loc).collect()
    assert [r["version"] for r in h2] == [2]  # truncated at checkpoint


def test_stats_prune_fails_open_on_incomparable_types():
    """ADVICE r4: a type-mismatched clause (numeric filter vs
    string-encoded stats) must keep the file, not raise TypeError at
    plan time — the residual Spark predicate casts row-level."""
    import json as _json

    from datax_spark.lake.delta import _stats_may_match
    from datax_spark.lake.iceberg import _file_may_match

    stats = _json.dumps(
        {"minValues": {"k": "10"}, "maxValues": {"k": "99"}}
    )
    assert _stats_may_match(stats, [("k", ">=", 50)], {}) is True
    # comparable clauses still prune alongside an incomparable one
    stats2 = _json.dumps(
        {"minValues": {"k": "10", "n": 1}, "maxValues": {"k": "99", "n": 5}}
    )
    assert (
        _stats_may_match(stats2, [("k", "=", 7), ("n", ">", 5)], {}) is False
    )
    assert _file_may_match({3: ("10", "99")}, [("k", ">=", 50)], {"k": 3})
    assert not _file_may_match(
        {3: ("10", "99"), 4: (1, 5)},
        [("k", "=", 7), ("n", ">", 5)],
        {"k": 3, "n": 4},
    )


def test_incremental_masks_equal_full_recompute(spark, tmp_path):
    """A small append-only commit masks INCREMENTALLY (prior DV ∪
    newly-dead over the appended keys) — the result must be
    BYTE-identical to the full dead-rows recompute, across several
    batches (masks grow), a delete, and an eq-delete. Monotonicity is
    the invariant: under append-only commits a dead row never revives."""
    import datax_spark.lake.delta as D

    schema = StructType(
        [StructField(c, StringType()) for c in
         ["repo", "path", "commit", "lang", "content"]]
    )
    t = MorTable.create(
        spark, os.path.join(str(tmp_path), "t"), schema,
        ["repo", "path", "commit"], "repo", num_buckets=4,
    )
    base = spark.range(0, 3000).select(
        F.concat(F.lit("r"), F.col("id")).alias("repo"),
        F.lit("p").alias("path"), F.lit("c").alias("commit"),
        F.lit("py").alias("lang"),
        F.concat(F.lit("b"), F.col("id"), F.lit("y" * 100)).alias("content"),
        F.lit("insert").alias("op"), F.col("id").alias("seq"),
    )
    apply_batch(t, base, 0)
    t.compact(max_files_per_bucket=0)
    sync_delta(t)  # bootstrap export (clean, no masks)

    spans_incremental = []
    orig_inc = D._mor_file_masks_incremental

    def spy(table, snap, buckets, keys, prior_adds, location):
        out = orig_inc(table, snap, buckets, keys, prior_adds, location)
        spans_incremental.append(snap.version)
        return out

    def batch(rows, bid, enc="inline"):
        ev = spark.createDataFrame(
            rows, "repo string, path string, commit string, lang string, "
                  "content string, op string, seq long")
        apply_batch(t, ev, bid, PipelineConfig(delete_encoding=enc))

    D._mor_file_masks_incremental = spy
    try:
        batch([("r7", "p", "c", "py", "A2", "update", 10_000),
               ("r9", "p", "c", None, None, "delete", 10_001)], 1)
        sync_delta(t)
        batch([("r7", "p", "c", "py", "A3", "update", 20_000),
               ("r500", "p", "c", "py", "B1", "update", 20_001)], 2)
        sync_delta(t)
        batch([("r11", "p", "c", None, None, "delete", 30_000)], 3, "eq")
        sync_delta(t)
    finally:
        D._mor_file_masks_incremental = orig_inc
    assert len(spans_incremental) == 3  # every span took the fast path

    # byte-identical to the full recompute of the CURRENT state
    snap = t.snapshot()
    prior = t.snapshot(snap.version)  # self; changed = all masked buckets
    full = D._mor_file_masks(t, snap, None)
    _protocol, _meta, adds, _removes, _v = D._replay(
        os.path.abspath(t.path)
    )
    import urllib.parse
    got = {}
    for enc, a in adds.items():
        if a.get("deletionVector"):
            rel = urllib.parse.unquote(enc)
            pos = D._read_dv_positions(
                os.path.abspath(t.path), a["deletionVector"]
            )
            got[rel] = (sorted(pos), a["deletionVector"]["cardinality"])
    want = {
        rel: (sorted(D.deserialize_dv(dv)), card)
        for rel, (dv, card) in full.items()
    }
    assert got == want
    # and the mirror still reads back exactly the resolved state
    assert sorted(
        r["repo"] for r in read_delta(spark, t.path).select("repo").collect()
    ) == sorted(r["repo"] for r in t.read().select("repo").collect())
