"""Apache Iceberg v2 metadata export / import (lake/iceberg.py).

The interop claims verified here:

- round trip: ``read_iceberg`` reconstructs the table from the Iceberg
  metadata ALONE (the lake's own manifests are never consulted) and
  matches ``table.read()`` value-for-value, including per-snapshot time
  travel across incremental exports;
- the Avro manifest files written by the pure-Python codec are read
  back by the **Java Avro reference implementation** on Spark's
  classpath (org.apache.avro DataFileReader via py4j) — the same
  library real Iceberg readers link against;
- metadata.json carries every spec-required v2 field, stable field ids
  across schema evolution, and the name-mapping escape hatch for
  parquet files without field ids (renamed columns resolve through it).
"""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from datax_spark.lake.iceberg import (
    _load_metadata,
    export_iceberg,
    iceberg_plan,
    read_iceberg,
)
from datax_spark.lake.mor import MorTable
from datax_spark.lake.table import LakeTable
from datax_spark.sources.changelog import generate_changelog
from datax_spark.streaming.pipeline import apply_batch

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
    root = str(tmp_path_factory.mktemp("iceberg_cow"))
    table = LakeTable.create(
        spark, os.path.join(root, "t"), SCHEMA, KEYS, "repo", num_buckets=4
    )
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(table, log_df.filter(F.col("seq") <= mid), 0)
    v1 = table.current_version()
    meta1 = export_iceberg(table)
    apply_batch(table, log_df.filter(F.col("seq") > mid), 1)
    meta2 = export_iceberg(table)
    return {
        "table": table,
        "v_first": v1,
        "meta1": meta1,
        "meta2": meta2,
        "location": os.path.abspath(table.path),
    }


def test_round_trip_current_snapshot(spark, exported):
    table = exported["table"]
    got = _sorted_rows(read_iceberg(spark, exported["location"]))
    want = _sorted_rows(table.read())
    assert len(want) > 0
    assert got == want


def test_round_trip_previous_snapshot(spark, exported):
    """Iceberg snapshot ids are lake versions: reading the first export's
    snapshot id equals lake time travel to that version."""
    table = exported["table"]
    snap_id = exported["v_first"]
    got = _sorted_rows(read_iceberg(spark, exported["location"], snap_id))
    want = _sorted_rows(table.read(version=exported["v_first"]))
    assert got == want
    assert got != _sorted_rows(table.read())  # batch 2 changed state


def test_metadata_json_spec_fields(exported):
    meta = _load_metadata(exported["location"])
    required = [
        "format-version", "table-uuid", "location", "last-sequence-number",
        "last-updated-ms", "last-column-id", "current-schema-id", "schemas",
        "default-spec-id", "partition-specs", "last-partition-id",
        "default-sort-order-id", "sort-orders", "properties",
        "current-snapshot-id", "snapshots", "snapshot-log", "metadata-log",
    ]
    for k in required:
        assert k in meta, f"metadata.json missing spec field {k}"
    assert meta["format-version"] == 2
    assert len(meta["snapshots"]) == 2
    assert meta["current-snapshot-id"] == meta["snapshots"][-1]["snapshot-id"]
    # the escape hatch for parquet files without field ids
    mapping = json.loads(meta["properties"]["schema.name-mapping.default"])
    assert {m["names"][0] for m in mapping} == {
        "repo", "path", "commit", "lang", "content"
    }
    # second export logs the first metadata file
    assert len(meta["metadata-log"]) == 1
    # table-uuid stable across exports
    meta1 = json.load(open(exported["meta1"]))
    assert meta1["table-uuid"] == meta["table-uuid"]
    # version hint advanced
    hint = os.path.join(exported["location"], "metadata", "version-hint.text")
    assert open(hint).read().strip() == "2"


def test_incremental_export_reuses_existing_files(exported):
    """Second export's manifest: batch-2-touched buckets' files are ADDED
    under the new snapshot; untouched buckets ride along as EXISTING
    entries keeping their ORIGINAL snapshot id and sequence number."""
    from datax_spark.sources.avro_codec import read_container

    meta = _load_metadata(exported["location"])
    snap2 = meta["snapshots"][-1]
    _, manifests = read_container(snap2["manifest-list"])
    assert len(manifests) == 1
    m = manifests[0]
    _, entries = read_container(m["manifest_path"])
    added = [e for e in entries if e["status"] == 1]
    existing = [e for e in entries if e["status"] == 0]
    assert m["added_files_count"] == len(added)
    assert m["existing_files_count"] == len(existing)
    assert all(e["snapshot_id"] == snap2["snapshot-id"] for e in added)
    first_id = meta["snapshots"][0]["snapshot-id"]
    for e in existing:
        assert e["snapshot_id"] == first_id
        assert e["sequence_number"] == meta["snapshots"][0]["sequence-number"]
    # sequence numbers are monotone and last-sequence-number caps them
    assert snap2["sequence-number"] > first_id or snap2[
        "sequence-number"
    ] >= meta["snapshots"][0]["sequence-number"]
    assert meta["last-sequence-number"] == snap2["sequence-number"]


def test_java_avro_reads_our_manifests(spark, exported):
    """Cross-implementation check: the Java Avro library that ships on
    Spark's classpath (the one real Iceberg readers use) must parse the
    pure-Python-written manifest list AND manifest, and agree on paths,
    counts and nested data_file fields."""
    from datax_spark.sources.avro_codec import read_container

    meta = _load_metadata(exported["location"])
    snap = meta["snapshots"][-1]
    jvm = spark._jvm

    def java_read(path):
        reader = jvm.org.apache.avro.generic.GenericDatumReader()
        dfr = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(path), reader
        )
        out = []
        while dfr.hasNext():
            out.append(dfr.next())
        dfr.close()
        return out

    # manifest list
    jrecs = java_read(snap["manifest-list"])
    _, precs = read_container(snap["manifest-list"])
    assert len(jrecs) == len(precs) == 1
    jm, pm = jrecs[0], precs[0]
    assert str(jm.get("manifest_path")) == pm["manifest_path"]
    assert jm.get("manifest_length") == pm["manifest_length"]
    assert jm.get("added_files_count") == pm["added_files_count"]
    assert jm.get("added_rows_count") == pm["added_rows_count"]
    # manifest entries, incl. the nested data_file record
    jents = java_read(pm["manifest_path"])
    _, pents = read_container(pm["manifest_path"])
    assert len(jents) == len(pents) > 0
    jpaths = sorted(str(e.get("data_file").get("file_path")) for e in jents)
    ppaths = sorted(e["data_file"]["file_path"] for e in pents)
    assert jpaths == ppaths
    jrows = sum(e.get("data_file").get("record_count") for e in jents)
    prows = sum(e["data_file"]["record_count"] for e in pents)
    assert jrows == prows
    # file_sizes agree with the filesystem
    for e in pents:
        df = e["data_file"]
        assert os.path.getsize(df["file_path"]) == df["file_size_in_bytes"]


def test_plan_rows_match_table(spark, exported):
    plan = iceberg_plan(exported["location"])
    assert plan["total_rows"] == exported["table"].read().count()
    assert all(os.path.isabs(p) for p in plan["files"])


def test_reexport_same_version_refused(exported):
    with pytest.raises(ValueError, match="already exported"):
        export_iceberg(exported["table"])


def test_mor_requires_compaction(spark, log_df, tmp_path):
    mor = MorTable.create(
        spark, os.path.join(str(tmp_path), "m"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(mor, log_df.filter(F.col("seq") <= mid), 0)
    apply_batch(mor, log_df.filter(F.col("seq") > mid), 1)
    if any(v for v in mor.snapshot().deltas.values()):
        with pytest.raises(ValueError, match="compact"):
            export_iceberg(mor)
    mor.compact()
    export_iceberg(mor)
    got = _sorted_rows(read_iceberg(spark, os.path.abspath(mor.path)))
    want = _sorted_rows(mor.read())
    assert got == want and len(want) > 0


def test_schema_evolution_keeps_field_ids(spark, tmp_path):
    """Additive DDL between exports: existing columns keep their Iceberg
    field ids, the new column allocates past last-column-id, and the new
    snapshot reads old files with nulls in the new column."""
    t = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA, KEYS, "repo",
        num_buckets=2,
    )
    df = spark.createDataFrame(
        [("r1", "p", "c", "py", "x", "insert", 1)],
        "repo string, path string, commit string, lang string, "
        "content string, op string, seq long",
    )
    apply_batch(t, df, 0)
    export_iceberg(t)
    ids1 = {
        f["name"]: f["id"]
        for f in _load_metadata(t.path)["schemas"][-1]["fields"]
    }
    t.add_columns(StructType([StructField("stars", LongType())]))
    df2 = spark.createDataFrame(
        [("r2", "p", "c", "py", "y", 7, "insert", 2)],
        "repo string, path string, commit string, lang string, "
        "content string, stars long, op string, seq long",
    )
    apply_batch(t, df2, 1)
    export_iceberg(t)
    meta = _load_metadata(t.path)
    schema2 = next(
        s for s in meta["schemas"] if s["schema-id"] == meta["current-schema-id"]
    )
    ids2 = {f["name"]: f["id"] for f in schema2["fields"]}
    for name, fid in ids1.items():
        assert ids2[name] == fid, f"field id of {name} drifted"
    assert ids2["stars"] > max(ids1.values())
    assert len(meta["schemas"]) == 2  # old schema retained for old snapshot
    got = read_iceberg(spark, os.path.abspath(t.path))
    rows = {r["repo"]: r["stars"] for r in got.collect()}
    assert rows == {"r1": None, "r2": 7}


def test_rename_resolves_through_name_mapping(spark, tmp_path):
    """rename_column between exports: the renamed field keeps its id,
    the name mapping lists the retired physical name, and read_iceberg
    resolves OLD files (bytes under the retired name) into the current
    column — the exact case the spec's name mapping exists for."""
    t = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA, KEYS, "repo",
        num_buckets=2,
    )
    df = spark.createDataFrame(
        [("r1", "p", "c", "py", "old-bytes", "insert", 1)],
        "repo string, path string, commit string, lang string, "
        "content string, op string, seq long",
    )
    apply_batch(t, df, 0)
    export_iceberg(t)
    ids1 = {
        f["name"]: f["id"]
        for f in _load_metadata(t.path)["schemas"][-1]["fields"]
    }
    t.rename_column("content", "body")
    df2 = spark.createDataFrame(
        [("r2", "p", "c", "py", "new-bytes", "insert", 2)],
        "repo string, path string, commit string, lang string, "
        "body string, op string, seq long",
    )
    apply_batch(t, df2, 1)
    export_iceberg(t)
    meta = _load_metadata(t.path)
    schema2 = next(
        s for s in meta["schemas"] if s["schema-id"] == meta["current-schema-id"]
    )
    ids2 = {f["name"]: f["id"] for f in schema2["fields"]}
    assert ids2["body"] == ids1["content"]  # rename keeps the field id
    mapping = json.loads(meta["properties"]["schema.name-mapping.default"])
    body_entry = next(m for m in mapping if m["names"][0] == "body")
    assert "content" in body_entry["names"]
    got = {
        r["repo"]: r["body"]
        for r in read_iceberg(spark, os.path.abspath(t.path)).collect()
    }
    assert got == {"r1": "old-bytes", "r2": "new-bytes"}


def test_sync_hook_publishes_each_committed_batch(spark, log_df, tmp_path):
    """sync_iceberg as an on_commit hook: every committed batch lands as
    an Iceberg snapshot; fenced replays (which never fire hooks) and
    already-synced states add nothing."""
    from datax_spark.lake.iceberg import sync_iceberg
    from datax_spark.streaming.pipeline import PipelineConfig

    table = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    cfg = PipelineConfig(on_commit=[lambda m: sync_iceberg(table)])
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(table, log_df.filter(F.col("seq") <= mid), 0, cfg)
    apply_batch(table, log_df.filter(F.col("seq") > mid), 1, cfg)
    meta = _load_metadata(table.path)
    assert len(meta["snapshots"]) == 2
    # fenced replay: hook never fires, metadata unchanged
    apply_batch(table, log_df.filter(F.col("seq") > mid), 1, cfg)
    assert len(_load_metadata(table.path)["snapshots"]) == 2
    # already in sync -> no-op
    assert sync_iceberg(table) is None
    got = _sorted_rows(read_iceberg(spark, os.path.abspath(table.path)))
    assert got == _sorted_rows(table.read())


def test_sync_skips_inline_tombstone_mor_state(spark, log_df, tmp_path):
    """delete_encoding='inline' leaves full-width tombstone rows in the
    deltas — not expressible as Iceberg data, so sync skips until
    compaction folds them."""
    from datax_spark.lake.iceberg import (
        IcebergUnexportableState,
        sync_iceberg,
    )

    mor = MorTable.create(
        spark, os.path.join(str(tmp_path), "m"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    apply_batch(mor, log_df, 0)
    assert any(v for v in mor.snapshot().deltas.values())
    with pytest.raises(IcebergUnexportableState, match="inline tombstone"):
        export_iceberg(mor)
    assert sync_iceberg(mor) is None  # the hook form skips, not crashes
    # threshold 0 folds every bucket (the first apply leaves exactly one
    # delta file per bucket, below the default fragmentation threshold)
    mor.compact(max_files_per_bucket=0)
    assert not any(v for v in mor.snapshot().deltas.values())
    assert sync_iceberg(mor) is not None  # catches up post-compaction
    got = _sorted_rows(read_iceberg(spark, os.path.abspath(mor.path)))
    assert got == _sorted_rows(mor.read())


def test_live_eq_mor_exports_without_compaction(spark, log_df, tmp_path):
    """The north-star loop: a delete_encoding='eq' MOR table with LIVE
    deltas and equality-delete files exports as Iceberg v2 equality
    deletes, and the Iceberg read (file-sequence rule) equals the
    engine's resolved row-seq read exactly."""
    from datax_spark.streaming.pipeline import PipelineConfig

    mor = MorTable.create(
        spark, os.path.join(str(tmp_path), "m"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    cfg = PipelineConfig(delete_encoding="eq")
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(mor, log_df.filter(F.col("seq") <= mid), 0, cfg)
    apply_batch(mor, log_df.filter(F.col("seq") > mid), 1, cfg)
    snap = mor.snapshot()
    assert any(v for v in snap.deltas.values())
    assert any(v for v in snap.eq_deletes.values())

    export_iceberg(mor)
    meta = _load_metadata(mor.path)
    s = meta["snapshots"][-1]
    assert int(s["summary"]["total-delete-files"]) > 0
    assert int(s["summary"]["total-equality-deletes"]) > 0
    got = _sorted_rows(read_iceberg(spark, os.path.abspath(mor.path)))
    assert got == _sorted_rows(mor.read())
    assert len(got) > 0


def test_live_eq_mor_incremental_sync_and_time_travel(
    spark, log_df, tmp_path
):
    """sync_iceberg per commit on a live eq-MOR stream: every batch
    lands as a snapshot, and Iceberg time travel to the mid-stream
    snapshot equals the lake's own version read."""
    from datax_spark.lake.iceberg import sync_iceberg
    from datax_spark.streaming.pipeline import PipelineConfig

    mor = MorTable.create(
        spark, os.path.join(str(tmp_path), "m"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    cfg = PipelineConfig(
        delete_encoding="eq", on_commit=[lambda m: sync_iceberg(mor)]
    )
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(mor, log_df.filter(F.col("seq") <= mid), 0, cfg)
    v1 = mor.current_version()
    apply_batch(mor, log_df.filter(F.col("seq") > mid), 1, cfg)
    meta = _load_metadata(mor.path)
    assert [s["snapshot-id"] for s in meta["snapshots"]] == [
        v1, mor.current_version()
    ]
    loc = os.path.abspath(mor.path)
    assert _sorted_rows(read_iceberg(spark, loc)) == _sorted_rows(mor.read())
    assert _sorted_rows(read_iceberg(spark, loc, snapshot_id=v1)) == (
        _sorted_rows(mor.read(version=v1))
    )


def test_eq_mor_bulk_then_stream_exports(spark, log_df, tmp_path):
    """bulk_load (NULL-_seq rows) followed by an eq-encoded stream:
    the bulk base PREDATES every delete, so the engine's any-delete
    rule and Iceberg's file-sequence rule agree and the export
    round-trips. (NULL-_seq rows NEWER than a live delete are
    unreachable through the public API — bulk_load replaces all
    buckets, clearing deletes — and _check_no_null_seq_after guards
    the invariant for any future write path.)"""
    from datax_spark.streaming.pipeline import PipelineConfig

    mor = MorTable.create(
        spark, os.path.join(str(tmp_path), "m"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    seed = log_df.filter(F.col("op") != "d").select(
        *[c for c in SCHEMA.fieldNames()]
    ).dropDuplicates(KEYS)
    mor.bulk_load(seed, mode="truncate")
    apply_batch(mor, log_df, 0, PipelineConfig(delete_encoding="eq"))
    assert any(v for v in mor.snapshot().eq_deletes.values())
    export_iceberg(mor)
    got = _sorted_rows(read_iceberg(spark, os.path.abspath(mor.path)))
    assert got == _sorted_rows(mor.read())


def test_delete_aware_read_plan_never_shuffles_data(
    spark, log_df, tmp_path
):
    """Physical-plan pin for the equality-delete read: the (100-TB)
    data side rides two BROADCAST joins (path->seq map, per-key max
    delete); the only Exchange hashpartitioning is the delete-file
    aggregation — delete-sized, never table-sized. No sort-merge join
    anywhere."""
    from datax_spark.streaming.pipeline import PipelineConfig

    mor = MorTable.create(
        spark, os.path.join(str(tmp_path), "m"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    cfg = PipelineConfig(delete_encoding="eq")
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(mor, log_df.filter(F.col("seq") <= mid), 0, cfg)
    apply_batch(mor, log_df.filter(F.col("seq") > mid), 1, cfg)
    export_iceberg(mor)
    df = read_iceberg(spark, os.path.abspath(mor.path))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan
    exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
    ]
    assert len(exchanges) <= 1, plan


def test_eq_mor_export_refuses_vacuumed_lineage(spark, log_df, tmp_path):
    """With live deltas, per-file sequence numbers need witnessed add
    versions; vacuuming the early manifests away must refuse the
    export (a mis-stamped file could wrongly out-sequence a delete)."""
    from datax_spark.lake.iceberg import (
        IcebergUnexportableState,
        sync_iceberg,
    )
    from datax_spark.streaming.pipeline import PipelineConfig

    mor = MorTable.create(
        spark, os.path.join(str(tmp_path), "m"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    cfg = PipelineConfig(delete_encoding="eq")
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(mor, log_df.filter(F.col("seq") <= mid), 0, cfg)
    apply_batch(mor, log_df.filter(F.col("seq") > mid), 1, cfg)
    mor.vacuum(keep_last=1)
    with pytest.raises(IcebergUnexportableState, match="vacuumed lineage"):
        export_iceberg(mor)
    assert sync_iceberg(mor) is None


def test_expire_drops_old_snapshots_and_their_avro(spark, log_df, tmp_path):
    """expire_iceberg keeps the newest N snapshots, removes the expired
    ones' manifest/manifest-list files, and leaves the current read and
    retained time travel intact."""
    from datax_spark.lake.iceberg import expire_iceberg, sync_iceberg
    from datax_spark.streaming.pipeline import PipelineConfig

    table = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    cfg = PipelineConfig(on_commit=[lambda m: sync_iceberg(table)])
    cuts = log_df.agg(
        F.floor(F.max("seq") / 3), F.floor(2 * F.max("seq") / 3)
    ).first()
    apply_batch(table, log_df.filter(F.col("seq") <= cuts[0]), 0, cfg)
    apply_batch(
        table,
        log_df.filter((F.col("seq") > cuts[0]) & (F.col("seq") <= cuts[1])),
        1, cfg,
    )
    apply_batch(table, log_df.filter(F.col("seq") > cuts[1]), 2, cfg)
    meta = _load_metadata(table.path)
    assert len(meta["snapshots"]) == 3
    old_lists = [s["manifest-list"] for s in meta["snapshots"][:-1]]

    res = expire_iceberg(table, keep_last=1)
    assert res["expired_snapshots"] == 2 and res["kept_snapshots"] == 1
    meta2 = _load_metadata(table.path)
    assert len(meta2["snapshots"]) == 1
    assert meta2["snapshots"][0]["snapshot-id"] == meta2["current-snapshot-id"]
    for p in old_lists:
        assert not os.path.exists(p)
    # current read unaffected; expired snapshot no longer resolvable
    got = _sorted_rows(read_iceberg(spark, os.path.abspath(table.path)))
    assert got == _sorted_rows(table.read())
    with pytest.raises(ValueError, match="not in"):
        read_iceberg(
            spark, os.path.abspath(table.path),
            snapshot_id=meta["snapshots"][0]["snapshot-id"],
        )
    # idempotent: nothing left to expire
    assert expire_iceberg(table, keep_last=1)["expired_snapshots"] == 0


def test_vacuum_pins_exported_snapshots_until_expired(
    spark, log_df, tmp_path
):
    """Lake vacuum retains versions the Iceberg mirror still exposes —
    Iceberg time travel never dangles — and expire_iceberg is what
    releases them for reclaim."""
    from datax_spark.lake.iceberg import expire_iceberg, sync_iceberg
    from datax_spark.streaming.pipeline import PipelineConfig

    table = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    cfg = PipelineConfig(on_commit=[lambda m: sync_iceberg(table)])
    cuts = log_df.agg(
        F.floor(F.max("seq") / 3), F.floor(2 * F.max("seq") / 3)
    ).first()
    apply_batch(table, log_df.filter(F.col("seq") <= cuts[0]), 0, cfg)
    apply_batch(
        table,
        log_df.filter((F.col("seq") > cuts[0]) & (F.col("seq") <= cuts[1])),
        1, cfg,
    )
    apply_batch(table, log_df.filter(F.col("seq") > cuts[1]), 2, cfg)
    first_id = _load_metadata(table.path)["snapshots"][0]["snapshot-id"]
    loc = os.path.abspath(table.path)
    v1_rows = _sorted_rows(read_iceberg(spark, loc, snapshot_id=first_id))

    def parquet_files():
        return sum(
            1
            for root, _dirs, fs in os.walk(os.path.join(table.path, "data"))
            for f in fs
            if f.endswith(".parquet") and not f.startswith(".")
        )

    # all three exported versions pinned: only the empty create version
    # (never exported) may reclaim, and NO parquet data file disappears
    # (removed_files may count committer side files: _SUCCESS, .crc)
    n_parquet = parquet_files()
    res = table.vacuum(keep_last=1)
    assert res["removed_snapshots"] <= 1
    assert parquet_files() == n_parquet
    assert _sorted_rows(
        read_iceberg(spark, loc, snapshot_id=first_id)
    ) == v1_rows

    # expire the mirror down to the current snapshot -> vacuum reclaims
    expire_iceberg(table, keep_last=1)
    res2 = table.vacuum(keep_last=1)
    assert res2["removed_snapshots"] == 2
    assert parquet_files() < n_parquet
    got = _sorted_rows(read_iceberg(spark, loc))
    assert got == _sorted_rows(table.read())


def test_export_refuses_branch_tables(spark, log_df, tmp_path):
    table = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    apply_batch(table, log_df, 0)
    table.create_branch("audit")
    branch = LakeTable(spark, table.path, branch="audit")
    with pytest.raises(ValueError, match="MAIN versions only"):
        export_iceberg(branch)


def test_empty_table_round_trips(spark, tmp_path):
    t = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA, KEYS, "repo",
        num_buckets=2,
    )
    export_iceberg(t)
    df = read_iceberg(spark, os.path.abspath(t.path))
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == [
        "repo", "path", "commit", "lang", "content"
    ]


def test_live_inline_mor_exports_with_position_deletes(
    spark, log_df, tmp_path
):
    """delete_files='pos': the default (inline-tombstone) encoding —
    which the equality encoding refuses — exports as ONE spec
    position-delete file (reserved field ids, rows sorted by
    (file_path, pos), paths byte-equal to the manifests') and the
    Iceberg read equals the engine's resolved read exactly."""
    import pyarrow.parquet as pq

    mor = MorTable.create(
        spark, os.path.join(str(tmp_path), "m"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(mor, log_df.filter(F.col("seq") <= mid), 0)
    apply_batch(mor, log_df.filter(F.col("seq") > mid), 1)
    assert any(v for v in mor.snapshot().deltas.values())
    export_iceberg(mor, delete_files="pos")

    loc = os.path.abspath(mor.path)
    plan = iceberg_plan(loc)
    assert len(plan["pos_deletes"]) == 1
    ppath, pseq = plan["pos_deletes"][0]
    assert pseq == mor.current_version()
    pf = pq.read_table(ppath)
    assert pf.schema.names == ["file_path", "pos"]
    assert pf.schema.field("file_path").metadata[b"PARQUET:field_id"] == b"2147483546"
    assert pf.schema.field("pos").metadata[b"PARQUET:field_id"] == b"2147483545"
    rows = list(zip(pf.column("file_path").to_pylist(),
                    pf.column("pos").to_pylist()))
    assert rows == sorted(rows), "spec: sorted by (file_path, pos)"
    assert {p for p, _ in rows} <= set(plan["data_seq"]), (
        "delete paths must match manifest data-file paths byte-for-byte"
    )
    meta = _load_metadata(loc)
    s = meta["snapshots"][-1]
    assert int(s["summary"]["total-delete-files"]) == 1
    assert int(s["summary"]["total-position-deletes"]) == len(rows)
    assert _sorted_rows(read_iceberg(spark, loc)) == _sorted_rows(mor.read())


def test_pos_sync_incremental_and_time_travel(spark, log_df, tmp_path):
    """sync_iceberg(delete_files='pos') per commit on the DEFAULT
    inline-encoded stream: every batch lands as a snapshot (no
    compaction, no skips), and time travel to the mid-stream snapshot
    applies that snapshot's own position-delete file."""
    from datax_spark.lake.iceberg import sync_iceberg
    from datax_spark.streaming.pipeline import PipelineConfig

    mor = MorTable.create(
        spark, os.path.join(str(tmp_path), "m"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    cfg = PipelineConfig(
        on_commit=[lambda m: sync_iceberg(mor, delete_files="pos")]
    )
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(mor, log_df.filter(F.col("seq") <= mid), 0, cfg)
    v1 = mor.current_version()
    apply_batch(mor, log_df.filter(F.col("seq") > mid), 1, cfg)
    meta = _load_metadata(mor.path)
    assert [s["snapshot-id"] for s in meta["snapshots"]] == [
        v1, mor.current_version()
    ]
    loc = os.path.abspath(mor.path)
    assert _sorted_rows(read_iceberg(spark, loc)) == _sorted_rows(mor.read())
    assert _sorted_rows(read_iceberg(spark, loc, snapshot_id=v1)) == (
        _sorted_rows(mor.read(version=v1))
    )


def test_pos_export_of_eq_encoded_state(spark, log_df, tmp_path):
    """An eq-encoded table exports through the position encoding too
    (the dead set subsumes eq-deleted rows), and no equality-delete
    files are emitted in pos mode."""
    from datax_spark.streaming.pipeline import PipelineConfig

    mor = MorTable.create(
        spark, os.path.join(str(tmp_path), "m"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    cfg = PipelineConfig(delete_encoding="eq")
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(mor, log_df.filter(F.col("seq") <= mid), 0, cfg)
    apply_batch(mor, log_df.filter(F.col("seq") > mid), 1, cfg)
    assert any(v for v in mor.snapshot().eq_deletes.values())
    export_iceberg(mor, delete_files="pos")
    loc = os.path.abspath(mor.path)
    plan = iceberg_plan(loc)
    assert plan["pos_deletes"] and not plan["eq_deletes"]
    assert _sorted_rows(read_iceberg(spark, loc)) == _sorted_rows(mor.read())


def test_pos_delete_read_never_shuffles_data(spark, log_df, tmp_path):
    """The position-delete application must broadcast both small sides
    (path->seq map and the (file,pos) delete set): no hash exchange
    anywhere in the read plan."""
    mor = MorTable.create(
        spark, os.path.join(str(tmp_path), "m"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(mor, log_df.filter(F.col("seq") <= mid), 0)
    apply_batch(mor, log_df.filter(F.col("seq") > mid), 1)
    export_iceberg(mor, delete_files="pos")
    df = read_iceberg(spark, os.path.abspath(mor.path))
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    data_side = final.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in data_side, (
        "the data side of the position-delete read must not shuffle"
    )
    assert "SortMergeJoin" not in final


def test_pos_export_is_incremental_per_changed_bucket(
    spark, log_df, tmp_path
):
    """The second pos export recomputes dead rows ONLY for buckets whose
    file lists changed: its position-delete file references changed
    buckets' files only, the first export's pos file rides along as an
    EXISTING delete entry, and the read still equals the engine's."""
    import pyarrow.parquet as pq

    from datax_spark.lake.delta import _changed_buckets
    from datax_spark.lake.iceberg import read_container

    mor = MorTable.create(
        spark, os.path.join(str(tmp_path), "m"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(mor, log_df.filter(F.col("seq") <= mid), 0)
    v1 = mor.current_version()
    export_iceberg(mor, delete_files="pos")
    snap1 = mor.snapshot()

    # second batch touches ONE repo -> a strict subset of buckets
    one_repo = (
        log_df.filter((F.col("seq") > mid) & F.col("repo").isNotNull())
        .select("repo").distinct().orderBy("repo").first()[0]
    )
    apply_batch(
        mor, log_df.filter((F.col("seq") > mid) & (F.col("repo") == one_repo)), 1
    )
    snap2 = mor.snapshot()
    changed = _changed_buckets(snap2, snap1)
    assert changed is not None and 0 < len(changed) < 4
    export_iceberg(mor, delete_files="pos")

    loc = os.path.abspath(mor.path)
    plan = iceberg_plan(loc)
    # both pos files live in the current snapshot's delete manifest
    assert len(plan["pos_deletes"]) == 2
    newest = max(plan["pos_deletes"], key=lambda ps: ps[1])
    oldest = min(plan["pos_deletes"], key=lambda ps: ps[1])
    assert oldest[1] == v1  # carried EXISTING keeps its sequence
    # the new file only references changed buckets' data files
    changed_rels = set()
    for b in changed:
        changed_rels.update(snap2.buckets.get(str(b), []))
        changed_rels.update(snap2.deltas.get(str(b), []))
    changed_paths = {os.path.join(loc, r) for r in changed_rels}
    new_paths = set(pq.read_table(newest[0]).column("file_path").to_pylist())
    assert new_paths and new_paths <= changed_paths
    # the EXISTING carry is status 0 in the manifest
    meta = _load_metadata(loc)
    _, manifests = read_container(meta["snapshots"][-1]["manifest-list"])
    del_entries = [
        e
        for m in manifests
        if m["content"] == 1
        for _, ents in [read_container(m["manifest_path"])]
        for e in ents
    ]
    statuses = {
        e["data_file"]["file_path"]: e["status"] for e in del_entries
    }
    assert statuses[oldest[0]] == 0 and statuses[newest[0]] == 1
    assert _sorted_rows(read_iceberg(spark, loc)) == _sorted_rows(mor.read())


# ---------------------------------------------------------------------------
# format-version 3 deletion vectors (delete_files='dv')
# ---------------------------------------------------------------------------


def test_live_mor_exports_v3_deletion_vectors(spark, log_df, tmp_path):
    """delete_files='dv': a live inline-tombstone MOR state publishes
    format-version-3 metadata whose dead rows are Puffin deletion
    vectors — one ``delete-vector-v1`` roaring blob per masked data
    file, referenced from the delete manifest by the v3 fields
    (referenced_data_file / content_offset / content_size_in_bytes) —
    and the Iceberg read equals the engine's resolved read exactly."""
    from datax_spark.lake.puffin import (
        DV_MAGIC_BYTES,
        MAGIC,
        dv_positions_from_blob,
        read_puffin_blob,
        read_puffin_footer,
    )

    mor = MorTable.create(
        spark, os.path.join(str(tmp_path), "m"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(mor, log_df.filter(F.col("seq") <= mid), 0)
    apply_batch(mor, log_df.filter(F.col("seq") > mid), 1)
    assert any(v for v in mor.snapshot().deltas.values())
    export_iceberg(mor, delete_files="dv")

    loc = os.path.abspath(mor.path)
    meta = _load_metadata(loc)
    assert meta["format-version"] == 3
    assert meta["next-row-id"] > 0
    assert meta["snapshots"][-1]["first-row-id"] == 0
    s = meta["snapshots"][-1]["summary"]
    assert int(s["total-delete-files"]) >= 1

    plan = iceberg_plan(loc)
    assert plan["dvs"] and not plan["pos_deletes"] and not plan["eq_deletes"]
    # every DV references a live data file; at most one per file is
    # enforced by iceberg_plan itself
    assert {d["referenced"] for d in plan["dvs"]} <= set(plan["data_seq"])
    total_dead = 0
    for d in plan["dvs"]:
        # the Puffin container framing is spec-shaped
        with open(d["puffin"], "rb") as f:
            raw = f.read()
        assert raw[:4] == MAGIC and raw[-4:] == MAGIC
        foot = read_puffin_footer(d["puffin"])
        blob_meta = next(
            b
            for b in foot["blobs"]
            if b["properties"]["referenced-data-file"] == d["referenced"]
        )
        assert blob_meta["type"] == "deletion-vector-v1"
        assert blob_meta["offset"] == d["offset"]
        assert blob_meta["length"] == d["length"]
        assert blob_meta["snapshot-id"] == -1  # manifest is the authority
        # the blob itself: len + D1 33 39 64 magic + roaring + crc32
        blob = read_puffin_blob(d["puffin"], d["offset"], d["length"])
        assert blob[4:8] == DV_MAGIC_BYTES
        positions = dv_positions_from_blob(blob)  # verifies the CRC
        assert len(positions) == d["cardinality"]
        assert positions == sorted(set(positions))
        total_dead += len(positions)
    assert int(s["total-position-deletes"]) == total_dead
    assert _sorted_rows(read_iceberg(spark, loc)) == _sorted_rows(mor.read())


def test_dv_blob_framing_is_deltas():
    """The bytes inside a v3 DV blob are EXACTLY one record of Delta's
    deletion-vector file format (the v3 spec adopted Delta's
    RoaringBitmapArray serialization, so engines share readers — and
    this repo's serializer is cross-checked byte-for-byte against
    org.roaringbitmap in tests/test_delta.py)."""
    import struct
    import zlib

    from datax_spark.lake.delta import serialize_dv
    from datax_spark.lake.puffin import dv_blob_data, dv_positions_from_blob

    positions = [0, 1, 5, 4096, (3 << 32) | 7]
    blob, card = dv_blob_data(positions)
    assert card == len(positions)
    payload = serialize_dv(sorted(positions))
    assert blob == (
        struct.pack(">I", len(payload))
        + payload
        + struct.pack(">I", zlib.crc32(payload) & 0xFFFFFFFF)
    )
    assert dv_positions_from_blob(blob) == sorted(positions)
    # corruption is caught by the CRC, not silently decoded
    bad = bytearray(blob)
    bad[10] ^= 0xFF
    with pytest.raises(ValueError):
        dv_positions_from_blob(bytes(bad))


def test_dv_export_is_incremental_per_changed_bucket(
    spark, log_df, tmp_path
):
    """The second dv export recomputes masks ONLY for changed buckets:
    unchanged buckets' DVs ride along as EXISTING delete entries still
    pointing into the FIRST export's Puffin file, the new Puffin only
    references changed buckets' files, and reads stay exact."""
    from datax_spark.lake.delta import _changed_buckets
    from datax_spark.lake.iceberg import read_container

    mor = MorTable.create(
        spark, os.path.join(str(tmp_path), "m"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(mor, log_df.filter(F.col("seq") <= mid), 0)
    v1 = mor.current_version()
    export_iceberg(mor, delete_files="dv")
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
    export_iceberg(mor, delete_files="dv")

    loc = os.path.abspath(mor.path)
    mdir = os.path.join(loc, "metadata")
    plan = iceberg_plan(loc)
    puffins = {d["puffin"] for d in plan["dvs"]}
    assert puffins == {
        os.path.join(mdir, f"dv-{v1}.puffin"),
        os.path.join(mdir, f"dv-{mor.current_version()}.puffin"),
    }
    changed_rels = set()
    for b in changed:
        changed_rels.update(snap2.buckets.get(str(b), []))
        changed_rels.update(snap2.deltas.get(str(b), []))
    changed_paths = {os.path.join(loc, r) for r in changed_rels}
    new_puffin = os.path.join(mdir, f"dv-{mor.current_version()}.puffin")
    for d in plan["dvs"]:
        if d["puffin"] == new_puffin:
            assert d["referenced"] in changed_paths
            assert d["seq"] == mor.current_version()
        else:
            assert d["referenced"] not in changed_paths
            assert d["seq"] == v1  # EXISTING keeps its sequence
    meta = _load_metadata(loc)
    _, manifests = read_container(meta["snapshots"][-1]["manifest-list"])
    del_entries = [
        e
        for m in manifests
        if m["content"] == 1
        for _, ents in [read_container(m["manifest_path"])]
        for e in ents
    ]
    assert {
        e["status"] for e in del_entries
        if e["data_file"]["file_path"] == new_puffin
    } == {1}
    assert {
        e["status"] for e in del_entries
        if e["data_file"]["file_path"] != new_puffin
    } == {0}
    assert _sorted_rows(read_iceberg(spark, loc)) == _sorted_rows(mor.read())
    assert _sorted_rows(
        read_iceberg(spark, loc, snapshot_id=v1)
    ) == _sorted_rows(mor.read(version=v1))


def test_v3_row_lineage_stable_unique_and_monotone(spark, log_df, tmp_path):
    """Row lineage across three dv exports: every data file's assigned
    first_row_id block is disjoint, a surviving file's assignment never
    changes across manifest rewrites, and next-row-id advances by
    exactly the newly assigned rows."""
    from datax_spark.lake.iceberg import _prior_file_index

    mor = MorTable.create(
        spark, os.path.join(str(tmp_path), "m"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    hi = log_df.agg(F.max("seq")).first()[0]
    cuts = [hi // 3, 2 * hi // 3, hi]
    lo = -1
    assigned_history = []
    loc = os.path.abspath(mor.path)
    for i, cut in enumerate(cuts):
        apply_batch(
            mor,
            log_df.filter((F.col("seq") > lo) & (F.col("seq") <= cut)),
            i,
        )
        lo = cut
        export_iceberg(mor, delete_files="dv")
        meta = _load_metadata(loc)
        files, _dvs = _prior_file_index(loc, meta)
        assigned = {
            p: (rec["data_file"]["first_row_id"],
                rec["data_file"]["record_count"])
            for p, rec in files.items()
            if rec["data_file"]["content"] == 0
        }
        # blocks are disjoint and inside [0, next-row-id)
        spans = sorted(assigned.values())
        for (a, n), (b, _) in zip(spans, spans[1:]):
            assert a + n <= b, "overlapping first_row_id blocks"
        assert spans[0][0] >= 0
        assert spans[-1][0] + spans[-1][1] <= meta["next-row-id"]
        # snapshots' first-row-id is monotone
        frids = [s["first-row-id"] for s in meta["snapshots"]]
        assert frids == sorted(frids)
        assigned_history.append(assigned)
    # a file surviving from export i to i+1 keeps its assignment
    for prev, cur in zip(assigned_history, assigned_history[1:]):
        for p in set(prev) & set(cur):
            assert prev[p] == cur[p], f"first_row_id moved for {p}"


def test_v3_never_downgrades_and_refuses_pos(spark, log_df, tmp_path):
    """Once a table publishes format-version 3 it stays v3 (later eq
    exports included), and delete_files='pos' refuses — the v3 spec
    replaced position-delete files with deletion vectors. A v2 (eq)
    table upgrades to v3 in place on its first dv export."""
    from datax_spark.streaming.pipeline import PipelineConfig

    mor = MorTable.create(
        spark, os.path.join(str(tmp_path), "m"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    cfg = PipelineConfig(delete_encoding="eq")
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(mor, log_df.filter(F.col("seq") <= mid), 0, cfg)
    export_iceberg(mor, delete_files="eq")
    loc = os.path.abspath(mor.path)
    assert _load_metadata(loc)["format-version"] == 2

    apply_batch(mor, log_df.filter(F.col("seq") > mid), 1, cfg)
    export_iceberg(mor, delete_files="dv")  # v2 -> v3 upgrade
    meta = _load_metadata(loc)
    assert meta["format-version"] == 3
    assert "next-row-id" in meta
    assert _sorted_rows(read_iceberg(spark, loc)) == _sorted_rows(mor.read())

    with pytest.raises(ValueError, match="deletion vectors"):
        export_iceberg(mor, delete_files="pos")
    mor.compact(max_files_per_bucket=0)
    export_iceberg(mor, delete_files="eq")  # clean state, eq mode
    assert _load_metadata(loc)["format-version"] == 3  # never downgrades
    assert _sorted_rows(read_iceberg(spark, loc)) == _sorted_rows(mor.read())


def test_pos_to_dv_switch_recomputes_fully(spark, log_df, tmp_path):
    """Switching a pos-exported table to dv drops the parquet
    position-delete entries (v3 bans them) and recomputes every mask:
    the new snapshot's deletes are DVs only, while time travel to the
    pos-era snapshot still applies its position-delete file."""
    mor = MorTable.create(
        spark, os.path.join(str(tmp_path), "m"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(mor, log_df.filter(F.col("seq") <= mid), 0)
    v1 = mor.current_version()
    export_iceberg(mor, delete_files="pos")
    apply_batch(mor, log_df.filter(F.col("seq") > mid), 1)
    export_iceberg(mor, delete_files="dv")

    loc = os.path.abspath(mor.path)
    plan = iceberg_plan(loc)
    assert plan["dvs"] and not plan["pos_deletes"]
    assert _sorted_rows(read_iceberg(spark, loc)) == _sorted_rows(mor.read())
    old = iceberg_plan(loc, snapshot_id=v1)
    assert old["pos_deletes"] and not old["dvs"]
    assert _sorted_rows(
        read_iceberg(spark, loc, snapshot_id=v1)
    ) == _sorted_rows(mor.read(version=v1))


def test_expire_reclaims_unreferenced_puffins(spark, log_df, tmp_path):
    """expire_iceberg's unreferenced-file sweep covers Puffin files:
    after expiring the first dv snapshot, only Puffins the kept
    snapshot references survive, and the read is unaffected."""
    import glob as globmod

    from datax_spark.lake.iceberg import expire_iceberg

    mor = MorTable.create(
        spark, os.path.join(str(tmp_path), "m"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(mor, log_df.filter(F.col("seq") <= mid), 0)
    export_iceberg(mor, delete_files="dv")
    apply_batch(mor, log_df.filter(F.col("seq") > mid), 1)
    export_iceberg(mor, delete_files="dv")

    loc = os.path.abspath(mor.path)
    mdir = os.path.join(loc, "metadata")
    before = set(globmod.glob(os.path.join(mdir, "*.puffin")))
    assert len(before) >= 2
    expire_iceberg(mor, keep_last=1)
    kept_puffins = {d["puffin"] for d in iceberg_plan(loc)["dvs"]}
    after = set(globmod.glob(os.path.join(mdir, "*.puffin")))
    assert after == kept_puffins
    assert before - after, "expire should reclaim some Puffin file"
    assert _sorted_rows(read_iceberg(spark, loc)) == _sorted_rows(mor.read())


def test_dv_sync_publishes_each_batch(spark, log_df, tmp_path):
    """sync_iceberg(delete_files='dv') as the on_commit hook mirrors
    every committed batch of a default (inline-tombstone) CDC stream
    as a v3 snapshot — no compaction gate, no skips."""
    from datax_spark.lake.iceberg import sync_iceberg
    from datax_spark.streaming.pipeline import PipelineConfig

    mor = MorTable.create(
        spark, os.path.join(str(tmp_path), "m"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    cfg = PipelineConfig(
        on_commit=[lambda m: sync_iceberg(mor, delete_files="dv")]
    )
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(mor, log_df.filter(F.col("seq") <= mid), 0, cfg)
    v1 = mor.current_version()
    apply_batch(mor, log_df.filter(F.col("seq") > mid), 1, cfg)
    loc = os.path.abspath(mor.path)
    meta = _load_metadata(loc)
    assert [s["snapshot-id"] for s in meta["snapshots"]] == [
        v1, mor.current_version()
    ]
    assert meta["format-version"] == 3
    assert _sorted_rows(read_iceberg(spark, loc)) == _sorted_rows(mor.read())


# ---------------------------------------------------------------------------
# metadata tables
# ---------------------------------------------------------------------------


def test_metadata_tables_cow(spark, exported):
    """The t$snapshots / history / refs / manifests / files inspection
    surface agrees with the metadata document and the scan plan."""
    from datax_spark.lake.iceberg import iceberg_metadata_table

    loc = exported["location"]
    meta = _load_metadata(loc)

    snaps = iceberg_metadata_table(spark, loc, "snapshots")
    srows = snaps.orderBy("snapshot_id").collect()
    assert [r["snapshot_id"] for r in srows] == [
        s["snapshot-id"] for s in meta["snapshots"]
    ]
    assert all(r["operation"] in ("append", "overwrite") for r in srows)

    hist = iceberg_metadata_table(spark, loc, "history").collect()
    assert len(hist) == len(meta["snapshot-log"])
    assert all(r["is_current_ancestor"] for r in hist)

    refs = {r["name"]: r for r in
            iceberg_metadata_table(spark, loc, "refs").collect()}
    assert refs["main"]["snapshot_id"] == meta["current-snapshot-id"]

    from datax_spark.sources.avro_codec import read_container

    mans = iceberg_metadata_table(spark, loc, "manifests").collect()
    assert {r["path"] for r in mans} == {
        m["manifest_path"]
        for m in read_container(meta["snapshots"][-1]["manifest-list"])[1]
    }

    plan = iceberg_plan(loc)
    files = iceberg_metadata_table(spark, loc, "files")
    assert files.filter("content = 0").count() == len(plan["files"])
    data = iceberg_metadata_table(spark, loc, "data_files").collect()
    assert {r["file_path"] for r in data} == set(plan["files"])
    for r in data:
        assert r["sequence_number"] == plan["data_seq"][r["file_path"]]
    # record counts agree with the plan's total
    assert sum(r["record_count"] for r in data) == plan["total_rows"]
    # time travel: the first snapshot's files table matches its plan
    v1 = meta["snapshots"][0]["snapshot-id"]
    old_plan = iceberg_plan(loc, snapshot_id=v1)
    old_files = iceberg_metadata_table(
        spark, loc, "data_files", snapshot_id=v1
    )
    assert old_files.count() == len(old_plan["files"])

    with pytest.raises(ValueError, match="unknown metadata table"):
        iceberg_metadata_table(spark, loc, "entries")


def test_metadata_tables_dv_and_row_ids(spark, log_df, tmp_path):
    """On a v3 DV table the delete_files rows carry the deletion-vector
    columns, and the files table's derived first_row_id assignment
    matches the exporter's reconstruction (disjoint, complete)."""
    from datax_spark.lake.iceberg import (
        _prior_file_index,
        iceberg_metadata_table,
    )

    mor = MorTable.create(
        spark, os.path.join(str(tmp_path), "m"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(mor, log_df.filter(F.col("seq") <= mid), 0)
    export_iceberg(mor, delete_files="dv")
    apply_batch(mor, log_df.filter(F.col("seq") > mid), 1)
    export_iceberg(mor, delete_files="dv")
    loc = os.path.abspath(mor.path)
    meta = _load_metadata(loc)

    dels = iceberg_metadata_table(spark, loc, "delete_files").collect()
    assert dels
    for r in dels:
        assert r["content"] == 1
        assert r["file_format"] == "PUFFIN"
        assert r["referenced_data_file"] and r["content_offset"] is not None
        assert r["content_size_in_bytes"] > 0
    plan = iceberg_plan(loc)
    assert {r["referenced_data_file"] for r in dels} == {
        d["referenced"] for d in plan["dvs"]
    }

    data = iceberg_metadata_table(spark, loc, "data_files").collect()
    files_idx, _ = _prior_file_index(loc, meta)
    for r in data:
        rec = files_idx[r["file_path"]]
        assert r["first_row_id"] == rec["data_file"]["first_row_id"]
    ids = sorted(
        (r["first_row_id"], r["record_count"]) for r in data
    )
    for (a, n), (b, _) in zip(ids, ids[1:]):
        assert a + n <= b
    # manifests table: delete manifest has no first_row_id block
    mans = iceberg_metadata_table(spark, loc, "manifests").collect()
    assert {m["content"] for m in mans} == {0, 1}
    for m in mans:
        assert (m["first_row_id"] is None) == (m["content"] == 1)


def test_lake_tags_mirror_as_iceberg_refs(spark, log_df, tmp_path):
    """A lake tag on an exported version rides the next export as an
    Iceberg tag ref: read_iceberg(ref=) resolves it, expire keeps the
    tagged snapshot past keep_last, and dropping the lake tag releases
    it at the next export."""
    from datax_spark.lake.iceberg import expire_iceberg

    table = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    hi = log_df.agg(F.max("seq")).first()[0]
    cuts = [hi // 3, 2 * hi // 3, hi]
    lo = -1
    for i, cut in enumerate(cuts):
        apply_batch(
            table,
            log_df.filter((F.col("seq") > lo) & (F.col("seq") <= cut)),
            i,
        )
        lo = cut
        if i == 0:
            v1 = table.current_version()
            table.create_tag("gold", v1)
        export_iceberg(table)
    loc = os.path.abspath(table.path)
    meta = _load_metadata(loc)
    assert meta["refs"]["gold"] == {"snapshot-id": v1, "type": "tag"}
    assert _sorted_rows(read_iceberg(spark, loc, ref="gold")) == _sorted_rows(
        table.read(version=v1)
    )
    with pytest.raises(ValueError, match="not in"):
        read_iceberg(spark, loc, ref="nope")
    with pytest.raises(ValueError, match="not both"):
        iceberg_plan(loc, snapshot_id=v1, ref="gold")

    # expire: the tagged snapshot survives keep_last=1
    out = expire_iceberg(table, keep_last=1)
    meta = _load_metadata(loc)
    ids = [s["snapshot-id"] for s in meta["snapshots"]]
    assert v1 in ids and len(ids) == 2  # tagged + head
    assert out["expired_snapshots"] == 1
    assert _sorted_rows(read_iceberg(spark, loc, ref="gold")) == _sorted_rows(
        table.read(version=v1)
    )
    # drop the lake tag; the next export releases the ref, expire frees it
    table.delete_tag("gold")
    apply_batch(
        table,
        log_df.filter(F.col("seq") <= cuts[0]),
        99,
    )
    export_iceberg(table)
    meta = _load_metadata(loc)
    assert "gold" not in meta["refs"]
    expire_iceberg(table, keep_last=1)
    meta = _load_metadata(loc)
    assert [s["snapshot-id"] for s in meta["snapshots"]] == [
        table.current_version()
    ]


def test_java_avro_reads_v3_manifests(spark, log_df, tmp_path):
    """The Java Avro reference implementation parses the v3 manifest
    list and manifest (new optional fields with null defaults) and sees
    the deletion-vector reference columns."""
    mor = MorTable.create(
        spark, os.path.join(str(tmp_path), "m"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    apply_batch(mor, log_df, 0)
    assert any(v for v in mor.snapshot().deltas.values())
    export_iceberg(mor, delete_files="dv")
    loc = os.path.abspath(mor.path)
    meta = _load_metadata(loc)
    snap = meta["snapshots"][-1]
    jvm = spark._jvm

    def java_read(path):
        reader = jvm.org.apache.avro.generic.GenericDatumReader()
        dfr = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(path), reader
        )
        out = []
        while dfr.hasNext():
            out.append(dfr.next())
        dfr.close()
        return out

    jlist = java_read(snap["manifest-list"])
    assert len(jlist) == 2  # data + deletes
    by_content = {int(str(m.get("content"))): m for m in jlist}
    assert by_content[0].get("first_row_id") is not None
    assert by_content[1].get("first_row_id") is None
    jdel = java_read(str(by_content[1].get("manifest_path")))
    assert jdel
    for e in jdel:
        df = e.get("data_file")
        assert str(df.get("file_format")) == "PUFFIN"
        assert df.get("referenced_data_file") is not None
        assert df.get("content_offset") is not None
        assert df.get("content_size_in_bytes") is not None
    jdata = java_read(str(by_content[0].get("manifest_path")))
    # ADDED entries carry null first_row_id (inheritance), per spec
    assert all(e.get("data_file").get("first_row_id") is None
               for e in jdata if int(str(e.get("status"))) == 1)


def test_iceberg_read_prunes_files_by_manifest_bounds(spark, tmp_path):
    """filters= on iceberg_plan/read_iceberg: the exported per-file
    [lower, upper] bounds skip files at PLAN time (the scan-planning
    half of a real Iceberg engine), and the filtered read equals the
    unpruned read + filter exactly — pruning never changes answers."""
    stats_schema = StructType([
        StructField("repo", StringType()),
        StructField("seq", LongType()),
        StructField("content", StringType()),
    ])
    t = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t"), stats_schema,
        ["repo"], "repo", num_buckets=4, stats_cols=["seq"],
    )
    for i in range(4):
        rows = spark.range(i * 100, (i + 1) * 100).select(
            F.concat(F.lit("r"), F.col("id")).alias("repo"),
            F.col("id").alias("seq"),
            F.concat(F.lit("c"), F.col("id")).alias("content"),
        )
        t.append_insert_only(rows, batch_id=i)
        export_iceberg(t)
    loc = os.path.abspath(t.path)

    full = iceberg_plan(loc)
    assert full["skipped_files"] == 0
    pruned = iceberg_plan(loc, filters=[("seq", ">=", 300)])
    assert pruned["skipped_files"] > 0
    assert len(pruned["files"]) + pruned["skipped_files"] == len(full["files"])
    # each append commit covers one seq century
    assert len(pruned["files"]) <= len(full["files"]) // 4 + 1
    assert pruned["total_rows"] < full["total_rows"]

    got = sorted(
        r["seq"]
        for r in read_iceberg(
            spark, loc, filters=[("seq", ">=", 300)]
        ).collect()
    )
    assert got == list(range(300, 400))
    # range + equality compose; missing-bounds columns fail open
    got2 = read_iceberg(
        spark, loc, filters=[("seq", "<", 100), ("repo", "=", "r42")]
    ).collect()
    assert [(r["repo"], r["seq"]) for r in got2] == [("r42", 42)]
    with pytest.raises(ValueError, match="unsupported filter op"):
        read_iceberg(spark, loc, filters=[("seq", "!=", 1)]).collect()


def test_read_iceberg_appends_and_overwrite_refusal(spark, tmp_path):
    """Incremental append scan over the mirror: rows added after a
    snapshot come back with their _snapshot_id; an overwrite snapshot
    in range refuses (rewritten files are not deltas)."""
    from datax_spark.lake.iceberg import read_iceberg_appends

    stats_schema = StructType([
        StructField("repo", StringType()),
        StructField("seq", LongType()),
        StructField("content", StringType()),
    ])
    t = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t"), stats_schema,
        ["repo"], "repo", num_buckets=4,
    )
    vs = []
    for i in range(3):
        rows = spark.range(i * 100, (i + 1) * 100).select(
            F.concat(F.lit("r"), F.col("id")).alias("repo"),
            F.col("id").alias("seq"),
            F.concat(F.lit("c"), F.col("id")).alias("content"),
        )
        t.append_insert_only(rows, batch_id=i)
        export_iceberg(t)
        vs.append(t.current_version())
    loc = os.path.abspath(t.path)
    meta = _load_metadata(loc)
    assert [
        s["summary"]["operation"] for s in meta["snapshots"]
    ] == ["append"] * 3

    inc = read_iceberg_appends(spark, loc, from_snapshot_id=vs[0])
    got = sorted(
        (r["seq"], r["_snapshot_id"]) for r in inc.collect()
    )
    assert got == [(s, vs[1]) for s in range(100, 200)] + [
        (s, vs[2]) for s in range(200, 300)
    ]
    # bounded range
    inc2 = read_iceberg_appends(
        spark, loc, from_snapshot_id=vs[0], to_snapshot_id=vs[1]
    )
    assert inc2.count() == 100
    # empty range
    assert read_iceberg_appends(spark, loc, vs[2]).count() == 0
    with pytest.raises(ValueError, match="not in metadata"):
        read_iceberg_appends(spark, loc, 999)

    # a compaction rewrites bucket files -> overwrite -> refusal
    t.compact(max_files_per_bucket=1)
    export_iceberg(t)
    meta = _load_metadata(loc)
    assert meta["snapshots"][-1]["summary"]["operation"] == "overwrite"
    with pytest.raises(ValueError, match="not append"):
        read_iceberg_appends(spark, loc, vs[0]).collect()


def test_read_iceberg_bloom_prunes_point_lookups(spark, tmp_path):
    """filters= point lookups probe the data files' own parquet bloom
    filters (the lake writes them for bloom_cols): a value in exactly
    one file opens ~one file, and results stay exact."""
    from datax_spark.lake.iceberg import _bloom_prune, iceberg_plan

    stats_schema = StructType([
        StructField("repo", StringType()),
        StructField("eid", LongType()),
        StructField("content", StringType()),
    ])
    t = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t"), stats_schema,
        ["repo", "eid"], "repo", 4, bloom_cols=["eid"],
    )
    for lo in (0, 500, 1000):
        rows = spark.range(lo, lo + 500).select(
            F.concat(F.lit("r"), (F.col("id") % 7)).alias("repo"),
            F.col("id").alias("eid"),
            F.concat(F.lit("c"), F.col("id")).alias("content"),
        )
        t.append_insert_only(rows, batch_id=lo + 1)
    export_iceberg(t)
    loc = os.path.abspath(t.path)
    plan = iceberg_plan(loc)
    kept, pruned = _bloom_prune(
        spark, plan["files"], [("eid", "=", 777)]
    )
    assert pruned > 0 and len(kept) < len(plan["files"])
    got = read_iceberg(spark, loc, filters=[("eid", "=", 777)]).collect()
    assert [(r["repo"], r["eid"]) for r in got] == [("r" + str(777 % 7), 777)]
    # IN list across two ranges keeps both their files, result exact
    got2 = read_iceberg(
        spark, loc, filters=[("eid", "in", [3, 1203])]
    ).collect()
    assert sorted(r["eid"] for r in got2) == [3, 1203]


def test_snapshot_summary_size_fields(spark, exported):
    """Summaries carry the spec size metrics, consistent with the
    manifest entries' file_size_in_bytes."""
    from datax_spark.lake.iceberg import iceberg_metadata_table

    loc = exported["location"]
    meta = _load_metadata(loc)
    s = meta["snapshots"][-1]["summary"]
    files = iceberg_metadata_table(spark, loc, "data_files").collect()
    total = sum(r["file_size_in_bytes"] for r in files)
    added = sum(
        r["file_size_in_bytes"] for r in files if r["status"] == 1
    )
    assert int(s["total-files-size"]) == total
    assert int(s["added-files-size"]) == added > 0


def test_create_iceberg_views_sql_surface(spark, exported):
    from datax_spark.lake.iceberg import create_iceberg_views

    loc = exported["location"]
    names = create_iceberg_views(spark, loc, "mirror")
    assert names[0] == "mirror" and "mirror_files" in names
    n = spark.sql("SELECT count(*) AS n FROM mirror").first()["n"]
    assert n == exported["table"].read().count()
    snaps = spark.sql(
        "SELECT snapshot_id FROM mirror_snapshots ORDER BY snapshot_id"
    ).collect()
    assert len(snaps) == 2
    top = spark.sql(
        "SELECT file_path FROM mirror_files WHERE content = 0 "
        "ORDER BY record_count DESC LIMIT 1"
    ).first()
    assert top["file_path"].endswith(".parquet")
    for v in names:
        spark.catalog.dropTempView(v)


def test_pos_sync_newly_dead_only_for_small_batches(spark, tmp_path):
    """A small append-only commit's pos sync writes ONLY the appended
    keys' dead rows (round 5): previously-dead rows stay covered by the
    prior position-delete files riding as EXISTING — Iceberg's
    accumulate-and-union delete semantics. The restricted and
    forced-full variants must read back identically, and the
    incremental delete file must be batch-sized, not state-sized."""
    import datax_spark.lake.delta as D
    from datax_spark.lake.iceberg import read_iceberg, sync_iceberg
    from datax_spark.streaming.pipeline import PipelineConfig

    mor = MorTable.create(
        spark, os.path.join(str(tmp_path), "m"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    base = spark.range(0, 3000).select(
        F.concat(F.lit("r"), F.col("id")).alias("repo"),
        F.lit("p").alias("path"), F.lit("c").alias("commit"),
        F.lit("py").alias("lang"),
        F.concat(F.lit("b"), F.col("id"), F.lit("z" * 80)).alias("content"),
        F.lit("insert").alias("op"), F.col("id").alias("seq"),
    )
    apply_batch(mor, base, 0)
    # live deltas + a first full pos sync (bulk-shaped: gate off)
    upd = spark.range(0, 1500).select(
        F.concat(F.lit("r"), F.col("id")).alias("repo"),
        F.lit("p").alias("path"), F.lit("c").alias("commit"),
        F.lit("py").alias("lang"), F.lit("u1").alias("content"),
        F.lit("update").alias("op"), (F.col("id") + 10_000).alias("seq"),
    )
    apply_batch(mor, upd, 1)
    sync_iceberg(mor, delete_files="pos")

    # small batch: kill 3 keys -> the next sync must be batch-sized
    small = spark.createDataFrame(
        [("r7", "p", "c", "py", "X", "update", 100_000),
         ("r9", "p", "c", None, None, "delete", 100_001),
         ("r2999", "p", "c", "py", "Y", "update", 100_002)],
        "repo string, path string, commit string, lang string, "
        "content string, op string, seq long")
    apply_batch(mor, small, 2)
    spans = []
    orig = D._appended_keys_span
    D._appended_keys_span = lambda *a, **k: (spans.append(1), orig(*a, **k))[1]
    try:
        sync_iceberg(mor, delete_files="pos")
    finally:
        D._appended_keys_span = orig
    assert spans, "pos sync never consulted the append-only span gate"
    meta = _load_metadata(mor.path)
    loc = os.path.abspath(mor.path)
    assert _sorted_rows(read_iceberg(spark, loc)) == _sorted_rows(mor.read())

    # the NEWEST pos-delete file covers only the small batch's keys:
    # dead rows here = r7's and r9's and r2999's superseded images
    import pyarrow.parquet as pq
    import glob
    pos_files = sorted(
        glob.glob(os.path.join(loc, "metadata", "posdel-*.parquet")),
        key=os.path.getmtime,
    )
    assert len(pos_files) >= 2
    newest = pq.read_table(pos_files[-1])
    assert newest.num_rows <= 8, newest.num_rows  # batch-sized
    # forced-full on the same state reads identically
    D._appended_keys_span = lambda *a, **k: None
    try:
        t2 = MorTable(spark, mor.path)
        small2 = spark.createDataFrame(
            [("r11", "p", "c", None, None, "delete", 200_000)],
            "repo string, path string, commit string, lang string, "
            "content string, op string, seq long")
        apply_batch(t2, small2, 3)
        sync_iceberg(t2, delete_files="pos")
    finally:
        D._appended_keys_span = orig
    assert _sorted_rows(read_iceberg(spark, loc)) == _sorted_rows(t2.read())


def test_dv_sync_incremental_union_with_prior_puffin(spark, tmp_path):
    """v3 DV sync for a small append-only commit: masks recompute only
    for the appended keys and union with each touched file's PRIOR
    Puffin blob; untouched files keep their prior DVs as EXISTING even
    inside changed buckets. Byte-level soundness is inherited from the
    canonical roaring serialization; here we pin read equality, the
    restricted path engaging, and equality with a forced full
    recompute."""
    import datax_spark.lake.delta as D
    from datax_spark.lake.iceberg import read_iceberg, sync_iceberg

    mor = MorTable.create(
        spark, os.path.join(str(tmp_path), "m"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    base = spark.range(0, 3000).select(
        F.concat(F.lit("r"), F.col("id")).alias("repo"),
        F.lit("p").alias("path"), F.lit("c").alias("commit"),
        F.lit("py").alias("lang"),
        F.concat(F.lit("b"), F.col("id"), F.lit("w" * 80)).alias("content"),
        F.lit("insert").alias("op"), F.col("id").alias("seq"),
    )
    apply_batch(mor, base, 0)
    upd = spark.range(0, 1500).select(
        F.concat(F.lit("r"), F.col("id")).alias("repo"),
        F.lit("p").alias("path"), F.lit("c").alias("commit"),
        F.lit("py").alias("lang"), F.lit("u1").alias("content"),
        F.lit("update").alias("op"), (F.col("id") + 10_000).alias("seq"),
    )
    apply_batch(mor, upd, 1)
    sync_iceberg(mor, delete_files="dv")  # bulk: full masks

    small = spark.createDataFrame(
        [("r7", "p", "c", "py", "X", "update", 100_000),
         ("r9", "p", "c", None, None, "delete", 100_001)],
        "repo string, path string, commit string, lang string, "
        "content string, op string, seq long")
    apply_batch(mor, small, 2)
    spans = []
    orig = D._appended_keys_span
    D._appended_keys_span = lambda *a, **k: (spans.append(1), orig(*a, **k))[1]
    try:
        sync_iceberg(mor, delete_files="dv")
    finally:
        D._appended_keys_span = orig
    assert spans, "dv sync never consulted the span gate"
    loc = os.path.abspath(mor.path)
    assert _sorted_rows(read_iceberg(spark, loc)) == _sorted_rows(mor.read())

    # forced-full third sync reads identically
    D._appended_keys_span = lambda *a, **k: None
    try:
        small2 = spark.createDataFrame(
            [("r11", "p", "c", None, None, "delete", 200_000)],
            "repo string, path string, commit string, lang string, "
            "content string, op string, seq long")
        apply_batch(mor, small2, 3)
        sync_iceberg(mor, delete_files="dv")
    finally:
        D._appended_keys_span = orig
    assert _sorted_rows(read_iceberg(spark, loc)) == _sorted_rows(mor.read())
