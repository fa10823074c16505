"""Iceberg REST catalog (lake/rest_catalog.py): the discovery + commit
protocol over the exported metadata.

Claims verified here:

- the server speaks the spec route/payload shapes (config, namespaces,
  register, loadTable, CommitTableRequest) over real HTTP;
- commits are optimistic: requirements checked and applied atomically
  under one lock, 409 CommitFailedException on a stale
  assert-ref-snapshot-id, unknown requirement/update types fail loudly
  (400) instead of being skipped;
- ``sync_iceberg_rest`` registers on first contact, then publishes each
  lake commit as an add-snapshot/set-snapshot-ref commit, retrying
  through conflicts; reads THROUGH the catalog (loadTable metadata, no
  version-hint file) equal the engine's resolved reads, incl. v3
  deletion-vector states and time travel;
- v3 row lineage is enforced server-side: a snapshot whose
  first-row-id overlaps the table's next-row-id is rejected without
  the server reading a single manifest.
"""

import json
import os
import threading

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from datax_spark.lake.iceberg import _load_metadata, export_iceberg
from datax_spark.lake.mor import MorTable
from datax_spark.lake.rest_catalog import (
    CatalogError,
    CommitConflict,
    IcebergRestCatalogServer,
    RestCatalog,
    apply_updates,
    catalog_commit_updates,
    check_requirements,
    read_iceberg_catalog,
    sync_iceberg_rest,
)
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


@pytest.fixture()
def server():
    with IcebergRestCatalogServer() as srv:
        yield srv


def test_config_namespaces_and_auth(server):
    cat = RestCatalog(server.url)
    assert cat.config() == {"defaults": {}, "overrides": {}}
    cat.create_namespace("lake", {"owner": "datax"})
    assert cat.list_namespaces() == ["lake"]
    assert cat.list_tables("lake") == []
    with pytest.raises(CatalogError, match="409"):
        cat.create_namespace("lake")
    with pytest.raises(CatalogError, match="404"):
        cat.list_tables("nope")


def test_bearer_token_required():
    with IcebergRestCatalogServer(token="s3cret") as srv:
        anon = RestCatalog(srv.url)
        with pytest.raises(CatalogError, match="401"):
            anon.list_namespaces()
        authed = RestCatalog(srv.url, token="s3cret")
        authed.create_namespace("lake")
        assert authed.list_namespaces() == ["lake"]


def test_register_load_and_read_through_catalog(
    spark, log_df, tmp_path, server
):
    cat = RestCatalog(server.url)
    table = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(table, log_df.filter(F.col("seq") <= mid), 0)
    v1 = table.current_version()
    # first contact registers the exported metadata file
    loc1 = sync_iceberg_rest(table, cat, "lake", "repos")
    assert loc1 and loc1.endswith("v1.metadata.json")
    assert cat.list_tables("lake") == ["repos"]
    # second commit publishes THROUGH the commit protocol
    apply_batch(table, log_df.filter(F.col("seq") > mid), 1)
    loc2 = sync_iceberg_rest(table, cat, "lake", "repos")
    assert loc2 and "metadata.json" in loc2 and loc2 != loc1
    assert os.path.exists(loc2)  # persisted before the pointer swapped
    loaded = cat.load_table("lake", "repos")
    assert loaded["metadata-location"] == loc2
    assert json.load(open(loc2)) == loaded["metadata"]
    snaps = [s["snapshot-id"] for s in loaded["metadata"]["snapshots"]]
    assert snaps == [v1, table.current_version()]
    # reads go through loadTable metadata, not the version-hint file
    assert _sorted_rows(
        read_iceberg_catalog(spark, cat, "lake", "repos")
    ) == _sorted_rows(table.read())
    assert _sorted_rows(
        read_iceberg_catalog(spark, cat, "lake", "repos", snapshot_id=v1)
    ) == _sorted_rows(table.read(version=v1))
    # idempotent: nothing new -> no commit
    assert sync_iceberg_rest(table, cat, "lake", "repos") is None


def test_stale_ref_commit_conflicts_and_sync_converges(
    spark, log_df, tmp_path, server
):
    cat = RestCatalog(server.url)
    table = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(table, log_df.filter(F.col("seq") <= mid), 0)
    sync_iceberg_rest(table, cat, "lake", "repos")
    stale = cat.load_table("lake", "repos")["metadata"]

    apply_batch(table, log_df.filter(F.col("seq") > mid), 1)
    sync_iceberg_rest(table, cat, "lake", "repos")  # moves main

    # a commit asserting the STALE main ref must 409
    local = _load_metadata(os.path.abspath(table.path))
    with pytest.raises(CommitConflict):
        cat.commit_table(
            "lake",
            "repos",
            [
                {
                    "type": "assert-ref-snapshot-id",
                    "ref": "main",
                    "snapshot-id": stale["current-snapshot-id"],
                }
            ],
            catalog_commit_updates(stale, local),
        )
    # ...while the sync path reloads and finds nothing left to publish
    assert sync_iceberg_rest(table, cat, "lake", "repos") is None


def test_unknown_requirement_and_update_fail_loudly(
    spark, log_df, tmp_path, server
):
    cat = RestCatalog(server.url)
    table = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    apply_batch(table, log_df, 0)
    sync_iceberg_rest(table, cat, "lake", "repos")
    with pytest.raises(CatalogError, match="400"):
        cat.commit_table(
            "lake", "repos",
            [{"type": "assert-quantum-entanglement"}], [],
        )
    with pytest.raises(CatalogError, match="400"):
        cat.commit_table(
            "lake", "repos", [], [{"action": "reticulate-splines"}],
        )
    # pure-function twins used by the server
    with pytest.raises(ValueError):
        check_requirements({}, [{"type": "assert-quantum-entanglement"}])
    with pytest.raises(ValueError):
        apply_updates({}, [{"action": "reticulate-splines"}])


def test_v3_dv_state_publishes_and_reads_through_catalog(
    spark, log_df, tmp_path, server
):
    """Live inline-tombstone MOR + dv encoding: every batch lands in
    the catalog as a v3 snapshot via the on_commit hook; the catalog
    metadata carries format-version 3 + next-row-id, and the read
    through loadTable applies the Puffin deletion vectors."""
    cat = RestCatalog(server.url)
    mor = MorTable.create(
        spark, os.path.join(str(tmp_path), "m"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    cfg = PipelineConfig(
        on_commit=[
            lambda m: sync_iceberg_rest(
                mor, cat, "lake", "repos_mor", delete_files="dv"
            )
        ]
    )
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(mor, log_df.filter(F.col("seq") <= mid), 0, cfg)
    v1 = mor.current_version()
    apply_batch(mor, log_df.filter(F.col("seq") > mid), 1, cfg)
    meta = cat.load_table("lake", "repos_mor")["metadata"]
    assert meta["format-version"] == 3
    assert [s["snapshot-id"] for s in meta["snapshots"]] == [
        v1, mor.current_version()
    ]
    local = _load_metadata(os.path.abspath(mor.path))
    assert meta["next-row-id"] == local["next-row-id"]
    assert _sorted_rows(
        read_iceberg_catalog(spark, cat, "lake", "repos_mor")
    ) == _sorted_rows(mor.read())
    assert _sorted_rows(
        read_iceberg_catalog(spark, cat, "lake", "repos_mor", snapshot_id=v1)
    ) == _sorted_rows(mor.read(version=v1))


def test_server_rejects_overlapping_row_id_blocks(server):
    """v3 row-lineage enforcement without reading manifests: an
    add-snapshot whose first-row-id is below the table's next-row-id
    is a protocol error."""
    base = {
        "format-version": 3,
        "table-uuid": "u-1",
        "location": "/tmp/rc_rowid",
        "next-row-id": 100,
        "snapshots": [],
        "schemas": [],
    }
    with pytest.raises(ValueError, match="row-id blocks"):
        apply_updates(
            base,
            [
                {
                    "action": "add-snapshot",
                    "snapshot": {
                        "snapshot-id": 7,
                        "sequence-number": 7,
                        "first-row-id": 50,
                        "added-rows": 10,
                        "timestamp-ms": 1,
                        "manifest-list": "x",
                        "summary": {"operation": "append"},
                    },
                }
            ],
        )
    out = apply_updates(
        base,
        [
            {
                "action": "add-snapshot",
                "snapshot": {
                    "snapshot-id": 7,
                    "sequence-number": 7,
                    "first-row-id": 100,
                    "added-rows": 10,
                    "timestamp-ms": 1,
                    "manifest-list": "x",
                    "summary": {"operation": "append"},
                },
            }
        ],
    )
    assert out["next-row-id"] == 110


def test_concurrent_publishers_serialize_through_the_catalog(
    spark, log_df, tmp_path, server
):
    """Two threads race sync_iceberg_rest for the same new lake
    version: the catalog requirement makes exactly one commit land,
    the other converges (empty rebase) — and the final catalog state
    equals the local export."""
    cat = RestCatalog(server.url)
    table = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(table, log_df.filter(F.col("seq") <= mid), 0)
    sync_iceberg_rest(table, cat, "lake", "repos")
    apply_batch(table, log_df.filter(F.col("seq") > mid), 1)
    export_iceberg(table)  # local export once; both threads publish it

    results, errors = [], []

    def publish():
        try:
            results.append(
                sync_iceberg_rest(table, cat, "lake", "repos")
            )
        except Exception as e:  # pragma: no cover - failure surface
            errors.append(e)

    ts = [threading.Thread(target=publish) for _ in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errors
    meta = cat.load_table("lake", "repos")["metadata"]
    local = _load_metadata(os.path.abspath(table.path))
    assert meta["current-snapshot-id"] == local["current-snapshot-id"]
    assert [s["snapshot-id"] for s in meta["snapshots"]] == [
        s["snapshot-id"] for s in local["snapshots"]
    ]


def test_drop_table(spark, log_df, tmp_path, server):
    cat = RestCatalog(server.url)
    table = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    apply_batch(table, log_df, 0)
    sync_iceberg_rest(table, cat, "lake", "repos")
    assert cat.table_exists("lake", "repos")
    cat.drop_table("lake", "repos")
    assert not cat.table_exists("lake", "repos")
    with pytest.raises(CatalogError, match="404"):
        cat.drop_table("lake", "repos")


def test_local_expire_mirrors_to_catalog(spark, log_df, tmp_path, server):
    """expire_iceberg shrinks the local document; the next sync mirrors
    the removal so the catalog never advertises snapshots whose
    manifest files are gone."""
    from datax_spark.lake.iceberg import expire_iceberg

    cat = RestCatalog(server.url)
    table = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA, KEYS, "repo",
        num_buckets=4,
    )
    mid = log_df.agg(F.floor(F.max("seq") / 2)).first()[0]
    apply_batch(table, log_df.filter(F.col("seq") <= mid), 0)
    sync_iceberg_rest(table, cat, "lake", "repos")
    apply_batch(table, log_df.filter(F.col("seq") > mid), 1)
    sync_iceberg_rest(table, cat, "lake", "repos")
    assert len(cat.load_table("lake", "repos")["metadata"]["snapshots"]) == 2

    expire_iceberg(table, keep_last=1)
    loc = sync_iceberg_rest(table, cat, "lake", "repos")
    assert loc is not None
    meta = cat.load_table("lake", "repos")["metadata"]
    local = _load_metadata(os.path.abspath(table.path))
    assert [s["snapshot-id"] for s in meta["snapshots"]] == [
        s["snapshot-id"] for s in local["snapshots"]
    ]
    assert len(meta["snapshots"]) == 1
    # the catalog-served read still works after the expiry commit
    assert _sorted_rows(
        read_iceberg_catalog(spark, cat, "lake", "repos")
    ) == _sorted_rows(table.read())


def test_register_missing_metadata_location_is_clean_400(server):
    """ADVICE r4: a bad metadata-location used to raise FileNotFoundError
    past the route handler's except clause, killing the handler thread —
    the client saw a connection abort instead of a 4xx."""
    cat = RestCatalog(server.url)
    cat.create_namespace("badreg")
    with pytest.raises(CatalogError, match="400"):
        cat.register_table("badreg", "t", "/nonexistent/metadata.json")
    # the server is still alive and serving
    assert "badreg" in cat.list_namespaces()


def test_v2_era_snapshots_commit_before_format_upgrade():
    """ADVICE r4: when the catalog lags across the v2->v3 boundary, the
    update list must add the v2-era snapshots (no first-row-id) BEFORE
    upgrade-format-version, or the server rejects them with 'v3 snapshot
    missing first-row-id' as a non-retryable 400."""

    def snap(sid, frid=None, rows=10):
        s = {
            "snapshot-id": sid, "sequence-number": sid,
            "timestamp-ms": sid, "manifest-list": f"ml-{sid}",
            "summary": {"operation": "append"}, "schema-id": 0,
        }
        if frid is not None:
            s["first-row-id"] = frid
            s["added-rows"] = rows
        return s

    schema0 = {"schema-id": 0, "type": "struct", "fields": []}
    cat_meta = {
        "format-version": 2, "table-uuid": "u-lag",
        "location": "/tmp/rc_lag", "last-column-id": 0,
        "current-schema-id": 0, "schemas": [schema0],
        "snapshots": [snap(1)], "current-snapshot-id": 1,
        "last-sequence-number": 1, "properties": {},
    }
    # local document moved on: one more v2-era snapshot (missed by the
    # catalog), then the v3 upgrade, then a v3 snapshot with lineage
    local_meta = {
        "format-version": 3, "table-uuid": "u-lag",
        "location": "/tmp/rc_lag", "last-column-id": 0,
        "current-schema-id": 0, "schemas": [schema0],
        "snapshots": [snap(1), snap(2), snap(3, frid=0, rows=20)],
        "current-snapshot-id": 3, "last-sequence-number": 3,
        "next-row-id": 20, "properties": {},
    }
    updates = catalog_commit_updates(cat_meta, local_meta)
    actions = [u["action"] for u in updates]
    assert actions.index("upgrade-format-version") > actions.index(
        "add-snapshot"
    )
    # the server-side application must accept the whole list atomically
    out = apply_updates(cat_meta, updates)
    assert out["format-version"] == 3
    assert out["next-row-id"] == 20
    assert [s["snapshot-id"] for s in out["snapshots"]] == [1, 2, 3]
