"""lake_maintenance_job CLI: every op returns one JSON line."""

import json
import os
import sys

from pyspark.sql.types import StringType, StructField, StructType

from datax_spark.lake.table import LakeTable
from datax_spark.operators.merge import merge_apply

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"))
import lake_maintenance_job  # noqa: E402

SCHEMA = StructType([StructField("k", StringType()), StructField("v", StringType())])


def _table(spark, tmp_path):
    t = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA, ["k"], "k", num_buckets=4
    )
    for i in range(3):
        merge_apply(
            t,
            spark.createDataFrame(
                [(f"k{j}", "insert", i * 10 + j, f"v{i}") for j in range(6)],
                "k string, op string, seq long, v string",
            ),
            i,
        )
    return t


def _run(capsys, *argv):
    rc = lake_maintenance_job.main(list(argv))
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert rc == 0, out
    return json.loads(out)


def test_all_ops(spark, tmp_path, capsys):
    t = _table(spark, tmp_path)
    fsck = _run(capsys, "--table", t.path, "--op", "fsck")
    assert fsck["ok"] is True

    desc = _run(capsys, "--table", t.path, "--op", "describe")
    assert desc  # driver-side summary present

    hist = _run(capsys, "--table", t.path, "--op", "history")
    assert len(hist["history"]) >= 3

    comp = _run(capsys, "--table", t.path, "--op", "compact",
                "--max-files-per-bucket", "1")
    assert "compacted_buckets" in comp

    vac = _run(capsys, "--table", t.path, "--op", "vacuum", "--keep-last", "1")
    assert vac["kept_versions"] == 1

    reb = _run(capsys, "--table", t.path, "--op", "rebucket", "--buckets", "8")
    assert reb["version"] > 0
    assert t.snapshot().properties["num_buckets"] == 8

    # state survived every maintenance op
    assert t.read().count() == 6

    # restore: roll back to the pre-rebucket version (the newest one the
    # keep-last-1 vacuum above retained), layout props revert with it
    v_pre = reb["version"] - 1
    res = _run(capsys, "--table", t.path, "--op", "restore",
               "--version", str(v_pre))
    assert res["restored_to"] == v_pre
    assert res["version"] == reb["version"] + 1
    assert t.snapshot().properties["num_buckets"] == 4
    assert t.read().count() == 6

    # export-iceberg: spec-conformant metadata lands in place and the
    # Iceberg read path agrees with the table
    exp = _run(capsys, "--table", t.path, "--op", "export-iceberg")
    assert os.path.exists(exp["metadata"])
    assert exp["rows"] == 6
    from datax_spark.lake.iceberg import read_iceberg

    assert read_iceberg(spark, os.path.abspath(t.path)).count() == 6

    # expire-iceberg: with one exported snapshot, keep-last 1 is a no-op;
    # the op itself runs the full metadata-rewrite path
    exp2 = _run(
        capsys, "--table", t.path, "--op", "expire-iceberg",
        "--keep-last", "1",
    )
    assert exp2["expired_snapshots"] == 0 and exp2["kept_snapshots"] == 1

    # sync-iceberg: already in sync after the export above -> no-op
    sync = _run(capsys, "--table", t.path, "--op", "sync-iceberg")
    assert sync["synced"] is False and sync["metadata"] is None

    # the Delta twins: export lands commit 0, sync no-ops, checkpoint
    # writes the parquet + _last_checkpoint and cleans subsumed commits
    dexp = _run(capsys, "--table", t.path, "--op", "export-delta")
    assert dexp["commit"].endswith("00000000000000000000.json")
    from datax_spark.lake.delta import read_delta

    assert read_delta(spark, os.path.abspath(t.path)).count() == 6
    dsync = _run(capsys, "--table", t.path, "--op", "sync-delta")
    assert dsync["synced"] is False and dsync["commit"] is None
    dck = _run(capsys, "--table", t.path, "--op", "checkpoint-delta")
    assert os.path.exists(dck["checkpoint"])
    assert dck["removed_commits"] == 0  # nothing below checkpoint 0
    assert read_delta(spark, os.path.abspath(t.path)).count() == 6


def test_sync_iceberg_rest_flag(spark, tmp_path, capsys):
    """--op sync-iceberg --rest-url publishes through the REST catalog:
    first call registers, a later call commits the new snapshot, and
    loadTable tracks the lake head."""
    from datax_spark.lake.rest_catalog import (
        IcebergRestCatalogServer,
        RestCatalog,
    )

    t = _table(spark, tmp_path)
    with IcebergRestCatalogServer() as srv:
        out = _run(
            capsys, "--table", t.path, "--op", "sync-iceberg",
            "--rest-url", srv.url, "--rest-table", "t",
        )
        assert out["synced"] is True
        cat = RestCatalog(srv.url)
        assert cat.list_tables("lake") == ["t"]
        v0 = cat.load_table("lake", "t")["metadata"]["current-snapshot-id"]
        merge_apply(
            t,
            spark.createDataFrame(
                [("k0", "insert", 99, "nv")],
                "k string, op string, seq long, v string",
            ),
            99,
        )
        out = _run(
            capsys, "--table", t.path, "--op", "sync-iceberg",
            "--rest-url", srv.url, "--rest-table", "t",
        )
        assert out["synced"] is True
        meta = cat.load_table("lake", "t")["metadata"]
        assert meta["current-snapshot-id"] == t.current_version() > v0


def test_cdc_apply_job_sync_flags(spark, tmp_path, capsys):
    """jobs/cdc_apply_job.py --sync-iceberg dv --sync-delta
    --change-data: the batch loop publishes BOTH open-format mirrors
    per committed batch, and the reads back through each format equal
    the engine's."""
    import jobs.cdc_apply_job as job
    from pyspark.sql import functions as F

    from datax_spark.lake.delta import read_delta, read_delta_changes
    from datax_spark.lake.iceberg import _load_metadata, read_iceberg
    from datax_spark.sources.changelog import (
        generate_changelog,
        write_segments,
    )

    root = str(tmp_path)
    log = generate_changelog(
        spark, n_events=2000, n_keys=300, events_per_segment=1000
    )
    write_segments(log, os.path.join(root, "log"))
    tdir = os.path.join(root, "table")
    rc = job.main([
        "--log-dir", os.path.join(root, "log"),
        "--table", tdir, "--create", "--buckets", "4", "--mor",
        "--quarantine", os.path.join(root, "q"),
        "--sync-iceberg", "dv", "--sync-delta", "--change-data",
    ])
    assert rc == 0
    capsys.readouterr()
    from datax_spark.lake.mor import MorTable

    mor = MorTable(spark, tdir)
    loc = os.path.abspath(tdir)
    meta = _load_metadata(loc)
    assert meta["format-version"] == 3
    assert len(meta["snapshots"]) >= 2  # one per committed batch

    def rows(df):
        return [
            tuple(r)
            for r in df.select("repo", "path", "commit", "content")
            .orderBy("repo", "path", "commit").collect()
        ]

    assert rows(read_iceberg(spark, loc)) == rows(mor.read())
    assert rows(read_delta(spark, loc)) == rows(mor.read())
    # CDF flowed per commit
    assert read_delta_changes(
        spark, loc, from_version=0
    ).count() > 0
    # guards
    assert job.main(["--log-dir", "x", "--table", "y",
                     "--rest-url", "http://x"]) == 2
    assert job.main(["--log-dir", "x", "--table", "y",
                     "--change-data"]) == 2
    assert job.main(["--log-dir", "x", "--table", "y", "--scd2",
                     "--sync-delta"]) == 2
