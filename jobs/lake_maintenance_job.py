"""spark-submit maintenance entry for lake tables.

The operational side of the engine as one CLI — the DataX analog is the
job-level preSql/postSql + the odps lifecycle commands, re-expressed as
table maintenance:

    python jobs/lake_maintenance_job.py --table <path> --op fsck
    ... --op vacuum [--keep-last 2] [--min-age-sec 3600]
    ... --op compact [--max-files-per-bucket 8]
    ... --op rewrite --cols event_time [--zorder] [--target-file-rows N]
    ... --op rebucket --buckets 256
    ... --op restore --version 42
    ... --op describe | history
    ... --op export-iceberg   (publish the snapshot as Apache Iceberg
                               v2 metadata in place; MOR must be
                               compacted first — lake/iceberg.py)
    ... --op expire-iceberg --keep-last 3
                              (drop old Iceberg snapshots; unpins their
                               lake versions from vacuum)
    ... --op sync-iceberg     (catch the Iceberg mirror up to the current
                               lake version; no-op when in sync or the
                               state is transiently unexportable)
    ... --op export-delta | sync-delta
                              (the Delta Lake twins — publish the
                               snapshot as the next _delta_log commit;
                               sync form no-ops when in sync/transient —
                               lake/delta.py)
    ... --op checkpoint-delta (write the spec parquet checkpoint +
                               _last_checkpoint, delete the subsumed
                               commit JSONs, and reclaim deletion-vector
                               files nothing references any more —
                               --min-age-sec guards racing exporters)

Every op prints ONE JSON line (machine-consumable, cron-friendly).
fsck/describe/history are driver-side metadata only — no Spark jobs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--table", required=True)
    p.add_argument("--op", required=True,
                   choices=["fsck", "vacuum", "compact", "rewrite",
                            "rebucket", "restore", "describe", "history",
                            "export-iceberg", "expire-iceberg",
                            "sync-iceberg", "export-delta", "sync-delta",
                            "checkpoint-delta"])
    p.add_argument("--keep-last", type=int, default=2)
    p.add_argument("--change-data", action="store_true",
                   help="export-delta/sync-delta: write spec change-data "
                        "files (delta.enableChangeDataFeed) per export")
    p.add_argument("--delete-files", choices=["eq", "pos", "dv"],
                   default="eq",
                   help="live-MOR Iceberg export encoding: equality "
                        "deletes (eq), one position-delete file (pos; "
                        "also expresses inline-tombstone states), or "
                        "format-version-3 deletion vectors (dv: Puffin "
                        "roaring bitmaps, incremental per changed bucket)")
    p.add_argument("--rest-url",
                   help="sync-iceberg: publish through an Iceberg REST "
                        "catalog at this URL instead of only the local "
                        "version-hint flow")
    p.add_argument("--rest-namespace", default="lake")
    p.add_argument("--rest-table",
                   help="catalog table name (default: table dir basename)")
    p.add_argument("--rest-token", help="bearer token for --rest-url")
    p.add_argument("--min-age-sec", type=float, default=0.0)
    p.add_argument("--max-files-per-bucket", type=int, default=8)
    p.add_argument("--cols", nargs="+", help="rewrite sort/z-order columns")
    p.add_argument("--zorder", action="store_true",
                   help="rewrite: Morton-interleave --cols instead of "
                        "lexicographic sort")
    p.add_argument("--target-file-rows", type=int, default=1_000_000)
    p.add_argument("--buckets", type=int, help="rebucket target count")
    p.add_argument("--version", type=int,
                   help="restore: target version (rewinds stream fences "
                        "with the state; history stays addressable)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from datax_spark.config import get_spark
    from datax_spark.lake.mor import MorTable
    from datax_spark.lake.table import LakeTable

    spark = get_spark("lake-maintenance")
    base = LakeTable(spark, args.table)
    is_mor = base.snapshot().properties.get("table_mode") == "mor"
    table = MorTable(spark, args.table) if is_mor else base

    if args.op == "fsck":
        out = table.fsck()
    elif args.op == "vacuum":
        out = table.vacuum(keep_last=args.keep_last, min_age_sec=args.min_age_sec)
    elif args.op == "compact":
        out = table.compact(max_files_per_bucket=args.max_files_per_bucket)
    elif args.op == "rewrite":
        if not args.cols:
            print("--op rewrite requires --cols", file=sys.stderr)
            return 2
        if args.zorder:
            snap = table.rewrite_zordered(args.cols, args.target_file_rows)
        else:
            snap = table.rewrite_clustered(args.cols, args.target_file_rows)
        out = {"version": snap.version}
    elif args.op == "rebucket":
        if not args.buckets:
            print("--op rebucket requires --buckets", file=sys.stderr)
            return 2
        out = {"version": table.rebucket(args.buckets).version}
    elif args.op == "restore":
        if args.version is None:
            print("--op restore requires --version", file=sys.stderr)
            return 2
        snap = table.restore(args.version)
        out = {"version": snap.version, "restored_to": args.version}
    elif args.op == "export-iceberg":
        from datax_spark.lake.iceberg import export_iceberg, iceberg_plan

        meta_path = export_iceberg(table, delete_files=args.delete_files)
        plan = iceberg_plan(os.path.abspath(args.table))
        out = {
            "metadata": meta_path,
            "snapshot_id": plan["snapshot_id"],
            "files": len(plan["files"]),
            "rows": plan["total_rows"],
        }
    elif args.op == "expire-iceberg":
        from datax_spark.lake.iceberg import expire_iceberg

        out = expire_iceberg(table, keep_last=args.keep_last)
    elif args.op == "sync-iceberg":
        if args.rest_url:
            from datax_spark.lake.rest_catalog import (
                RestCatalog,
                sync_iceberg_rest,
            )

            meta_path = sync_iceberg_rest(
                table,
                RestCatalog(args.rest_url, token=args.rest_token),
                args.rest_namespace,
                args.rest_table or os.path.basename(
                    os.path.abspath(args.table)
                ),
                delete_files=args.delete_files,
            )
        else:
            from datax_spark.lake.iceberg import sync_iceberg

            meta_path = sync_iceberg(table, delete_files=args.delete_files)
        out = {
            "metadata": meta_path,
            "synced": meta_path is not None,
            "version": table.current_version(),
        }
    elif args.op == "export-delta":
        from datax_spark.lake.delta import export_delta

        out = {"commit": export_delta(table, change_data=args.change_data),
               "lake_version": table.current_version()}
    elif args.op == "sync-delta":
        from datax_spark.lake.delta import sync_delta

        commit = sync_delta(table, change_data=args.change_data)
        out = {
            "commit": commit,
            "synced": commit is not None,
            "version": table.current_version(),
        }
    elif args.op == "checkpoint-delta":
        from datax_spark.lake.delta import checkpoint_delta, clean_delta_log

        ckpt = checkpoint_delta(os.path.abspath(args.table))
        out = {
            "checkpoint": ckpt,
            **clean_delta_log(
                os.path.abspath(args.table),
                dv_min_age_sec=args.min_age_sec,
            ),
        }
    elif args.op == "describe":
        out = table.describe()
    else:  # history
        out = {"history": table.history()}
    print(json.dumps(out, default=str, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
