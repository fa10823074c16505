"""spark-submit entry point for the CDC apply engine.

Cluster usage (the north-rule deployment shape):

    python tools/make_pyfiles.py                     # -> dist/datax_spark.zip
    spark-submit --master <cluster> \\
        --num-executors <N> --executor-cores 4 --executor-memory 8g \\
        --py-files dist/datax_spark.zip \\
        jobs/cdc_apply_job.py --log-dir <events> --table <lake-table> \\
        [--streaming --checkpoint <dir>] [--create --buckets 256]

Run the same job at N and 4N executors on the same input to measure
scaling efficiency (tools/scaling_bench.py does this locally with
local[2] vs local[8] cores).

Local smoke:

    python jobs/cdc_apply_job.py --demo
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--log-dir", help="change-log dir (seg=N parquet subdirs)")
    p.add_argument("--table", help="lake table path")
    p.add_argument("--create", action="store_true", help="create the table first")
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--streaming", action="store_true",
                   help="tail via Structured Streaming instead of batch loop")
    p.add_argument("--checkpoint", help="streaming checkpoint dir")
    p.add_argument("--quarantine", help="quarantine dir")
    p.add_argument("--metrics", help="metrics JSONL path")
    p.add_argument("--error-record-limit", type=int)
    p.add_argument("--error-pct-limit", type=float)
    p.add_argument("--max-events-per-sec", type=float)
    p.add_argument("--max-bytes-per-sec", type=float)
    p.add_argument("--mor", action="store_true",
                   help="merge-on-read table mode (O(batch) appends)")
    p.add_argument("--write-mode", choices=["replace", "update"],
                   default="replace",
                   help="replace = whole-row PutRow; update = "
                        "partial-column UpdateRow patch (COW merges at "
                        "write; MOR coalesces at read)")
    p.add_argument("--delete-encoding", choices=["inline", "eq"],
                   default="inline",
                   help="MOR delete encoding: inline tombstone rows, or "
                        "eq = equality-delete files (narrow key+seq "
                        "files, Iceberg v2 analog; requires --mor)")
    p.add_argument("--auto-compact-ratio", type=float,
                   help="run the compaction policy after EVERY committed "
                        "batch (maybe_compact(max_delta_ratio=R) on MOR; "
                        "bin-packing on COW) — keeps resolved-read cost "
                        "flat over a long stream")
    p.add_argument("--scd2", action="store_true",
                   help="maintain an SCD type-2 HISTORY table instead of "
                        "latest-wins state: every event becomes a "
                        "validity interval (_valid_from/_valid_to), "
                        "deletes close intervals")
    p.add_argument("--constraint", action="append", default=[],
                   metavar="NAME=EXPR",
                   help="table CHECK constraint (repeatable): non-delete "
                        "rows where EXPR is FALSE quarantine as "
                        "constraint:NAME (applies at --create)")
    p.add_argument("--dedup-within", metavar="DURATION",
                   help="streaming only: suppress at-least-once source "
                        "redeliveries by event identity (key+seq) within "
                        "this watermark horizon, e.g. '10 minutes'")
    p.add_argument("--ddl", action="store_true",
                   help="consume Maxwell table-alter/create messages as "
                        "additive schema evolution before each batch's "
                        "apply (requires --envelope maxwell; "
                        "streaming/ddl.py)")
    p.add_argument("--envelope", choices=["debezium", "canal", "maxwell"],
                   help="segments are JSON-LINES binlog dumps in this "
                        "envelope format (parsed in the scan stage) "
                        "instead of parquet changelog files")
    p.add_argument("--rollup", metavar="PATH",
                   help="maintain a per-repo rollup table at PATH from the "
                        "change feed after the apply (created if absent; "
                        "fenced on the source version, so re-runs never "
                        "double-count)")
    p.add_argument("--sync-iceberg", choices=["eq", "pos", "dv"],
                   metavar="ENCODING",
                   help="publish every committed batch as an Apache "
                        "Iceberg snapshot (on_commit hook; eq = v2 "
                        "equality deletes, pos = v2 position deletes, "
                        "dv = v3 deletion vectors)")
    p.add_argument("--sync-delta", action="store_true",
                   help="publish every committed batch as a Delta Lake "
                        "commit (on_commit hook)")
    p.add_argument("--change-data", action="store_true",
                   help="with --sync-delta: also write spec Change Data "
                        "Feed files per commit")
    p.add_argument("--rest-url",
                   help="with --sync-iceberg: ALSO publish each snapshot "
                        "through an Iceberg REST catalog at this URL")
    p.add_argument("--rest-namespace", default="lake")
    p.add_argument("--rest-table",
                   help="catalog table name (default: table dir basename)")
    p.add_argument("--rest-token", help="bearer token for --rest-url")
    p.add_argument("--demo", action="store_true",
                   help="self-contained local demo on a generated log")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from pyspark.sql.types import StringType, StructField, StructType

    from datax_spark.config import get_spark
    from datax_spark.lake.table import LakeTable
    from datax_spark.quality.quarantine import ErrorLimit
    from datax_spark.streaming.pipeline import (
        PipelineConfig,
        apply_segments,
        tail_and_apply,
    )

    spark = get_spark("cdc-apply")
    schema = StructType(
        [StructField(c, StringType())
         for c in ["repo", "path", "commit", "lang", "content"]]
    )

    if args.demo:
        import tempfile

        from datax_spark.sources.changelog import generate_changelog, write_segments

        root = tempfile.mkdtemp(prefix="cdc_demo_")
        args.log_dir = os.path.join(root, "log")
        args.table = os.path.join(root, "table")
        args.create = True
        write_segments(
            generate_changelog(spark, n_events=200_000, n_keys=25_000,
                               events_per_segment=50_000), args.log_dir,
        )
        print(f"demo log + table under {root}")

    if not args.log_dir or not args.table:
        print("--log-dir and --table are required (or --demo)", file=sys.stderr)
        return 2

    from datax_spark.lake.mor import MorTable

    bad = [c for c in args.constraint if "=" not in c]
    if bad:
        print(f"--constraint must be NAME=EXPR, got: {bad}", file=sys.stderr)
        return 2
    constraints = dict(c.split("=", 1) for c in args.constraint)
    if args.scd2 and args.mor:
        print("--scd2 is a COW history layout; drop --mor", file=sys.stderr)
        return 2
    if args.scd2 and (args.sync_iceberg or args.sync_delta):
        print("--sync-iceberg/--sync-delta mirror the latest-wins state "
              "table; the SCD2 history layout has no mirror analog — "
              "drop one of the two", file=sys.stderr)
        return 2
    if args.rest_url and not args.sync_iceberg:
        print("--rest-url requires --sync-iceberg", file=sys.stderr)
        return 2
    if args.change_data and not args.sync_delta:
        print("--change-data requires --sync-delta", file=sys.stderr)
        return 2
    if args.scd2:
        from datax_spark.operators.scd2 import create_scd2_table

        if args.create and not LakeTable.exists(args.table):
            table = create_scd2_table(
                spark, args.table, schema,
                natural_key=["repo", "path", "commit"],
                bucket_key="repo", num_buckets=args.buckets,
                constraints=constraints,
            )
        else:
            table = LakeTable(spark, args.table)
    else:
        cls = MorTable if args.mor else LakeTable
        if args.create and not LakeTable.exists(args.table):
            table = cls.create(
                spark, args.table, schema,
                key_cols=["repo", "path", "commit"],
                bucket_key="repo", num_buckets=args.buckets,
                constraints=constraints,
            )
        else:
            table = cls(spark, args.table)

    on_commit = []
    if args.sync_iceberg and args.rest_url:
        from datax_spark.lake.rest_catalog import (
            RestCatalog,
            sync_iceberg_rest,
        )

        _cat = RestCatalog(args.rest_url, token=args.rest_token)
        _name = args.rest_table or os.path.basename(
            os.path.abspath(args.table)
        )
        on_commit.append(
            lambda m: sync_iceberg_rest(
                table, _cat, args.rest_namespace, _name,
                delete_files=args.sync_iceberg,
            )
        )
    elif args.sync_iceberg:
        from datax_spark.lake.iceberg import sync_iceberg

        on_commit.append(
            lambda m: sync_iceberg(table, delete_files=args.sync_iceberg)
        )
    if args.sync_delta:
        from datax_spark.lake.delta import sync_delta

        on_commit.append(
            lambda m: sync_delta(table, change_data=args.change_data)
        )

    cfg = PipelineConfig(
        on_commit=on_commit,
        quarantine_dir=args.quarantine,
        error_limit=ErrorLimit(record=args.error_record_limit,
                               percentage=args.error_pct_limit),
        metrics_path=args.metrics,
        max_events_per_sec=args.max_events_per_sec,
        max_bytes_per_sec=args.max_bytes_per_sec,
        write_mode=args.write_mode,
        delete_encoding=args.delete_encoding,
        auto_compact=args.auto_compact_ratio is not None,
        compact_options=(
            {"max_delta_ratio": args.auto_compact_ratio}
            if args.auto_compact_ratio is not None else {}
        ),
    )

    from pyspark.sql.types import IntegerType, LongType, TimestampType

    ev_schema = StructType(
        [StructField(c, StringType())
         for c in ["repo", "path", "commit", "lang", "content", "op"]]
        + [StructField("seq", LongType()),
           StructField("ts", TimestampType()),
           StructField("batch_file", IntegerType())]
    )
    if args.streaming and not args.checkpoint:
        print("--checkpoint required with --streaming", file=sys.stderr)
        return 2
    if args.envelope and args.dedup_within:
        print("--dedup-within needs the log's ts column, which the parsed "
              "envelope changelog does not carry; drop one of the two",
              file=sys.stderr)
        return 2
    if args.ddl and args.envelope != "maxwell":
        print("--ddl needs --envelope maxwell (the only format carrying "
              "typed schema-change messages)", file=sys.stderr)
        return 2
    if args.ddl and args.scd2 and args.streaming:
        print("--ddl + --scd2 is batch-only (the streaming SCD2 tail "
              "fuses a fixed parse schema into its plan); drop "
              "--streaming", file=sys.stderr)
        return 2

    if args.ddl and args.scd2:
        from datax_spark.operators.scd2 import apply_segments_scd2

        results = apply_segments_scd2(
            spark, table, args.log_dir, quarantine_dir=args.quarantine,
            envelope=args.envelope, ddl=True,
        )
        for r in results:
            print(json.dumps({"version": r.version, "applied": r.applied,
                              "affected_buckets": len(r.affected_buckets)}))
    elif args.ddl and args.streaming:
        from datax_spark.streaming.ddl import tail_and_apply_ddl

        tail_and_apply_ddl(spark, args.table, args.log_dir, args.checkpoint,
                           config=cfg)
    elif args.ddl:
        from datax_spark.streaming.ddl import apply_segments_ddl

        for m in apply_segments_ddl(spark, table, args.log_dir, config=cfg):
            print(m.to_json())
    elif args.scd2 and args.streaming:
        from datax_spark.operators.scd2 import tail_and_apply_scd2

        tail_and_apply_scd2(spark, args.table, args.log_dir, args.checkpoint,
                            schema if args.envelope else ev_schema,
                            quarantine_dir=args.quarantine,
                            dedup_within=args.dedup_within,
                            envelope=args.envelope)
    elif args.scd2:
        from datax_spark.operators.scd2 import apply_segments_scd2

        results = apply_segments_scd2(
            spark, table, args.log_dir, quarantine_dir=args.quarantine,
            envelope=args.envelope,
        )
        for r in results:
            print(json.dumps({"version": r.version, "applied": r.applied,
                              "affected_buckets": len(r.affected_buckets)}))
    elif args.streaming:
        tail_and_apply(spark, args.table, args.log_dir, args.checkpoint,
                       schema if args.envelope else ev_schema, config=cfg,
                       dedup_within=args.dedup_within, envelope=args.envelope)
    else:
        metrics = apply_segments(spark, table, args.log_dir, config=cfg,
                                 envelope=args.envelope)
        for m in metrics:
            print(m.to_json())

    if args.rollup:
        from datax_spark.operators.rollup import (
            create_rollup_table,
            refresh_rollup,
        )

        agg = (
            LakeTable(spark, args.rollup)
            if LakeTable.exists(args.rollup)
            else create_rollup_table(spark, args.rollup)
        )
        res = refresh_rollup(table, agg)
        print(json.dumps({
            "rollup_refreshed": bool(res and res.applied),
            "rollup_rows": agg.count(),
        }))

    print(json.dumps({"final_rows": table.count(),
                      "version": table.current_version()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
