"""Sustained 50M-event protocol with a CONTINUOUS Delta-DV mirror.

VERDICT r4 item 4: PLANS §15c claims the per-batch Delta mask job is
O(changed buckets); prove it empirically at the BASELINE.md rounds-1-4
scale — 5 batches x 10M events, 5M keys, 64 buckets, local[32],
per-batch auto-compaction policy, and ``sync_delta(change_data=True)``
firing on every committed batch (CDF + deletion-vector publication per
commit, no compaction gate). The pass criterion is the per-batch apply
time staying FLAT as the table grows; the curve bending would mean the
mirror re-pays table-sized work each batch.

Per-batch wall times come from a timing hook appended AFTER sync_delta
in ``on_commit`` (hooks run in order per committed batch), so each
interval covers batch apply + compaction policy + the full mirror
publish.  The final state is cross-checked: the Delta mirror read back
through its own log must equal the MOR resolved read exactly.

``--mode ice`` runs the same protocol with the CONTINUOUS Iceberg
mirror instead (eq-encoded MOR + ``sync_iceberg`` per commit) — the
other open-format leg, same flatness criterion.

Run on an IDLE machine (NOTES.md one-Spark-workload rule):

    python tools/sustained_dv_bench.py [n_events] [n_batches] [--mode dv|ice]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    argv = list(sys.argv[1:])
    mode = "dv"
    if "--mode" in argv:
        i = argv.index("--mode")
        mode = argv[i + 1]
        del argv[i:i + 2]
    n_events = int(argv[0]) if len(argv) > 0 else 50_000_000
    n_batches = int(argv[1]) if len(argv) > 1 else 5
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

    from pyspark.sql.types import StringType, StructField, StructType

    from datax_spark.config import get_spark
    from datax_spark.lake.delta import read_delta, sync_delta
    from datax_spark.lake.mor import MorTable
    from datax_spark.sources.changelog import generate_changelog, write_segments
    from datax_spark.streaming.pipeline import PipelineConfig, apply_segments

    spark = get_spark(
        "sustained_dv", master=f"local[{CPUS}]", shuffle_partitions=2 * CPUS
    )
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="sustained_dv_")
    logdir = os.path.join(root, "log")
    write_segments(
        generate_changelog(
            spark,
            n_events=n_events,
            n_keys=n_events // 10,
            events_per_segment=n_events // n_batches,
            content_max_len=80,
            partitions=2 * CPUS,
        ),
        logdir,
    )
    os.sync()

    schema = StructType(
        [StructField(c, StringType()) for c in
         ["repo", "path", "commit", "lang", "content"]]
    )
    table = MorTable.create(
        spark, os.path.join(root, "dvd"), schema,
        ["repo", "path", "commit"], "repo", 64,
    )

    # Hooks run after the commit and BEFORE the auto-compaction policy
    # (pipeline.py), so per-batch attribution is: m.seconds = the apply
    # (from the returned BatchMetrics), sync_secs = the wrapped mirror
    # publish, and the interval residual = the PREVIOUS batch's
    # compaction + segment-read overhead. The post-compaction sync on
    # the next batch re-exports every compacted bucket (masked files
    # swap for clean ones) — the expected periodic spike.
    marks: list[float] = []
    sync_secs: list[float] = []

    if mode in ("ice", "icepos", "icedv"):
        from datax_spark.lake.iceberg import sync_iceberg

        encoding = {"ice": "eq", "icepos": "pos", "icedv": "dv"}[mode]

        def _publish() -> None:
            sync_iceberg(table, delete_files=encoding)
    elif mode == "mor":
        def _publish() -> None:  # no mirror: the plain-apply control
            pass
    else:
        def _publish() -> None:
            sync_delta(table, change_data=True)

    def _sync(_m) -> None:
        s0 = time.monotonic()
        _publish()
        sync_secs.append(round(time.monotonic() - s0, 2))
        marks.append(time.monotonic())

    t0 = time.monotonic()
    metrics = apply_segments(
        spark, table, logdir,
        config=PipelineConfig(
            auto_compact=True,
            delete_encoding="eq" if mode == "ice" else "inline",
            on_commit=[_sync],  # icepos/icedv mirror the inline stream
        ),
    )
    total = time.monotonic() - t0

    batch_secs = [
        round(b - a, 2) for a, b in zip([t0] + marks[:-1], marks)
    ]
    apply_secs = [round(m.seconds, 2) for m in metrics]
    per_batch = n_events // n_batches

    t0 = time.monotonic()
    n_resolved = table.read().count()
    read_sec = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    if mode in ("ice", "icepos", "icedv"):
        from datax_spark.lake.iceberg import read_iceberg

        n_mirror = read_iceberg(spark, table.path).count()
    elif mode == "mor":
        n_mirror = n_resolved
    else:
        n_mirror = read_delta(spark, table.path).count()
    delta_read_sec = round(time.monotonic() - t0, 2)
    assert n_mirror == n_resolved, (n_mirror, n_resolved)

    from datax_spark.lake.delta import _current_delta_version

    print(json.dumps({
        "protocol": f"sustained_{mode}",
        "n_events": n_events,
        "n_batches": n_batches,
        "batch_secs": batch_secs,
        "apply_secs": apply_secs,
        "sync_secs": sync_secs,
        "batch_ev_per_sec": [int(per_batch / s) for s in batch_secs],
        "total_sec": round(total, 2),
        "ev_per_sec": int(n_events / total),
        "final_rows": n_resolved,
        "mor_read_sec": read_sec,
        "mirror_read_sec": delta_read_sec,
        "delta_versions": (
            _current_delta_version(table.path) if mode == "dv" else None
        ),
        "cpus": CPUS,
    }, sort_keys=True))
    # a 50M run leaves ~14 GB of log + table + mirror under root —
    # reclaim it (two stale runs filled the sandbox disk once)
    import shutil

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
