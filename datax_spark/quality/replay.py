"""Quarantine replay: repair dirty rows and re-inject them, fenced.

DataX only *collects* dirty records (StdoutPluginCollector.java:22-74) —
operators then fix and re-run the slice by hand. Here the re-injection is
a first-class, exactly-once operation:

1. read the quarantine parquet log, EXCLUDING batches a previous replay
   already consumed (a `_replayed.json` ledger makes replay idempotent);
2. record an INTENT (chosen replay batch_id + source batches) in the
   ledger BEFORE applying;
3. apply the caller's repair function (DataFrame -> DataFrame, pure
   column ops — e.g. op remapping, null backfill);
4. push the repaired rows through the SAME apply path as live traffic
   (``apply_batch``): still-dirty rows re-quarantine under the NEW batch
   id, clean rows dedup+merge with the usual batch-id fence;
5. mark the intent consumed after success.

A crashed replay is safe BECAUSE of the intent record: a re-run resumes
the pending intent's batch_id (not last_batch_id+1), so if the previous
attempt crashed after the merge committed, the fence makes the re-apply
a genuine no-op — no duplicate batch, no double hooks/metrics/versions.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from datax_spark.quality.quarantine import REASON_COL
from datax_spark.streaming.pipeline import (
    BatchMetrics,
    PipelineConfig,
    apply_batch,
)

LEDGER = "_replayed.json"


def _read_ledger(quarantine_dir: str) -> dict:
    path = os.path.join(quarantine_dir, LEDGER)
    if not os.path.exists(path):
        return {"batches": [], "replays": []}
    with open(path) as f:
        return json.load(f)


def _write_ledger(quarantine_dir: str, ledger: dict) -> None:
    path = os.path.join(quarantine_dir, LEDGER)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(ledger, f, sort_keys=True)
    os.replace(tmp, path)


def pending_batches(spark, quarantine_dir: str) -> list[int]:
    """Quarantined source batch ids a replay has not yet consumed."""
    if not os.path.isdir(quarantine_dir):
        return []
    done = set(_read_ledger(quarantine_dir)["batches"])
    df = spark.read.option("pathGlobFilter", "*.parquet").parquet(quarantine_dir)
    got = {int(r["_batch_id"]) for r in df.select("_batch_id").distinct().collect()}
    return sorted(got - done)


def replay_quarantine(
    table,
    quarantine_dir: str,
    repair_fn=None,
    batch_id: int | None = None,
    config: PipelineConfig | None = None,
    source_batches: list[int] | None = None,
) -> BatchMetrics | None:
    """Repair + re-inject quarantined rows through the live apply path.

    ``repair_fn``: DataFrame -> DataFrame over the ORIGINAL event columns
    (reason/_batch_id stripped first). ``batch_id`` defaults to
    last_batch_id+1 on the config's stream. Returns the BatchMetrics of
    the replay apply, or None when nothing is pending.
    """
    cfg = config or PipelineConfig()
    spark = table.spark
    ledger = _read_ledger(quarantine_dir) if os.path.isdir(quarantine_dir) else {
        "batches": [], "replays": []
    }
    intent = ledger.get("intent")
    if intent is not None:
        # A prior replay crashed between intent and completion: finish it
        # with the SAME batch_id so the merge fence dedupes if the crashed
        # attempt already committed.
        todo = [int(b) for b in intent["sources"]]
        batch_id = int(intent["batch_id"])
    else:
        todo = [int(b) for b in (source_batches or pending_batches(spark, quarantine_dir))]
        if not todo:
            return None
        if batch_id is None:
            last = table.last_batch_id(cfg.stream_id)
            batch_id = (last if last is not None else -1) + 1
        ledger["intent"] = {"batch_id": int(batch_id), "sources": todo}
        _write_ledger(quarantine_dir, ledger)
    df = (
        spark.read.option("pathGlobFilter", "*.parquet")
        .parquet(quarantine_dir)
        .filter(F.col("_batch_id").isin(todo))
        .drop(REASON_COL, "_batch_id")
    )
    if repair_fn is not None:
        df = repair_fn(df)
    metrics = apply_batch(table, df, batch_id, cfg)
    ledger = _read_ledger(quarantine_dir)
    ledger["batches"] = sorted(set(ledger["batches"]) | set(todo))
    ledger["replays"].append(
        {"batch_id": int(batch_id), "sources": todo,
         "applied": bool(metrics.applied)}
    )
    ledger.pop("intent", None)
    _write_ledger(quarantine_dir, ledger)
    return metrics
