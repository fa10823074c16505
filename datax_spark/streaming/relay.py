"""CDC relay: incremental lake -> Debezium-envelope segments -> lake.

The outbound twin of the segment tailer (sources/changelog.write_segments
feeds tail_and_apply; emit_changes_segments feeds any Debezium consumer,
including another LakeTable via apply_emitted_segments). Together they
close the reference's replication loop — DataX jobs shuttle RDBMS
changelogs between systems (e.g. otsstreamreader -> odpswriter); here
the lake itself is both ends of the bus.

Delivery contract: emit is AT-LEAST-ONCE (the cursor advances only
after a segment dir is fully published, so a crash re-emits the same
versions into the same dirs — an atomic replace); apply is EXACTLY-ONCE
(each segment applies under batch_id = its commit version, so the
target's stream fence turns redeliveries into no-ops). End to end the
relay is exactly-once without any coordination between the two sides.

Scale shape: one read_changes call covers all pending commits and diffs
ONLY the buckets whose manifests changed; the envelope write is one
Spark job partitioned by commit version. The cursor is O(1) driver
state; no listing of the (unbounded) emitted history is ever needed.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from datax_spark.lake.table import LakeTable
from datax_spark.sources.envelope import from_debezium, to_debezium

CURSOR_FILE = "_cursor.json"


def _read_cursor(out_dir: str) -> int | None:
    p = os.path.join(out_dir, CURSOR_FILE)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(json.load(f)["emitted_version"])


def _write_cursor(out_dir: str, version: int) -> None:
    p = os.path.join(out_dir, CURSOR_FILE)
    tmp = p + f".tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump({"emitted_version": version}, f)
    os.replace(tmp, p)


def emit_changes_segments(
    table: LakeTable,
    out_dir: str,
    from_version: int | None = None,
) -> list[tuple[int, str]]:
    """Emit every not-yet-emitted commit as one Debezium JSON-lines
    segment dir (``v=<version>/part-*.txt``), advancing the cursor.

    First call starts from ``from_version`` (default: version 1, i.e.
    the table's full history replays as changes from empty); later calls
    resume from the cursor. Returns [(version, segment_dir), ...] in
    commit order; [] when nothing is pending. Segment mtimes ascend with
    version so file-source consumers see commit order, matching
    write_segments' replay-order contract.
    """
    os.makedirs(out_dir, exist_ok=True)
    cur = table.current_version()
    start = _read_cursor(out_dir)
    if start is None:
        start = from_version if from_version is not None else 1
    if cur <= start:
        return []
    feed = table.read_changes(start, cur)
    env = to_debezium(feed, table.snapshot().properties["key_cols"])
    stage = os.path.join(out_dir, f"_stage.{uuid.uuid4().hex}")
    (
        env.select("value", "_commit_version")
        .write.partitionBy("_commit_version")
        .format("text")
        .save(stage)
    )
    out: list[tuple[int, str]] = []
    now = time.time()
    for v in range(start + 1, cur + 1):
        src = os.path.join(stage, f"_commit_version={v}")
        dst = os.path.join(out_dir, f"v={v}")
        if os.path.exists(dst):  # crash re-emit: atomic replace
            old = dst + f".old.{uuid.uuid4().hex}"
            os.rename(dst, old)
            shutil.rmtree(old)
        if os.path.isdir(src):
            os.rename(src, dst)
        else:
            # a commit that produced no net changes (e.g. metadata-only)
            # still gets an empty segment dir so the consumer's version
            # sequence has no holes
            os.makedirs(dst, exist_ok=True)
        ts = now + (v - start)
        for f_ in sorted(os.listdir(dst)):
            os.utime(os.path.join(dst, f_), (ts, ts))
        os.utime(dst, (ts, ts))
        out.append((v, dst))
    shutil.rmtree(stage, ignore_errors=True)
    _write_cursor(out_dir, cur)
    return out


def emit_changes_kafka(
    table: LakeTable,
    host: str,
    port: int,
    topic: str,
    cursor_dir: str,
    from_version: int | None = None,
    codec: str = "gzip",
    batch_size: int = 500,
    value_format: str = "json",
    schema_id: int | None = None,
    avro_schema: str | None = None,
) -> list[int]:
    """Publish every not-yet-emitted commit to a Kafka topic as Debezium
    envelopes — the wire-transport twin of
    ``emit_changes_segments`` (same change feed, same envelopes, but the
    bus is the real Produce protocol via ``sources/kafka_live`` instead
    of a segment directory). Pair with ``tail_kafka_and_apply`` on the
    consumer side for a complete lake -> Kafka -> lake replication loop.

    Delivery contract: the transport is AT-LEAST-ONCE — the cursor
    advances only after EVERY record of the window produced cleanly (any
    produce error raises and leaves the cursor, so the next call
    re-emits the whole window, possibly extended by newer commits).
    End-state convergence still holds without a consumer fence keyed to
    versions: envelopes carry ``source.lsn`` = commit version (a key
    changes at most once per commit), messages are keyed by the table
    key so the DefaultPartitioner keeps per-key order, and the apply
    side's latest-wins dedup is idempotent in that seq — a re-emitted
    window only ever replays images the target already holds or newer.
    Per-ROW delivery is not exactly-once (duplicates on the topic are
    expected after a crash); the TABLE STATE is.

    ``value_format``: ``'json'`` sends the envelope text (Connect's
    JsonConverter shape); ``'confluent_avro'`` encodes each envelope as
    Confluent-framed Avro under ``avro_schema`` registered as
    ``schema_id`` (build the schema with
    ``envelope_avro.debezium_avro_schema(payload_schema)``) — the
    consumer passes the same ``{schema_id: avro_schema}`` map (or a
    registry URL) to ``tail_kafka_and_apply(value_format=
    'confluent_avro')``.

    Scale shape: one ``read_changes`` covers the window and diffs only
    buckets whose manifests changed; the produce is executor-parallel,
    one task per Kafka partition. Cursor is O(1) driver state. Returns
    the list of commit versions emitted ([] when up to date).
    """
    from datax_spark.sources.kafka_live import kafka_write

    if value_format not in ("json", "confluent_avro"):
        raise ValueError(
            f"value_format {value_format!r}: 'json' or 'confluent_avro'"
        )
    if value_format == "confluent_avro" and (
        schema_id is None or avro_schema is None
    ):
        raise ValueError(
            "value_format='confluent_avro' needs schema_id and avro_schema"
        )
    os.makedirs(cursor_dir, exist_ok=True)
    cur = table.current_version()
    start = _read_cursor(cursor_dir)
    if start is None:
        start = from_version if from_version is not None else 1
    if cur <= start:
        return []
    feed = table.read_changes(start, cur)
    env = to_debezium(feed, table.snapshot().properties["key_cols"])
    if value_format == "confluent_avro":
        from datax_spark.sources.envelope_avro import json_values_to_avro

        env = json_values_to_avro(env, schema_id, avro_schema)
    totals = kafka_write(
        env,
        host,
        port,
        topic,
        order_col="_commit_version",
        codec=codec,
        batch_size=batch_size,
    )
    if totals["errors"]:
        raise RuntimeError(
            f"kafka emit failed for versions ({start}, {cur}]: {totals} — "
            "cursor not advanced; the next call re-emits the window"
        )
    _write_cursor(cursor_dir, cur)
    return list(range(start + 1, cur + 1))


def apply_emitted_segments(
    spark: SparkSession,
    target: LakeTable,
    emit_dir: str,
    payload_schema: StructType,
    config: Any | None = None,
    stream_id: str = "relay",
) -> list[int]:
    """Consume emitted segment dirs in version order, applying each
    under ``batch_id = commit version`` — the target's stream fence
    makes redelivered segments no-ops, so relay delivery is
    exactly-once end to end. Returns the versions actually applied."""
    from datax_spark.streaming.pipeline import PipelineConfig, apply_batch

    cfg = config or PipelineConfig(stream_id=stream_id)
    if not os.path.isdir(emit_dir):
        return []
    versions = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(emit_dir)
        if d.startswith("v=") and os.path.isdir(os.path.join(emit_dir, d))
    )
    applied: list[int] = []
    # skip already-fenced segments before touching any files: apply_batch
    # would no-op them anyway (fence is checked first, driver-side), but
    # a long-lived relay shouldn't pay O(emitted history) listings per call
    last = target.last_batch_id(cfg.stream_id)
    for v in versions:
        if last is not None and v <= last:
            continue
        seg = os.path.join(emit_dir, f"v={v}")
        if not any(f_.startswith("part-") for f_ in os.listdir(seg)):
            continue  # empty segment (no net changes in that commit)
        raw = spark.read.text(seg)
        parsed = from_debezium(raw, payload_schema)
        m = apply_batch(target, parsed, v, cfg)
        if m.applied:
            applied.append(v)
    return applied
