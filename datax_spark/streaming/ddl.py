"""Mid-stream binlog DDL -> additive lake schema evolution.

The gap this closes: the envelope parsers project JSON against a FIXED
``from_json`` payload schema, so when the SOURCE table gains a column
mid-stream (ALTER TABLE ... ADD COLUMN), every later row's value for
that column is silently dropped — the classic fixed-schema CDC data-loss
mode. Maxwell (with ``output_ddl=true``) emits the schema change itself
as a ``table-alter`` message carrying the FULL post-alter column list
with declared MySQL types, so no SQL parsing is needed: the engine
consumes the DDL event, commits the new columns as a metadata-only
additive evolution (LakeTable.add_columns), and parses the batch's data
rows against the WIDENED schema.

Reference contrast: DataX jobs pin a column list at job.json compile
time (core/.../job/JobContainer.java schema handshake) — a mid-run
source ALTER either breaks the job or silently drops the column, and the
operator re-runs the job with a new config. Here the stream keeps
flowing and the lake table follows the source's schema additively.

Semantics (additive-only, Iceberg-style):

- NEW columns in a ``table-alter``/``table-create`` def are added as
  nullable; rows from before the alter read null (exactly the upstream
  database's semantics for rows never updated since the ALTER).
- DROPPED columns are kept (data rows stop carrying them -> null in new
  images under latest-wins). A true drop is an out-of-band
  ``drop_column`` decision, not something a binlog tail should do
  destructively on its own.
- TYPE CHANGES are ignored here when the mapped Spark type matches
  (int->bigint both map to long) and otherwise surface as a loud
  SchemaEvolutionError from add_columns — the data-path widening rules
  (operators/merge._evolve_schema) own type evolution.
- RENAMES are indistinguishable from drop+add in a def diff and apply as
  an ADD of the new name; reconcile with ``rename_column`` out-of-band
  if the old column's history must carry over.

Exactly-once: the schema commit is IDEMPOTENT (add_columns skips
already-present fields and publishes nothing when all are) and the data
apply is batch-id fenced, so a replayed micro-batch is a complete no-op
on both planes. A crash between the schema commit and the data apply
replays as no-op-evolve + fenced-apply.

Scale shape: the DDL scan is ONE extra narrow job per micro-batch (a
from_json projection + filter over the same text the data parse scans,
collecting only control-plane rows — bounded by ``max_ddl_events``);
the data path stays the usual parse -> dedup -> fenced merge with zero
per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField

from datax_spark.lake.table import LakeTable
from datax_spark.streaming.pipeline import (
    BatchMetrics,
    PipelineConfig,
    apply_batch,
    default_payload_schema,
    iter_pending_segments,
    parse_envelope,
)


def ddl_new_fields(
    table: LakeTable,
    raw: DataFrame,
    envelope: str = "maxwell",
    source_table: str | None = None,
    max_ddl_events: int = 10_000,
) -> list[StructField]:
    """The columns a raw batch's DDL events ADD relative to the table's
    current schema, with Spark types mapped from the declared MySQL
    types (sources/envelope.mysql_type_to_spark).

    Collects the DDL rows driver-side — control-plane events are rare by
    nature; ``max_ddl_events`` guards against a misrouted data stream
    masquerading as DDL (fails loudly instead of OOMing the driver)."""
    from datax_spark.sources.envelope import ddl_from_maxwell, mysql_type_to_spark

    if envelope != "maxwell":
        raise ValueError(
            f"envelope {envelope!r} carries no typed schema-change "
            "messages (Debezium routes DDL to a separate schema-history "
            "topic; Canal's isDdl messages carry raw SQL only) — only "
            "'maxwell' supports mid-stream DDL here"
        )
    ddl = ddl_from_maxwell(raw, table=source_table)
    rows = ddl.select("columns").limit(max_ddl_events + 1).collect()
    if len(rows) > max_ddl_events:
        raise ValueError(
            f"batch carries more than {max_ddl_events} DDL events — this "
            "is not a binlog control plane; check the stream routing"
        )
    existing = {f.name for f in table.snapshot().schema.fields}
    fields: list[StructField] = []
    seen: set[str] = set()
    for r in rows:
        for c in r["columns"] or []:
            name = c["name"]
            if name is None or name in existing or name in seen:
                continue
            seen.add(name)
            fields.append(StructField(name, mysql_type_to_spark(c["type"]), True))
    return fields


def apply_batch_ddl(
    table: LakeTable,
    raw: DataFrame,
    batch_id: int,
    config: PipelineConfig | None = None,
    envelope: str = "maxwell",
    source_table: str | None = None,
) -> BatchMetrics:
    """Evolve-then-apply for ONE raw JSON-lines micro-batch: consume the
    batch's DDL events into an additive schema commit, then parse the
    data rows against the table's (now widened) payload schema and
    MERGE-apply them fenced.

    Within-batch ordering needs no care: a pre-alter row simply lacks
    the new field in its JSON, and ``from_json`` reads absent fields as
    null — the same value the widened table assigns old rows.

    Control-plane message types (MAXWELL_CONTROL_TYPES) are CONSUMED
    here, not quarantined; genuinely unknown ops still flow to the
    dirty-record path unchanged."""
    from datax_spark.sources.envelope import MAXWELL_CONTROL_TYPES

    fields = ddl_new_fields(table, raw, envelope, source_table)
    if fields:
        table.add_columns(fields)
    payload = default_payload_schema(table)
    table_col = "_src_table" if source_table is not None else None
    parsed = parse_envelope(raw, envelope, payload, table_col=table_col)
    parsed = parsed.filter(~F.col("op").isin(*MAXWELL_CONTROL_TYPES))
    if source_table is not None:
        parsed = parsed.filter(F.col(table_col) == source_table).drop(table_col)
    return apply_batch(table, parsed, batch_id, config)


def apply_segments_ddl(
    spark: SparkSession,
    table: LakeTable,
    log_dir: str,
    config: PipelineConfig | None = None,
    start_after_batch: int | None = None,
    envelope: str = "maxwell",
    source_table: str | None = None,
) -> list[BatchMetrics]:
    """Batch driver twin of ``apply_segments(envelope=...)`` with
    mid-stream DDL consumption: one fenced apply per ``seg=N`` dir of
    JSON lines, each preceded by that segment's schema evolution."""
    cfg = config or PipelineConfig()
    out = []
    for seg_id, seg_path in iter_pending_segments(
        table, log_dir, cfg.stream_id, start_after_batch
    ):
        raw = spark.read.text(seg_path)
        out.append(
            apply_batch_ddl(table, raw, seg_id, cfg, envelope, source_table)
        )
    return out


def tail_and_apply_ddl(
    spark: SparkSession,
    table_path: str,
    log_dir: str,
    checkpoint_dir: str,
    config: PipelineConfig | None = None,
    max_files_per_trigger: int = 1,
    timeout_sec: float = 120.0,
    envelope: str = "maxwell",
    source_table: str | None = None,
):
    """Structured Streaming twin: tail a JSON-lines binlog dump and
    evolve-then-apply per micro-batch. Unlike ``tail_and_apply``'s
    envelope mode (which fuses the parse into the streaming plan at a
    FIXED schema), the stream here stays raw text and each micro-batch
    parses against the schema as of ITS OWN DDL horizon — the parse
    schema legitimately differs batch to batch, so it cannot live in the
    one-time streaming plan. Checkpoint resume + the batch-id fence give
    the usual exactly-once; a restart re-evolves idempotently."""
    cfg = config or PipelineConfig()

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        t = LakeTable(batch_df.sparkSession, table_path)
        apply_batch_ddl(t, batch_df, batch_id, cfg, envelope, source_table)

    reader = (
        spark.readStream.option("maxFilesPerTrigger", max_files_per_trigger)
        .option("latestFirst", "false")
    )
    query = (
        reader.text(log_dir + "/seg=*")
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(timeout_sec)
    if query.isActive:
        query.stop()
    return query
