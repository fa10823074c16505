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


# ---------------------------------------------------------------------------
# Fat-topic composition: per-table DDL inside the router
# (streaming/router.py) — one multiplexed binlog stream where EACH source
# table evolves independently.
# ---------------------------------------------------------------------------


def evolve_routed_ddl(
    tables: dict[str, LakeTable],
    raw: DataFrame,
    envelope: str = "maxwell",
    on_unknown: str = "error",
    max_ddl_events: int = 10_000,
) -> dict[str, list[StructField]]:
    """Consume a fat-topic batch's DDL events into each REGISTERED
    table's own additive evolution. ONE narrow DDL scan covers every
    table (O(#ddl) driver rows); returns {table: fields added}.

    ``on_unknown`` mirrors the router's data-plane contract: 'error'
    raises on DDL for a table nobody registered (the deployment bug
    surfaces at the ALTER, before any data row arrives), 'skip' ignores
    it (the Debezium topic-routing behavior)."""
    from datax_spark.sources.envelope import ddl_from_maxwell, mysql_type_to_spark

    if envelope != "maxwell":
        raise ValueError(
            f"envelope {envelope!r} carries no typed schema-change "
            "messages — only 'maxwell' supports mid-stream DDL here"
        )
    if on_unknown not in ("error", "skip"):
        raise ValueError(f"unknown on_unknown {on_unknown!r}")
    rows = (
        ddl_from_maxwell(raw)
        .select("table", "columns")
        .limit(max_ddl_events + 1)
        .collect()
    )
    if len(rows) > max_ddl_events:
        raise ValueError(
            f"batch carries more than {max_ddl_events} DDL events — this "
            "is not a binlog control plane; check the stream routing"
        )
    per_table: dict[str, dict[str, StructField]] = {}
    for r in rows:
        name = r["table"]
        tbl = tables.get(name)
        if tbl is None:
            if on_unknown == "error":
                from datax_spark.streaming.router import UnroutableTableError

                raise UnroutableTableError(
                    f"DDL event for unregistered table {name!r} "
                    f"(registered: {sorted(tables)})"
                )
            continue
        existing = {f.name for f in tbl.snapshot().schema.fields}
        bucket = per_table.setdefault(name, {})
        for c in r["columns"] or []:
            cname = c["name"]
            if cname is None or cname in existing or cname in bucket:
                continue
            bucket[cname] = StructField(
                cname, mysql_type_to_spark(c["type"]), True
            )
    added: dict[str, list[StructField]] = {}
    for name, fields in per_table.items():
        if fields:
            tables[name].add_columns(list(fields.values()))
            added[name] = list(fields.values())
    return added


def apply_batch_routed_ddl(
    tables: dict[str, LakeTable],
    raw: DataFrame,
    batch_id: int,
    config: PipelineConfig | None = None,
    envelope: str = "maxwell",
    table_col: str | None = None,
    on_unknown: str = "error",
):
    """Routed evolve-then-apply for one raw fat-topic micro-batch: each
    registered table consumes ITS OWN table-alter events, then the batch
    parses ONCE against the post-evolution union payload schema and fans
    out through the router's per-table fenced applies. A column added to
    table A while table B owns the same name at a different type raises
    at the union step — one stream cannot carry both (router contract).
    """
    from datax_spark.sources.envelope import MAXWELL_CONTROL_TYPES
    from datax_spark.streaming.router import (
        TABLE_COL,
        apply_batch_routed,
        union_payload_schema,
    )

    tcol = table_col or TABLE_COL
    evolve_routed_ddl(tables, raw, envelope, on_unknown)
    schema = union_payload_schema(tables)
    parsed = parse_envelope(raw, envelope, schema, table_col=tcol)
    parsed = parsed.filter(~F.col("op").isin(*MAXWELL_CONTROL_TYPES))
    return apply_batch_routed(
        tables, parsed, batch_id, config, table_col=tcol,
        on_unknown=on_unknown,
    )


def tail_and_apply_routed_ddl(
    spark: SparkSession,
    tables: dict[str, LakeTable],
    log_dir: str,
    checkpoint_dir: str,
    config: PipelineConfig | None = None,
    envelope: str = "maxwell",
    on_unknown: str = "error",
    max_files_per_trigger: int = 1,
    timeout_sec: float = 120.0,
    results: list | None = None,
):
    """Streaming twin of ``apply_batch_routed_ddl``: raw-text tail (the
    union parse schema can change at any micro-batch, so parsing lives in
    the sink, not the plan), per-batch per-table evolution, routed fenced
    applies. Pass ``results`` to collect the ``RoutedBatch`` outcomes."""
    cfg = config or PipelineConfig()

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        rb = apply_batch_routed_ddl(
            tables, batch_df, batch_id, cfg, envelope,
            on_unknown=on_unknown,
        )
        if results is not None:
            results.append(rb)

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
