"""CDC envelope parsers: Debezium / Canal JSON -> the engine changelog.

The north-rule ingest path is "binlog/WAL tail -> lake upsert". Real
binlog tails arrive as JSON envelopes from the two dominant open-source
capture stacks:

- **Debezium** (Kafka Connect): one envelope per row change —
  ``{"before": {...}|null, "after": {...}|null, "op": "c|u|d|r",
  "ts_ms": ..., "source": {"lsn"/"pos"/"ts_ms": ...}}``;
- **Canal** (Alibaba's MySQL binlog bridge — the same ecosystem as the
  DataX reference; its reader plugins consume RDS binlog the same way,
  e.g. otsstreamreader's tunnel records,
  otsstreamreader/.../model/StreamRecord semantics): one message per
  STATEMENT with row batches — ``{"data": [{...}, ...], "old": [...],
  "type": "INSERT|UPDATE|DELETE", "es": ..., "ts": ..., "id": ...}``.

Both parsers are pure Column expressions (``from_json`` + projection /
``explode``) — JVM-side, whole-stage-codegen, zero per-row Python — and
emit the engine's canonical changelog columns::

    <payload columns...>, op ('insert'|'update'|'delete'), seq (long)

so the output feeds ``apply_batch`` / ``tail_and_apply`` unchanged.
Unknown/DDL ops map to op='<raw>' which the quarantine path classifies
as dirty (invalid_op) rather than dropping silently — the DataX
dirty-record contract (SURVEY.md §2.5).

Scale shape: parsing is a map-only stage fused into the scan; the only
shuffle downstream is the usual dedup. Canal's per-statement row arrays
explode to one row per change BEFORE the shuffle, so hot statements
(bulk updates) parallelize like any other rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)


def _payload_cols(payload_schema: StructType, src: str) -> list[Column]:
    """Typed projection of an envelope image struct (all-string maps in
    Canal; typed structs in Debezium) onto the payload schema."""
    return [
        F.col(f"{src}.{f.name}").cast(f.dataType).alias(f.name)
        for f in payload_schema.fields
    ]


def debezium_envelope_schema(payload_schema: StructType) -> StructType:
    """The subset of the Debezium envelope this parser consumes."""
    return StructType(
        [
            StructField("before", payload_schema),
            StructField("after", payload_schema),
            StructField("op", StringType()),
            StructField("ts_ms", LongType()),
            StructField(
                "source",
                StructType(
                    [
                        StructField("lsn", LongType()),
                        StructField("file", StringType()),
                        StructField("pos", LongType()),
                        StructField("row", LongType()),
                        StructField("ts_ms", LongType()),
                        StructField("table", StringType()),
                    ]
                ),
            ),
        ]
    )


def from_debezium(
    raw: DataFrame,
    payload_schema: StructType,
    value_col: str = "value",
    seq_expr: Column | None = None,
    table_col: str | None = None,
) -> DataFrame:
    """Parse Debezium JSON envelopes into the canonical changelog.

    Op mapping (Debezium op codes): ``c``(create) / ``r``(snapshot read)
    -> insert, ``u`` -> update, ``d`` -> delete; anything else (DDL
    messages, truncate 't') passes through raw for the quarantine path.
    The row image is ``after`` for upserts and ``before`` for deletes
    (the only image a delete carries).

    ``seq_expr``: total-order expression over the parsed envelope
    (column root ``env``). Default: ``source.lsn`` (Postgres WAL — a
    true total order), else the MySQL binlog composite
    ``file_n * 2^42 + pos * 2^12 + row`` where ``file_n`` is the
    numeric suffix of ``source.file`` (``mysql-bin.000042``). The file
    number MUST ride above ``pos``: MySQL's position resets to ~0 at
    every binlog rotation, so ``pos`` alone is NOT a total order across
    files — a post-rotation update would lose latest-wins dedup to a
    pre-rotation one (ADVICE r3). Bit budget: file_n < 2^21 (2M binlog
    files), pos < 2^30 (max_binlog_size caps at 1 GiB), row < 2^12
    (rows per binlog event — events split at binlog-row-event-max-size,
    8 KiB default). Streams outside those bounds (giant single-
    transaction binlogs) must pass their own ``seq_expr``. When ``file``
    is absent entirely (older connector configs), falls back to
    ``pos * 2^20 + row`` — EXACTLY the pre-round-4 default, so tables
    built on the old formula keep a consistent seq scale (a shrunken
    fallback would make post-upgrade events compare older than
    pre-upgrade ones); single-file order only. MUST be a total order
    per key for latest-wins dedup to be correct (SURVEY.md §2.7).
    """
    env = F.from_json(F.col(value_col), debezium_envelope_schema(payload_schema))
    parsed = raw.select(env.alias("env"))
    if seq_expr is None:
        file_n = F.regexp_extract(
            F.coalesce(F.col("env.source.file"), F.lit("")), r"(\d+)$", 1
        )
        with_file = (
            file_n.cast("long") * F.lit(1 << 42)
            + F.col("env.source.pos") * F.lit(1 << 12)
            + F.coalesce(F.col("env.source.row"), F.lit(0))
        )
        legacy = F.col("env.source.pos") * F.lit(1 << 20) + F.coalesce(
            F.col("env.source.row"), F.lit(0)
        )
        seq_expr = F.coalesce(
            F.col("env.source.lsn"),
            F.when(file_n != "", with_file).otherwise(legacy),
        )
    op = (
        F.when(F.col("env.op").isin("c", "r"), F.lit("insert"))
        .when(F.col("env.op") == "u", F.lit("update"))
        .when(F.col("env.op") == "d", F.lit("delete"))
        .otherwise(F.col("env.op"))
    )
    image = F.when(F.col("env.op") == "d", F.col("env.before")).otherwise(
        F.col("env.after")
    )
    # table_col: keep the envelope's source table name (Debezium routes
    # every captured table through one topic-per-table OR one fat topic;
    # the fat-topic deployment needs the discriminator for
    # streaming/router.apply_batch_routed)
    extra = (
        [F.col("env.source.table").alias(table_col)] if table_col else []
    )
    parsed = parsed.select(
        image.alias("_img"), op.alias("op"),
        seq_expr.cast("long").alias("seq"), *extra,
    )
    return parsed.select(
        *_payload_cols(payload_schema, "_img"), "op", "seq",
        *([table_col] if table_col else []),
    )


def canal_envelope_schema() -> StructType:
    """The subset of the Canal flat-message JSON this parser consumes.

    Row images arrive as string->string maps (Canal serializes every
    column as text); the typed cast happens against the payload schema
    in :func:`from_canal` — the same typed-parse-or-dirty contract as
    the unstructured file readers (plans/job.py).
    """
    return StructType(
        [
            StructField("data", ArrayType(MapType(StringType(), StringType()))),
            StructField("old", ArrayType(MapType(StringType(), StringType()))),
            StructField("table", StringType()),
            StructField("type", StringType()),
            StructField("es", LongType()),  # binlog event ts (ms)
            StructField("ts", LongType()),  # delivery ts (ms)
            StructField("id", LongType()),  # batch id (monotone per topic)
            StructField("isDdl", StringType()),
        ]
    )


def from_canal(
    raw: DataFrame,
    payload_schema: StructType,
    value_col: str = "value",
    seq_expr: Column | None = None,
    table_col: str | None = None,
) -> DataFrame:
    """Parse Canal flat-message JSON into the canonical changelog.

    One Canal message carries a statement's WHOLE row batch in ``data``
    — ``posexplode`` fans it out to one change per row before any
    shuffle. Op mapping: INSERT -> insert, UPDATE -> update, DELETE ->
    delete; DDL messages (isDdl=true) and unknown types pass the raw
    type through for quarantine.

    ``seq_expr`` (over columns ``env`` + ``pos``): default
    ``id * 2^20 + pos`` — Canal's per-topic monotone batch id composed
    with the row's position in the statement, a total order as long as
    one topic-partition feeds one stream (Canal's own ordering
    guarantee).
    """
    env = F.from_json(F.col(value_col), canal_envelope_schema())
    parsed = raw.select(env.alias("env"))
    exploded = parsed.select(
        F.col("env"),
        F.posexplode_outer(F.col("env.data")).alias("pos", "_row"),
    )
    if seq_expr is None:
        seq_expr = F.col("env.id") * F.lit(1 << 20) + F.col("pos")
    op = F.when(F.col("env.isDdl") == "true", F.lit("ddl")).otherwise(
        F.when(F.col("env.type") == "INSERT", F.lit("insert"))
        .when(F.col("env.type") == "UPDATE", F.lit("update"))
        .when(F.col("env.type") == "DELETE", F.lit("delete"))
        .otherwise(F.lower(F.coalesce(F.col("env.type"), F.lit("null"))))
    )
    typed = [
        F.col("_row").getItem(f.name).cast(f.dataType).alias(f.name)
        for f in payload_schema.fields
    ]
    extra = [F.col("env.table").alias(table_col)] if table_col else []
    return exploded.select(
        *typed, op.alias("op"), seq_expr.cast("long").alias("seq"), *extra
    )


def maxwell_envelope_schema(payload_schema: StructType) -> StructType:
    """The subset of the Maxwell (Zendesk's MySQL binlog daemon) JSON
    this parser consumes. Maxwell emits one message per row change with
    the FULL new image in ``data`` (for deletes: the deleted row's
    image) and only the CHANGED columns' old values in ``old``."""
    return StructType(
        [
            StructField("database", StringType()),
            StructField("table", StringType()),
            StructField("type", StringType()),
            StructField("ts", LongType()),  # commit ts (sec)
            StructField("xid", LongType()),  # transaction id
            StructField("position", StringType()),  # "file.000006:800911"
            StructField("data", payload_schema),
            StructField("old", payload_schema),
        ]
    )


def from_maxwell(
    raw: DataFrame,
    payload_schema: StructType,
    value_col: str = "value",
    seq_expr: Column | None = None,
    table_col: str | None = None,
) -> DataFrame:
    """Parse Maxwell JSON envelopes into the canonical changelog.

    Op mapping: ``insert`` / ``bootstrap-insert`` (Maxwell's full-sync
    rows — DataX's bulk-load-then-incremental lifecycle) -> insert,
    ``update`` -> update, ``delete`` -> delete; DDL message types
    (table-create/alter/...) pass through raw for quarantine. ``data``
    is the row image for every op — Maxwell sends the deleted row's
    image there, unlike Debezium's before/after split.

    ``seq_expr`` (over column root ``env``): default parses
    ``position`` ("<binlog-file>.<n>:<offset>") into
    ``file_n * 2^40 + offset`` — the binlog total order — falling back
    to ``xid`` when position is absent. Like the other parsers, this
    MUST be a per-key total order for latest-wins dedup.

    Same physical shape as from_debezium: one from_json projection
    fused into the scan, zero Python, zero shuffles.
    """
    env = F.from_json(F.col(value_col), maxwell_envelope_schema(payload_schema))
    parsed = raw.select(env.alias("env"))
    if seq_expr is None:
        file_n = F.regexp_extract(F.col("env.position"), r"\.(\d+):", 1)
        offset = F.regexp_extract(F.col("env.position"), r":(\d+)$", 1)
        seq_expr = F.coalesce(
            F.when(
                offset != "",
                file_n.cast("long") * F.lit(1 << 40) + offset.cast("long"),
            ),
            F.col("env.xid"),
        )
    op = (
        F.when(F.col("env.type").isin("insert", "bootstrap-insert"), F.lit("insert"))
        .when(F.col("env.type") == "update", F.lit("update"))
        .when(F.col("env.type") == "delete", F.lit("delete"))
        .otherwise(F.coalesce(F.col("env.type"), F.lit("null")))
    )
    extra = [F.col("env.table").alias(table_col)] if table_col else []
    parsed = parsed.select(
        F.col("env.data").alias("_img"), op.alias("op"),
        seq_expr.cast("long").alias("seq"), *extra,
    )
    return parsed.select(
        *_payload_cols(payload_schema, "_img"), "op", "seq",
        *([table_col] if table_col else []),
    )


def to_debezium(
    changes: DataFrame,
    key_cols: list[str],
    ts_ms: int | None = None,
) -> DataFrame:
    """EMIT Debezium JSON envelopes from a ``LakeTable.read_changes``
    feed — the outbound half of the envelope contract, making the lake a
    CDC *source*: downstream consumers (another lake, a search index, a
    cache) replay the emitted stream through ``from_debezium`` +
    ``apply_batch`` and converge on this table's state. The reference's
    closest analog is otsstreamreader's tunnel-record export
    (otsstreamreader/.../model/StreamRecord) — here the bus format is
    the dominant open-source one instead of a proprietary tunnel.

    Input columns: the payload plus ``_change_type`` in
    ('insert','delete','update_preimage','update_postimage') and
    ``_commit_version``. Output: ``key`` (JSON of the key columns) and
    ``value`` (the envelope), the classic Kafka topic shape, plus
    ``_commit_version`` for partitioned/topic routing.

    Envelope fidelity: inserts are ``op='c'`` with ``before=null``;
    deletes ``op='d'`` with ``after=null``; an update's pre/post image
    PAIR collapses into ONE ``op='u'`` envelope. ``source.lsn`` carries
    the commit version, so ``from_debezium``'s default seq reproduces
    commit order — within a commit a key changes at most once (the feed
    diffs snapshots), so latest-wins dedup downstream is exact.

    Scale shape: inserts/deletes are map-only; update pairing is ONE
    conditional-aggregation shuffle on (key, commit) — no self-join (an
    aliased self-join on shared lineage plans as a nested loop; the
    groupBy form shuffles each side once and never re-scans). Nulls in
    images are emitted explicitly (``ignoreNullFields=false``) like
    Debezium itself does.
    """
    payload = [
        c for c in changes.columns
        if c not in ("_change_type", "_commit_version")
    ]
    img = F.struct(*[F.col(c) for c in payload])
    null_img = F.lit(None).cast(
        changes.select(img.alias("x")).schema["x"].dataType
    )
    ct = F.col("_change_type")
    base = changes.withColumn("_img", img)
    ins_del = base.filter(ct.isin("insert", "delete")).select(
        F.when(ct == "delete", F.col("_img")).otherwise(null_img).alias("before"),
        F.when(ct == "insert", F.col("_img")).otherwise(null_img).alias("after"),
        F.when(ct == "insert", F.lit("c")).otherwise(F.lit("d")).alias("op"),
        F.col("_commit_version"),
    )
    upd = (
        base.filter(ct.isin("update_preimage", "update_postimage"))
        .groupBy(*key_cols, "_commit_version")
        .agg(
            F.first(
                F.when(ct == "update_preimage", F.col("_img")),
                ignorenulls=True,
            ).alias("before"),
            F.first(
                F.when(ct == "update_postimage", F.col("_img")),
                ignorenulls=True,
            ).alias("after"),
        )
        .select(
            "before", "after", F.lit("u").alias("op"), F.col("_commit_version")
        )
    )
    env = ins_del.unionByName(upd)
    key_src = F.coalesce(F.col("after"), F.col("before"))
    value = F.to_json(
        F.struct(
            F.col("before"),
            F.col("after"),
            F.col("op"),
            F.lit(ts_ms).cast("long").alias("ts_ms"),
            F.struct(
                F.col("_commit_version").cast("long").alias("lsn"),
                F.lit(ts_ms).cast("long").alias("ts_ms"),
            ).alias("source"),
        ),
        {"ignoreNullFields": "false"},
    )
    key = F.to_json(
        F.struct(*[key_src.getField(k).alias(k) for k in key_cols])
    )
    return env.select(
        key.alias("key"), value.alias("value"), F.col("_commit_version")
    )


# ---------------------------------------------------------------------------
# Mid-stream DDL: Maxwell schema-change messages -> typed Spark columns.
# ---------------------------------------------------------------------------

#: Maxwell message types that DEFINE schema (carry a full ``def`` column
#: list). ``table-drop`` and the database-level types carry no columns.
MAXWELL_DDL_TYPES = ("table-create", "table-alter")

#: Every Maxwell control-plane message type: consumed by the DDL path (or
#: deliberately ignored), never row data — the data parser must filter
#: these out instead of quarantining them as invalid ops.
MAXWELL_CONTROL_TYPES = MAXWELL_DDL_TYPES + (
    "table-drop",
    "database-create",
    "database-alter",
    "database-drop",
    "bootstrap-start",
    "bootstrap-complete",
)

# MySQL column type -> Spark type, following the reference's declared
# rdbms type map (mysqlreader/doc/mysqlreader.md §3.3: int family -> Long,
# float/double/decimal -> Double, char/text family -> String,
# date/datetime/timestamp -> Date, bit/bool -> Boolean, blob -> Bytes)
# adapted to JSON transport: Maxwell emits date/datetime as ISO strings
# (which Spark casts to Date/Timestamp) and binary as encoded TEXT, so the
# binary family maps to String here — decoding the encoding Maxwell was
# configured with (base64/hex) is a payload transform, not a type.
_MYSQL_INT_TYPES = frozenset(
    {"tinyint", "smallint", "mediumint", "int", "integer", "bigint", "year"}
)
_MYSQL_FLOAT_TYPES = frozenset({"float", "double", "real", "decimal", "numeric"})
_MYSQL_STRING_TYPES = frozenset(
    {
        "varchar", "char", "text", "tinytext", "mediumtext", "longtext",
        "enum", "set", "json", "time",
        "binary", "varbinary", "blob", "tinyblob", "mediumblob", "longblob",
    }
)
_MYSQL_BOOL_TYPES = frozenset({"bit", "bool", "boolean"})


def mysql_type_to_spark(mysql_type: str):
    """Map a MySQL column type name (as Maxwell's ``def.columns[].type``
    reports it — lowercase, no length suffix) to the Spark type the
    engine stores it as. Unknown types raise: a DDL event is control
    plane, silently guessing a type would corrupt every later row."""
    from pyspark.sql.types import (
        BooleanType,
        DateType,
        DoubleType,
        LongType,
        TimestampType,
    )

    t = (mysql_type or "").strip().lower()
    if t in _MYSQL_INT_TYPES:
        return LongType()
    if t in _MYSQL_FLOAT_TYPES:
        return DoubleType()
    if t in _MYSQL_STRING_TYPES:
        return StringType()
    if t in _MYSQL_BOOL_TYPES:
        return BooleanType()
    if t == "date":
        return DateType()
    if t in ("datetime", "timestamp"):
        return TimestampType()
    raise ValueError(
        f"unmapped MySQL type {mysql_type!r} in a DDL event; extend "
        "mysql_type_to_spark or evolve the table out-of-band"
    )


def maxwell_ddl_schema() -> StructType:
    """The subset of Maxwell's schema-change JSON (``output_ddl=true``)
    the DDL consumer reads: ``def`` carries the FULL post-change column
    list, so additive evolution needs no SQL parsing."""
    from pyspark.sql.types import BooleanType

    col = StructType(
        [
            StructField("name", StringType()),
            StructField("type", StringType()),
            StructField("signed", BooleanType()),
        ]
    )
    table_def = StructType(
        [
            StructField("database", StringType()),
            StructField("table", StringType()),
            StructField("columns", ArrayType(col)),
            StructField("primary-key", ArrayType(StringType())),
        ]
    )
    return StructType(
        [
            StructField("type", StringType()),
            StructField("database", StringType()),
            StructField("table", StringType()),
            StructField("def", table_def),
            StructField("ts", LongType()),
            StructField("sql", StringType()),
            StructField("position", StringType()),
        ]
    )


def ddl_from_maxwell(
    raw: DataFrame, value_col: str = "value", table: str | None = None
) -> DataFrame:
    """Extract the schema-DEFINING Maxwell messages (table-create /
    table-alter) from a raw JSON-lines frame: one row per DDL event with
    the full post-change column list. Pure Column exprs like the data
    parsers; the caller collects the (rare, control-plane) result.

    ``table``: keep only events for that source table — a fat-topic dump
    interleaves several tables' DDL."""
    env = F.from_json(F.col(value_col), maxwell_ddl_schema())
    out = raw.select(env.alias("env")).filter(
        F.col("env.type").isin(*MAXWELL_DDL_TYPES)
    )
    if table is not None:
        out = out.filter(F.col("env.table") == table)
    return out.select(
        F.col("env.table").alias("table"),
        F.col("env.type").alias("ddl_type"),
        F.col("env.def.columns").alias("columns"),
        F.col("env.ts").alias("ts"),
        F.col("env.sql").alias("sql"),
    )
