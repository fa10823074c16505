"""Apache Iceberg v2 metadata export / import for lake tables.

The north star calls the target an *Iceberg* table; the lake engine in
this package is an Iceberg analog with its own (sharded, content-
addressed) manifest format. This module closes the interop loop with
the REAL format: ``export_iceberg`` publishes a lake snapshot as
spec-conformant Apache Iceberg **format-version 2** metadata — a
``metadata/vN.metadata.json`` file, an Avro *manifest list* and an Avro
*manifest* per exported snapshot — referencing the table's existing
parquet data files IN PLACE (metadata-only: zero data bytes move, the
same property the lake's own commits have). ``read_iceberg`` is the
inverse: given any Iceberg table location written by this exporter, it
plans the scan purely from the Iceberg metadata (never touching the
lake's own ``_manifests``) and returns the table as a DataFrame.

Everything here is built from the public Iceberg table spec
(https://iceberg.apache.org/spec/) and the public Avro spec:

- metadata.json: format-version 2 required fields (table-uuid,
  last-sequence-number, schemas with stable field ids, partition-specs,
  sort-orders, snapshots, snapshot-log, metadata-log, refs);
- manifest list: one Avro record per manifest, spec field ids 500-519;
- manifest: ``manifest_entry`` records (status / snapshot_id /
  sequence_number / data_file struct, spec field ids 0-4 and 100-142),
  with the Iceberg-required ``field-id`` / ``element-id`` / ``key-id``
  attributes carried in the Avro schemas;
- data files lack parquet field ids (Spark's writer doesn't stamp
  them), so the metadata carries the spec's escape hatch for exactly
  this case: a ``schema.name-mapping.default`` table property mapping
  names -> field ids.

Fidelity boundary, stated plainly: no Iceberg implementation exists in
this sandbox (no iceberg-spark runtime jar, no DuckDB iceberg
extension — probed), so end-to-end "Spark-with-Iceberg reads it" can't
be executed here. What IS cross-verified against a reference
implementation: the Avro container files are read back with the
**Java Avro library that ships on Spark's classpath**
(org.apache.avro DataFileReader via py4j — tests/test_iceberg.py), so
the manifest bytes are proven readable by the exact Avro code real
Iceberg readers link against; the JSON layer is pinned against the
spec's required-field list. ``read_iceberg`` additionally proves the
metadata is sufficient to reconstruct the table without the lake's own
manifests.

Design for scale: export cost is O(live files) metadata work — record
counts come from parquet footers (driver-side under
FILE_STATS_PARALLEL_THRESHOLD files, fanned out to executors above it,
the lake/stats.py pattern), and each export appends ONE manifest +
ONE manifest list + ONE metadata json regardless of table size. The
bucket layout is exported as *unpartitioned*: Iceberg's ``bucket[N]``
transform is murmur3-based while this lake buckets with xxhash64, so
claiming the transform would mis-route Iceberg-side bucket pruning —
partitioning is a scan optimization, not semantics, and correctness is
unaffected (reference: the same reasoning DataX applies to channel
layout vs record content, core/.../JobContainer.java task-split docs).

Semantics boundary for MOR: a merge-on-read snapshot with live deltas
or equality-delete files does NOT export — the lake's latest-wins
delta resolution is not expressible in Iceberg's file-level model
(Iceberg equality deletes compare FILE sequence numbers; this engine's
compare ROW seqs). ``compact()`` first, then export the (then
key-unique, delete-free) base — the exporter enforces it loudly.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from datax_spark.sources.avro_codec import read_container, write_container

METADATA_DIR = "metadata"

# ---------------------------------------------------------------------------
# Spark <-> Iceberg schema conversion (spec "Schemas and Data Types")
# ---------------------------------------------------------------------------

_PRIMITIVE_TO_ICEBERG = {
    "boolean": "boolean",
    "integer": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "date": "date",
    "timestamp": "timestamptz",  # Spark TimestampType is UTC-adjusted
    "timestamp_ntz": "timestamp",
    "string": "string",
    "binary": "binary",
    # narrow integrals have no Iceberg analog; widen on export (the
    # lake's own WIDENS_TO direction, so values are unchanged)
    "byte": "int",
    "short": "int",
}

_ICEBERG_TO_SPARK = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "date": T.DateType(),
    "timestamptz": T.TimestampType(),
    "timestamp": T.TimestampNTZType(),
    "string": T.StringType(),
    "binary": T.BinaryType(),
}


def _to_iceberg_type(dt: T.DataType, alloc) -> Any:
    """Spark DataType -> Iceberg type JSON; ``alloc()`` hands out field
    ids for nested fields in depth-first order (the spec's assignment)."""
    name = dt.typeName()
    if name in _PRIMITIVE_TO_ICEBERG:
        return _PRIMITIVE_TO_ICEBERG[name]
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision}, {dt.scale})"
    if isinstance(dt, T.ArrayType):
        eid = alloc()
        return {
            "type": "list",
            "element-id": eid,
            "element": _to_iceberg_type(dt.elementType, alloc),
            "element-required": not dt.containsNull,
        }
    if isinstance(dt, T.MapType):
        kid, vid = alloc(), alloc()
        return {
            "type": "map",
            "key-id": kid,
            "key": _to_iceberg_type(dt.keyType, alloc),
            "value-id": vid,
            "value": _to_iceberg_type(dt.valueType, alloc),
            "value-required": not dt.valueContainsNull,
        }
    if isinstance(dt, T.StructType):
        fields = []
        for f in dt.fields:
            fid = alloc()
            fields.append(
                {
                    "id": fid,
                    "name": f.name,
                    "required": not f.nullable,
                    "type": _to_iceberg_type(f.dataType, alloc),
                }
            )
        return {"type": "struct", "fields": fields}
    raise ValueError(f"no Iceberg mapping for Spark type {name!r}")


def _from_iceberg_type(t: Any) -> T.DataType:
    if isinstance(t, str):
        if t in _ICEBERG_TO_SPARK:
            return _ICEBERG_TO_SPARK[t]
        if t.startswith("decimal("):
            p, s = t[len("decimal("):-1].split(",")
            return T.DecimalType(int(p), int(s))
        raise ValueError(f"no Spark mapping for Iceberg type {t!r}")
    kind = t["type"]
    if kind == "list":
        return T.ArrayType(
            _from_iceberg_type(t["element"]), not t.get("element-required")
        )
    if kind == "map":
        return T.MapType(
            _from_iceberg_type(t["key"]),
            _from_iceberg_type(t["value"]),
            not t.get("value-required"),
        )
    if kind == "struct":
        return T.StructType(
            [
                T.StructField(
                    f["name"],
                    _from_iceberg_type(f["type"]),
                    not f.get("required"),
                )
                for f in t["fields"]
            ]
        )
    raise ValueError(f"no Spark mapping for Iceberg type {t!r}")


def schema_to_iceberg(
    schema: T.StructType,
    schema_id: int = 0,
    prior_ids: dict[str, int] | None = None,
    prior_last_id: int = 0,
) -> tuple[dict, int]:
    """Convert a Spark schema to an Iceberg schema dict.

    Field ids must stay STABLE across metadata versions (the spec's
    whole point): top-level fields reuse ``prior_ids`` (name -> id from
    the previous export) and NEW names allocate beyond
    ``prior_last_id`` — so additive evolution between exports never
    reassigns an existing column's id. Nested ids re-derive per export
    (nested evolution would need full id lineage; the lake's DDL is
    top-level additive, matching)."""
    prior_ids = prior_ids or {}
    counter = [max(prior_last_id, 0)]

    def alloc() -> int:
        counter[0] += 1
        return counter[0]

    # reserve top-level ids first (stable), then nested depth-first
    fields = []
    pending_new = [f.name for f in schema.fields if f.name not in prior_ids]
    for f in schema.fields:
        if f.name in prior_ids:
            fid = prior_ids[f.name]
        else:
            fid = prior_last_id + 1 + pending_new.index(f.name)
        fields.append((f, fid))
    counter[0] = max(
        [prior_last_id + len(pending_new)] + [fid for _, fid in fields]
    )
    out_fields = []
    for f, fid in fields:
        out_fields.append(
            {
                "id": fid,
                "name": f.name,
                "required": False,  # lake payload columns are nullable
                "type": _to_iceberg_type(f.dataType, alloc),
            }
        )
    return (
        {"type": "struct", "schema-id": schema_id, "fields": out_fields},
        counter[0],
    )


def _name_mapping(
    ice_schema: dict, renames: dict[str, list[str]] | None = None
) -> list[dict]:
    """``schema.name-mapping.default`` content: parquet files written by
    Spark carry no field ids, so Iceberg readers resolve columns through
    this mapping (spec "Column Projection"). Nested mappings mirror the
    schema tree. A lake column renamed with ``rename_column`` lists its
    RETIRED physical names too (newest first) — exactly the case name
    mapping exists for: any one file carries exactly one of the names,
    all resolving to the same field id."""
    renames = renames or {}

    def walk(t: Any, top: bool = False) -> list[dict] | None:
        if isinstance(t, str):
            return None
        kind = t["type"]
        if kind == "struct":
            out = []
            for f in t["fields"]:
                names = [f["name"]]
                if top:
                    # retired physical names, newest first (lake
                    # _read_files coalesce order)
                    names += list(reversed(renames.get(f["name"], [])))
                entry: dict[str, Any] = {
                    "field-id": f["id"],
                    "names": names,
                }
                sub = walk(f["type"])
                if sub:
                    entry["fields"] = sub
                out.append(entry)
            return out
        if kind == "list":
            entry = {"field-id": t["element-id"], "names": ["element"]}
            sub = walk(t["element"])
            if sub:
                entry["fields"] = sub
            return [entry]
        if kind == "map":
            k: dict[str, Any] = {"field-id": t["key-id"], "names": ["key"]}
            v: dict[str, Any] = {"field-id": t["value-id"], "names": ["value"]}
            sub = walk(t["value"])
            if sub:
                v["fields"] = sub
            return [k, v]
        return None

    return walk(ice_schema, top=True) or []


# ---------------------------------------------------------------------------
# Avro schemas for manifests (spec "Manifests" / "Manifest Lists")
# ---------------------------------------------------------------------------


def _opt(t: Any) -> list:
    return ["null", t]


def _int_map(name: str, key_id: int, value_id: int, value_type: str) -> dict:
    """Iceberg's Avro encoding for map<int, X>: an array of key/value
    records with ``logicalType: map`` (Avro maps only allow string
    keys)."""
    return {
        "type": "array",
        "logicalType": "map",
        "items": {
            "type": "record",
            "name": name,
            "fields": [
                {"name": "key", "type": "int", "field-id": key_id},
                {"name": "value", "type": value_type, "field-id": value_id},
            ],
        },
    }


def _data_file_schema(v3: bool = False) -> dict:
    """``data_file`` record. ``v3`` adds the format-version-3 fields:
    row lineage (``first_row_id``, field id 142) and deletion-vector
    references (``referenced_data_file`` 143, ``content_offset`` 144,
    ``content_size_in_bytes`` 145)."""
    extra = (
        [
            {
                "name": "first_row_id",
                "type": _opt("long"),
                "default": None,
                "field-id": 142,
            },
            {
                "name": "referenced_data_file",
                "type": _opt("string"),
                "default": None,
                "field-id": 143,
            },
            {
                "name": "content_offset",
                "type": _opt("long"),
                "default": None,
                "field-id": 144,
            },
            {
                "name": "content_size_in_bytes",
                "type": _opt("long"),
                "default": None,
                "field-id": 145,
            },
        ]
        if v3
        else []
    )
    return {
        "type": "record",
        "name": "data_file",
        "fields": [
            {"name": "content", "type": "int", "field-id": 134},
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {
                # unpartitioned spec -> empty partition tuple (spec: the
                # partition struct has one field per spec field)
                "name": "partition",
                "type": {"type": "record", "name": "r102", "fields": []},
                "field-id": 102,
            },
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
            {
                "name": "lower_bounds",
                "type": _opt(_int_map("k126_v127", 126, 127, "bytes")),
                "default": None,
                "field-id": 125,
            },
            {
                "name": "upper_bounds",
                "type": _opt(_int_map("k129_v130", 129, 130, "bytes")),
                "default": None,
                "field-id": 128,
            },
            {
                "name": "split_offsets",
                "type": _opt({"type": "array", "items": "long", "element-id": 133}),
                "default": None,
                "field-id": 132,
            },
            {
                "name": "equality_ids",
                "type": _opt({"type": "array", "items": "int", "element-id": 136}),
                "default": None,
                "field-id": 135,
            },
            {
                "name": "sort_order_id",
                "type": _opt("int"),
                "default": None,
                "field-id": 140,
            },
        ]
        + extra,
    }


def _manifest_entry_schema(v3: bool = False) -> dict:
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {
                "name": "snapshot_id",
                "type": _opt("long"),
                "default": None,
                "field-id": 1,
            },
            {
                "name": "sequence_number",
                "type": _opt("long"),
                "default": None,
                "field-id": 3,
            },
            {
                "name": "file_sequence_number",
                "type": _opt("long"),
                "default": None,
                "field-id": 4,
            },
            {
                "name": "data_file",
                "type": _data_file_schema(v3),
                "field-id": 2,
            },
        ],
    }


def _manifest_list_schema(v3: bool = False) -> dict:
    extra = (
        [
            {
                # v3 row lineage: starting row id for data files that
                # inherit (null for delete manifests)
                "name": "first_row_id",
                "type": _opt("long"),
                "default": None,
                "field-id": 520,
            }
        ]
        if v3
        else []
    )
    return {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string", "field-id": 500},
            {"name": "manifest_length", "type": "long", "field-id": 501},
            {"name": "partition_spec_id", "type": "int", "field-id": 502},
            {"name": "content", "type": "int", "field-id": 517},
            {"name": "sequence_number", "type": "long", "field-id": 515},
            {"name": "min_sequence_number", "type": "long", "field-id": 516},
            {"name": "added_snapshot_id", "type": "long", "field-id": 503},
            {"name": "added_files_count", "type": "int", "field-id": 504},
            {"name": "existing_files_count", "type": "int", "field-id": 505},
            {"name": "deleted_files_count", "type": "int", "field-id": 506},
            {"name": "added_rows_count", "type": "long", "field-id": 512},
            {"name": "existing_rows_count", "type": "long", "field-id": 513},
            {"name": "deleted_rows_count", "type": "long", "field-id": 514},
            {
                "name": "partitions",
                "type": _opt(
                    {
                        "type": "array",
                        "element-id": 508,
                        "items": {
                            "type": "record",
                            "name": "r508",
                            "fields": [
                                {
                                    "name": "contains_null",
                                    "type": "boolean",
                                    "field-id": 509,
                                },
                                {
                                    "name": "contains_nan",
                                    "type": _opt("boolean"),
                                    "default": None,
                                    "field-id": 518,
                                },
                                {
                                    "name": "lower_bound",
                                    "type": _opt("bytes"),
                                    "default": None,
                                    "field-id": 510,
                                },
                                {
                                    "name": "upper_bound",
                                    "type": _opt("bytes"),
                                    "default": None,
                                    "field-id": 511,
                                },
                            ],
                        },
                    }
                ),
                "default": None,
                "field-id": 507,
            },
        ]
        + extra,
    }


# ---------------------------------------------------------------------------
# single-value serialization for column bounds (spec "Binary single-value")
# ---------------------------------------------------------------------------


def _single_value(v: Any, ice_type: str) -> bytes | None:
    import struct as _struct

    if v is None:
        return None
    if ice_type == "string":
        return str(v).encode("utf-8")
    if ice_type == "long":
        return _struct.pack("<q", int(v))
    if ice_type == "int":
        return _struct.pack("<i", int(v))
    if ice_type == "double":
        return _struct.pack("<d", float(v))
    if ice_type == "float":
        return _struct.pack("<f", float(v))
    return None  # other types: omit bounds (optional metadata)


# ---------------------------------------------------------------------------
# record counts (parquet footers; executor fan-out above the threshold)
# ---------------------------------------------------------------------------


def _record_counts(spark: SparkSession, files: list[str]) -> dict[str, int]:
    from datax_spark.lake.stats import FILE_STATS_PARALLEL_THRESHOLD

    def count_one(path: str) -> tuple[str, int]:
        import pyarrow.parquet as pq

        return path, pq.ParquetFile(path).metadata.num_rows

    if len(files) <= FILE_STATS_PARALLEL_THRESHOLD:
        return dict(count_one(p) for p in files)
    sc = spark.sparkContext
    n_slices = max(1, min(len(files) // 8, sc.defaultParallelism))
    return dict(sc.parallelize(files, n_slices).map(count_one).collect())


# ---------------------------------------------------------------------------
# export
# ---------------------------------------------------------------------------


def _metadata_dir(location: str) -> str:
    return os.path.join(location, METADATA_DIR)


def _current_metadata_version(location: str) -> int:
    """Latest vN from version-hint.text, falling back to a dir listing
    (the HadoopCatalog convention both ways)."""
    mdir = _metadata_dir(location)
    hint = os.path.join(mdir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            return int(f.read().strip())
    if not os.path.isdir(mdir):
        return 0
    versions = [
        int(n[1:].split(".")[0])
        for n in os.listdir(mdir)
        if n.startswith("v") and n.endswith(".metadata.json")
    ]
    return max(versions, default=0)


def _load_metadata(location: str, version: int | None = None) -> dict:
    v = version if version is not None else _current_metadata_version(location)
    if v <= 0:
        raise FileNotFoundError(f"no Iceberg metadata under {location}")
    path = os.path.join(_metadata_dir(location), f"v{v}.metadata.json")
    with open(path) as f:
        return json.load(f)


def _prior_file_index(
    location: str, meta: dict
) -> tuple[dict[str, dict], dict[str, dict]]:
    """Index the previous current snapshot's live entries so re-exports
    keep their original lineage as EXISTING entries. Returns
    ``(files, dvs)``:

    - ``files``: file_path -> {snapshot_id, sequence_number, data_file}
      for data files and non-DV delete files (their path is unique);
    - ``dvs``: referenced_data_file -> the same dict, for v3 deletion
      vectors (several DV entries share ONE Puffin ``file_path``, so
      the referenced data file is the natural key — the spec allows at
      most one DV per data file).

    v3 row lineage is reconstructed on the way through: a data entry
    with a null ``first_row_id`` inherits ``manifest.first_row_id``
    plus the record counts of the null entries before it (the spec's
    reader-side assignment), and the derived value is written back
    into the returned ``data_file`` dict so the next export can emit
    it EXPLICITLY — keeping every row's id stable across manifest
    rewrites."""
    snap_id = meta.get("current-snapshot-id")
    if snap_id is None or snap_id == -1:
        return {}, {}
    snap = next(s for s in meta["snapshots"] if s["snapshot-id"] == snap_id)
    out: dict[str, dict] = {}
    dvs: dict[str, dict] = {}
    _, manifests = read_container(snap["manifest-list"])
    for m in manifests:
        _, entries = read_container(m["manifest_path"])
        mf_first = m.get("first_row_id")
        assigned = 0
        for e in entries:
            if e["status"] == 2:  # deleted
                continue
            df = e["data_file"]
            if (
                df["content"] == 0
                and df.get("first_row_id") is None
                and mf_first is not None
            ):
                df = dict(df)
                df["first_row_id"] = mf_first + assigned
                assigned += df["record_count"]
            rec = {
                "snapshot_id": e["snapshot_id"],
                "sequence_number": e["sequence_number"],
                "data_file": df,
            }
            if df["content"] == 1 and df.get("referenced_data_file"):
                dvs[df["referenced_data_file"]] = rec
            else:
                out[df["file_path"]] = rec
    return out, dvs


def _snapshot_operation(
    prior_files: dict[str, dict], live_abs: set[str], del_added: int
) -> str:
    if del_added:
        return "overwrite"
    for path, p in prior_files.items():
        if p["data_file"]["content"] == 0 and path not in live_abs:
            return "overwrite"
    return "append"


class IcebergUnexportableState(ValueError):
    """The snapshot cannot be expressed as Iceberg v2 metadata *yet* —
    a transient state (inline tombstones, patch deltas, vacuumed
    lineage) that a later compaction resolves. ``sync_iceberg`` skips
    these and catches up at the next exportable commit; hard misuse
    (branch table, duplicate snapshot id) stays a plain ValueError."""


def _file_add_versions(
    table,
    snap,
    prior_files: dict | None = None,
    prior_lake_version: int | None = None,
) -> dict[str, int]:
    """relpath -> lake version that INTRODUCED the file, for every live
    base/delta/eq-delete file of ``snap`` — the per-file Iceberg
    sequence numbers that make equality-delete application (strictly
    "older files die") reproduce the engine's row-seq latest-wins under
    the replay-order contract. Witnessed by walking retained manifests
    oldest->newest (driver-side JSON); raises IcebergUnexportableState
    when version 1 was vacuumed away (an unwitnessed file would be
    stamped LATER than its true add version and could wrongly survive a
    delete).

    INCREMENTAL when the caller passes the previous export's file index
    (round 5, VERDICT r4 item 8): files already in the prior Iceberg
    metadata carry their witnessed sequence number there, so only
    manifests NEWER than the prior exported lake version are walked —
    per-batch cost drops from O(history x files) (quadratic over a
    sync_iceberg stream) to O(new commits). A file first seen at
    ``prior_lake_version + 1`` is witnessed by the prior metadata
    itself even if that manifest was since vacuumed."""
    from datax_spark.lake.table import MANIFEST_DIR

    mdir = os.path.join(table.path, MANIFEST_DIR)
    location = os.path.abspath(table.path)
    versions = sorted(
        int(n[1:-5]) for n in os.listdir(mdir)
        if n.startswith("v") and n.endswith(".json")
    )
    retained = set(versions)
    add: dict[str, int] = {}
    live: set[str] = set()
    for section in ("buckets", "deltas", "eq_deletes"):
        for files in getattr(snap, section).values():
            live.update(files)
    start_after = 0
    if prior_files and prior_lake_version is not None:
        start_after = int(prior_lake_version)
        for path, entry in prior_files.items():
            if entry["data_file"]["content"] != 0:
                continue  # synthesized delete files live in metadata/
            rel = os.path.relpath(path, location)
            if rel in live:
                add[rel] = int(entry["sequence_number"])
    for v in versions:
        if v <= start_after:
            continue
        if v > snap.version:
            break
        s = table.snapshot(v)
        for section in ("buckets", "deltas", "eq_deletes"):
            for files in getattr(s, section).values():
                for rel in files:
                    if rel in live:
                        add.setdefault(rel, v)
    # witness rule: "first seen at v" is the TRUE add version only when
    # v's predecessor manifest exists (vacuum can leave holes — a file
    # whose real add version was reclaimed would be stamped LATER than
    # it is and could wrongly out-sequence a delete). The prior export
    # witnesses v == start_after + 1 (its file set at start_after is
    # complete), so that boundary needs no manifest.
    missing = live - set(add)
    unwitnessed = sorted(
        rel
        for rel, v in add.items()
        if v != 1
        and v > start_after
        and v != start_after + 1
        and (v - 1) not in retained
    )
    if missing or unwitnessed:
        raise IcebergUnexportableState(
            "cannot witness per-file add versions (vacuumed lineage): "
            f"{(sorted(missing) + unwitnessed)[:3]}; compact() to a "
            "delta-free state and export that instead"
        )
    return add


def _synth_delete_file(
    mdir: str, location: str, rel: str, key_cols: list[str], is_delta: bool
) -> tuple[str, int]:
    """Write (idempotently) the keys-only Iceberg equality-delete
    parquet for one live delta/eq-delete file and return
    (path, record_count). A delta file's keys kill every OLDER copy of
    those keys (the Flink-CDC upsert encoding); a lake eq-delete file's
    key rows are re-projected to drop the engine's private ``_seq``
    column (spec-clean: the delete file carries exactly the equality
    columns). Deterministic name = md5 of the source relpath, so
    re-exports and EXISTING entries reuse the same file. Raises
    IcebergUnexportableState on inline tombstones in a delta (op 'd'
    rows are full-width and would surface as data)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from datax_spark.operators.merge import DELETE_OP

    out = _synth_delete_path(mdir, rel)
    src = os.path.join(location, rel)
    cols = key_cols + (["_op"] if is_delta else [])
    t = pq.read_table(src, columns=cols)
    if is_delta:
        if pc.any(pc.equal(t.column("_op"), DELETE_OP)).as_py():
            raise IcebergUnexportableState(
                "delta files carry inline tombstone rows "
                "(delete_encoding='inline'); Iceberg cannot express them "
                "as data — compact() first, or ingest with "
                "delete_encoding='eq'"
            )
        t = t.select(key_cols)
    if t.num_rows == 0:
        return out, 0
    if not os.path.exists(out):
        tmp = f"{out}.tmp-{os.getpid()}"
        pq.write_table(t, tmp)
        os.replace(tmp, out)
    return out, t.num_rows


def _synth_delete_path(mdir: str, rel: str) -> str:
    import hashlib

    return os.path.join(
        mdir, f"eqdel-{hashlib.md5(rel.encode()).hexdigest()[:20]}.parquet"
    )


# above this many NEW synth files per export, fan the pyarrow
# read/write out to executors (shared storage) instead of a driver loop
_SYNTH_PARALLEL_THRESHOLD = 8


def _synth_delete_files(
    spark,
    mdir: str,
    location: str,
    jobs: list[tuple[str, bool]],
    key_cols: list[str],
) -> dict[str, tuple[str, int]]:
    """Run ``_synth_delete_file`` for every (rel, is_delta) job —
    driver loop when few, executor fan-out when many (per-batch work is
    O(batch keys); a driver loop would serialize what the cluster can
    do in parallel). Executor-side IcebergUnexportableState is
    marshalled back and re-raised with its original type so
    ``sync_iceberg``'s skip contract survives the fan-out."""
    if len(jobs) <= _SYNTH_PARALLEL_THRESHOLD:
        return {
            rel: _synth_delete_file(mdir, location, rel, key_cols, isd)
            for rel, isd in jobs
        }

    def _one(job):
        rel, isd = job
        try:
            return rel, _synth_delete_file(mdir, location, rel, key_cols, isd), None
        except IcebergUnexportableState as e:
            return rel, None, str(e)

    sc = spark.sparkContext
    n_slices = max(1, min(len(jobs), sc.defaultParallelism))
    results = sc.parallelize(jobs, n_slices).map(_one).collect()
    out: dict[str, tuple[str, int]] = {}
    for rel, res, err in results:
        if err is not None:
            raise IcebergUnexportableState(err)
        out[rel] = res
    return out


# spec: reserved field ids of the position-delete file columns
_POS_DELETE_PATH_ID = 2147483546
_POS_DELETE_POS_ID = 2147483545


def _synth_pos_delete_file(
    mdir: str, table, snap, snapshot_id: int,
    buckets: list[int] | None = None, keys=None,
) -> tuple[str, int] | None:
    """Write the Iceberg v2 POSITION-delete parquet for a live MOR
    state: every row the engine's resolved read hides becomes a
    (file_path, pos) record — computed by the same distributed job as
    the Delta deletion-vector export (``lake/delta.py::
    _dead_rows_frame``, PLANS.md §15: one key-window exchange, eq-side
    broadcast, key-projected scan). Unlike the equality-delete
    encoding this expresses inline tombstones (a row masks out IN its
    own file) and NULL-``_seq`` bulk rows (liveness is decided by the
    engine's own rules, not the file-sequence correspondence).

    Spec conformance: columns ``file_path`` (field id 2147483546) and
    ``pos`` (2147483545), rows sorted by (file_path, pos), paths
    byte-equal to the manifests' data-file paths. Driver materializes
    the dead set once (the same bound the DV exporter documents: data
    superseded since the last compaction). Returns None when nothing
    is dead; deterministic name per snapshot so a crashed export
    retries idempotently."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datax_spark.lake.delta import _dead_rows_frame

    dead = _dead_rows_frame(table, snap, buckets, keys=keys)
    if dead is None:
        return None
    pdf = dead.toPandas()
    if len(pdf) == 0:
        return None
    pdf = pdf.sort_values(["_fp", "_pos"], kind="mergesort")
    schema = pa.schema(
        [
            pa.field(
                "file_path",
                pa.string(),
                nullable=False,
                metadata={b"PARQUET:field_id": str(_POS_DELETE_PATH_ID).encode()},
            ),
            pa.field(
                "pos",
                pa.int64(),
                nullable=False,
                metadata={b"PARQUET:field_id": str(_POS_DELETE_POS_ID).encode()},
            ),
        ]
    )
    t = pa.table(
        {
            "file_path": pdf["_fp"].tolist(),
            "pos": pdf["_pos"].tolist(),
        },
        schema=schema,
    )
    out = os.path.join(mdir, f"posdel-{snapshot_id}.parquet")
    if not os.path.exists(out):
        tmp = f"{out}.tmp-{os.getpid()}"
        pq.write_table(t, tmp)
        os.replace(tmp, out)
    return out, t.num_rows


def _synth_dv_file(
    mdir: str,
    table,
    snap,
    snapshot_id: int,
    buckets: list[int] | None = None,
    keys=None,
    prior_union: dict | None = None,
) -> tuple[str, list[tuple[str, int, int, int]]] | None:
    """Write the **Iceberg v3 deletion vectors** of a live MOR state:
    one Puffin file holding one ``delete-vector-v1`` blob per data file
    with dead rows — the masks computed by the same distributed job as
    the position-delete and Delta-DV exports (``lake/delta.py::
    _mor_file_masks``; PLANS.md §15: key-projected scan, one key-window
    exchange, broadcast eq-side, roaring build in Arrow-batched
    ``mapInPandas``). The serialized bitmaps are byte-identical to
    Delta's (the v3 spec adopted Delta's RoaringBitmapArray layout),
    so the org.roaringbitmap cross-check in tests/test_delta.py covers
    this path too.

    Returns ``(puffin_path, [(referenced_abs_path, offset, length,
    cardinality), ...])`` or None when nothing is dead. ``buckets``
    restricts recomputation to changed buckets (incremental sync);
    deterministic file name per snapshot, and a crashed export retries
    idempotently by re-reading the existing Puffin's footer instead of
    rewriting it."""
    from datax_spark.lake.delta import _mor_file_masks
    from datax_spark.lake.puffin import (
        frame_dv_payload,
        read_puffin_footer,
        write_puffin,
    )

    location = os.path.abspath(table.path)
    out = os.path.join(mdir, f"dv-{snapshot_id}.puffin")
    if os.path.exists(out):  # crashed-export retry: reuse, don't rewrite
        metas = read_puffin_footer(out)["blobs"]
        return out, [
            (
                m["properties"]["referenced-data-file"],
                m["offset"],
                m["length"],
                int(m["properties"]["cardinality"]),
            )
            for m in metas
        ]
    masks = _mor_file_masks(table, snap, buckets, keys=keys)
    if not masks:
        return None
    if prior_union:
        # incremental (append-only span): the restricted mask holds only
        # the appended keys' dead rows — union with the file's PRIOR DV
        # (one blob read from the prior Puffin). Sound because masks are
        # monotone between rewrites; byte-identical to a full recompute
        # by canonical roaring serialization.
        import numpy as np

        from datax_spark.lake.delta import deserialize_dv, serialize_dv
        from datax_spark.lake.puffin import (
            dv_positions_from_blob,
            read_puffin_blob,
        )

        for rel in list(masks):
            prior = prior_union.get(os.path.join(location, rel))
            if prior is None:
                continue
            ppath, off, ln = prior
            prior_pos = np.asarray(
                dv_positions_from_blob(read_puffin_blob(ppath, off, ln)),
                dtype=np.uint64,
            )
            payload, _card = masks[rel]
            merged = np.union1d(
                prior_pos,
                np.asarray(deserialize_dv(payload), dtype=np.uint64),
            )
            masks[rel] = (serialize_dv(merged), int(merged.size))
    blobs = []
    for rel in sorted(masks):
        payload, card = masks[rel]
        blobs.append(
            {
                "type": "deletion-vector-v1",
                "fields": [],
                # the manifest entry is the authority for snapshot and
                # sequence — the reference DV writer stamps -1 here
                "snapshot-id": -1,
                "sequence-number": -1,
                "data": frame_dv_payload(payload),
                "properties": {
                    "referenced-data-file": os.path.join(location, rel),
                    "cardinality": str(card),
                },
            }
        )
    metas = write_puffin(
        out, blobs, {"created-by": "datax-spark iceberg exporter"}
    )
    return out, [
        (
            m["properties"]["referenced-data-file"],
            m["offset"],
            m["length"],
            int(m["properties"]["cardinality"]),
        )
        for m in metas
    ]


# files proven free of NULL-_seq rows (immutable once written, and file
# names are unique per write) — avoids re-reading the same footers on
# every sync_iceberg batch of a long stream
_NULL_SEQ_CLEAN: set[str] = set()


def _check_no_null_seq_after(
    location: str, rels_with_versions: list[tuple[str, int]], min_delete_v: int
) -> None:
    """Refuse export when a data file NEWER than the oldest live delete
    carries NULL ``_seq`` rows (bulk-loaded): the engine kills NULL-seq
    rows on ANY delete for their key, but Iceberg's file-sequence rule
    would keep them (their file postdates the delete). Parquet-footer
    null counts only — no data read; clean files are memoized
    process-wide (immutable files, unique names)."""
    import pyarrow.parquet as pq

    for rel, v in rels_with_versions:
        if v <= min_delete_v:
            continue
        apath = os.path.join(location, rel)
        if apath in _NULL_SEQ_CLEAN:
            continue
        md = pq.ParquetFile(apath).metadata
        try:
            idx = [md.schema.column(i).name for i in range(md.num_columns)].index("_seq")
        except ValueError:
            continue
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or st.null_count is None or st.null_count > 0:
                raise IcebergUnexportableState(
                    f"data file {rel} postdates a live equality delete and "
                    "carries (or cannot prove the absence of) NULL-_seq "
                    "bulk-loaded rows, which Iceberg's file-sequence "
                    "delete rule cannot kill — compact() first"
                )
        _NULL_SEQ_CLEAN.add(apath)


def export_iceberg(
    table, version: int | None = None, delete_files: str = "eq"
) -> str:
    """Publish ``table``'s snapshot as Apache Iceberg v2 metadata under
    ``<table.path>/metadata/`` (in-place: data files are referenced
    where they already live). Repeat calls after further lake commits
    append NEW Iceberg snapshots incrementally — unchanged files ride
    along as EXISTING manifest entries keeping their original snapshot
    lineage, so Iceberg-side time travel across exports works.

    MOR snapshots with LIVE deltas / equality-deletes export too (the
    north-star loop: every CDC batch mirrors without waiting for
    compaction): delta files ride as data files at their true add
    versions, and each delta/eq-delete file contributes a synthesized
    keys-only **Iceberg v2 equality-delete file** at the same sequence
    number — Iceberg's "a delete kills rows in files with a SMALLER
    sequence number" then reproduces the engine's row-seq latest-wins
    exactly, because the replay-order contract (NOTES.md) makes commit
    order and row-seq order agree and per-batch dedup keeps one event
    per key per commit. States that model can't express raise
    IcebergUnexportableState: inline tombstones in deltas, patch
    (partial-column) deltas, NULL-seq bulk loads newer than a live
    delete, vacuumed early lineage.

    ``delete_files='pos'`` encodes live states as one **POSITION-delete
    file** instead (the spec's other delete encoding, what real
    compaction-averse writers emit): every row the resolved read hides
    becomes a (file_path, pos) record at the snapshot's sequence
    number, which by the spec's "position deletes apply to data files
    with sequence number <= theirs" rule masks them in every rider.
    Because the dead set is computed by the engine's OWN resolution,
    this expresses the states the equality encoding refuses — inline
    tombstones and post-delete NULL-seq bulk rows — leaving only
    patch deltas unexportable. Sequence numbering stays flat (no
    witnessed add-version walk needed).

    ``delete_files='dv'`` publishes **format-version 3** metadata and
    encodes the same dead-row set as spec v3 **deletion vectors**: one
    Puffin file per export holding a ``delete-vector-v1`` roaring
    bitmap per masked data file (lake/puffin.py — byte-identical to
    Delta's DV serialization, which the v3 spec adopted), referenced
    from the delete manifest via ``referenced_data_file`` /
    ``content_offset`` / ``content_size_in_bytes`` (field ids 143-145)
    with at most one DV per data file. v3's required row lineage is
    maintained: the table tracks ``next-row-id``, each snapshot its
    ``first-row-id``, and data files get stable ``first_row_id``
    assignments (null = spec inheritance for newly added files;
    explicit re-emission for EXISTING files across manifest rewrites).
    Once a table publishes v3 it never downgrades, and v3 refuses
    ``delete_files='pos'`` (the spec replaced position-delete files
    with DVs); ``'eq'`` stays legal at both versions.

    Returns the path of the new ``vN.metadata.json``.
    """
    if delete_files not in ("eq", "pos", "dv"):
        raise ValueError(
            f"delete_files must be 'eq', 'pos' or 'dv', got {delete_files!r}"
        )
    if getattr(table, "branch", None) is not None:
        raise ValueError(
            "export_iceberg publishes MAIN versions only: a branch's "
            "version numbers are a separate namespace and would collide "
            "with main snapshot ids in the shared metadata/ dir — "
            "publish_branch() first, then export"
        )
    snap = table.snapshot(version)
    live_deltas = [
        rel for files in snap.deltas.values() for rel in files
    ]
    live_eq = [
        rel for files in snap.eq_deletes.values() for rel in files
    ]
    if (live_deltas or live_eq) and snap.properties.get("mor_patch"):
        raise IcebergUnexportableState(
            "patch (partial-column) deltas are live; Iceberg data files "
            "are full rows — compact() to fold the patches, then export"
        )
    location = os.path.abspath(table.path)
    mdir = _metadata_dir(location)
    os.makedirs(mdir, exist_ok=True)
    now_ms = int(time.time() * 1000)

    prev_version = _current_metadata_version(location)
    prev_meta = _load_metadata(location, prev_version) if prev_version else None
    prior_files, prior_dvs = (
        _prior_file_index(location, prev_meta) if prev_meta else ({}, {})
    )

    # ---- format version: 'dv' needs v3 (deletion vectors + row
    # lineage), and a table once exported at v3 never downgrades (the
    # spec forbids it); v3 in turn bans position-delete FILES — DVs
    # replaced them — while equality deletes stay legal in both.
    prior_fv = int(prev_meta.get("format-version", 2)) if prev_meta else 2
    v3 = delete_files == "dv" or prior_fv >= 3
    if v3 and delete_files == "pos":
        raise ValueError(
            "format-version 3 tables cannot add position-delete files "
            "(the v3 spec replaced them with deletion vectors) — use "
            "delete_files='dv'"
        )

    # ---- schema (stable field ids across exports)
    prior_ids: dict[str, int] = {}
    prior_last = 0
    schemas: list[dict] = []
    if prev_meta:
        schemas = list(prev_meta["schemas"])
        last_schema = next(
            s
            for s in schemas
            if s["schema-id"] == prev_meta["current-schema-id"]
        )
        prior_ids = {f["name"]: f["id"] for f in last_schema["fields"]}
        prior_last = prev_meta["last-column-id"]
        # a column renamed between exports keeps its field id: look the
        # current name up through its retired physical names (newest
        # first — the most recent prior schema used the newest one)
        for cur, chain in (snap.properties.get("renames") or {}).items():
            if cur not in prior_ids:
                for old in reversed(chain):
                    if old in prior_ids:
                        prior_ids[cur] = prior_ids[old]
                        break
    # reuse the previous schema entry verbatim when nothing changed —
    # compared at the Spark level BEFORE converting, so nested-type
    # field ids never re-derive for an unchanged schema
    unchanged = bool(schemas) and [
        (f.name, f.dataType) for f in snap.schema.fields
    ] == [
        (f.name, f.dataType)
        for f in _from_iceberg_type(last_schema).fields
    ]
    if unchanged:
        ice_schema = last_schema
        schema_id = ice_schema["schema-id"]
        last_column_id = prior_last
    else:
        schema_id = len(schemas)
        ice_schema, last_column_id = schema_to_iceberg(
            snap.schema, schema_id, prior_ids, prior_last
        )
        schemas = schemas + [ice_schema]

    # ---- snapshot / sequence ids: the lake version is a monotone
    # positive long, valid for both (and self-documenting)
    snapshot_id = int(snap.version)
    seq_num = int(snap.version)
    if prev_meta and any(
        s["snapshot-id"] == snapshot_id for s in prev_meta["snapshots"]
    ):
        raise ValueError(
            f"lake version {snap.version} already exported "
            f"(Iceberg snapshot ids must be unique)"
        )

    # ---- manifest entries: every live base AND delta file, added vs
    # existing. With live deltas/eq-deletes, per-file sequence numbers
    # are the files' true lake add versions (witnessed walk), so the
    # synthesized equality deletes below apply in exactly the engine's
    # order; a delta-free snapshot keeps the cheap flat numbering.
    stats_cols = snap.properties.get("stats_cols") or []
    col_ids = {f["name"]: f["id"] for f in ice_schema["fields"]}
    col_types = {f["name"]: f["type"] for f in ice_schema["fields"]}
    prior_lake_v = (
        max(int(s["snapshot-id"]) for s in prev_meta["snapshots"])
        if prev_meta and prev_meta.get("snapshots")
        else None
    )
    addv = (
        _file_add_versions(table, snap, prior_files, prior_lake_v)
        if (live_deltas or live_eq) and delete_files == "eq"
        else None
    )
    rels = [
        (b, rel)
        for b, files in sorted(snap.buckets.items(), key=lambda kv: int(kv[0]))
        for rel in files
    ] + [
        (b, rel)
        for b, files in sorted(snap.deltas.items(), key=lambda kv: int(kv[0]))
        for rel in files
    ]
    abs_of = {rel: os.path.join(location, rel) for _, rel in rels}
    new_files = [
        abs_of[rel] for _, rel in rels if abs_of[rel] not in prior_files
    ]
    counts = _record_counts(table.spark, new_files)
    entries = []
    n_added = n_existing = 0
    rows_added = rows_existing = 0
    bytes_added = bytes_existing = 0
    for b, rel in rels:
        path = abs_of[rel]
        prior = prior_files.get(path)
        if prior is not None:
            n_existing += 1
            rows_existing += prior["data_file"]["record_count"]
            bytes_existing += prior["data_file"]["file_size_in_bytes"]
            entries.append(
                {
                    "status": 0,  # EXISTING
                    "snapshot_id": prior["snapshot_id"],
                    "sequence_number": prior["sequence_number"],
                    "file_sequence_number": prior["sequence_number"],
                    "data_file": prior["data_file"],
                }
            )
            continue
        n_added += 1
        nrec = counts[path]
        rows_added += nrec
        bytes_added += os.path.getsize(path)
        lower = []
        upper = []
        fstats = snap.file_stats.get(b, {}).get(rel, {})
        for col in stats_cols:
            mm = fstats.get(col)
            if not mm or col not in col_ids:
                continue
            t = col_types[col]
            if not isinstance(t, str):
                continue
            lo = _single_value(mm[0], t)
            hi = _single_value(mm[1], t)
            if lo is not None and hi is not None:
                lower.append({"key": col_ids[col], "value": lo})
                upper.append({"key": col_ids[col], "value": hi})
        file_seq = addv[rel] if addv is not None else seq_num
        entries.append(
            {
                "status": 1,  # ADDED
                "snapshot_id": snapshot_id,
                "sequence_number": file_seq,
                "file_sequence_number": file_seq,
                "data_file": {
                    "content": 0,  # DATA
                    "file_path": path,
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": nrec,
                    "file_size_in_bytes": os.path.getsize(path),
                    "lower_bounds": lower or None,
                    "upper_bounds": upper or None,
                    "split_offsets": None,
                    "equality_ids": None,
                    "sort_order_id": None,
                },
            }
        )

    # ---- synthesized equality-delete entries (live MOR state only):
    # one keys-only parquet per delta file (its keys kill every OLDER
    # copy — the Flink-CDC upsert encoding) and per lake eq-delete file
    # (real deletes, _seq column dropped), each at its add version.
    del_entries = []
    del_added = del_existing = 0
    del_rows_added = del_rows_existing = 0
    if (live_deltas or live_eq) and delete_files == "pos":
        # incremental: recompute dead rows only for buckets whose file
        # lists changed since the last exported snapshot; earlier
        # snapshots' position-delete files ride along as EXISTING
        # entries below (death is monotone while a file survives, and
        # stale rows for replaced files don't join). Full recompute
        # when the prior lake snapshot is gone (vacuumed) or the table
        # was rebucketed.
        from datax_spark.lake.delta import _changed_buckets

        changed = None
        prior_has_eq = any(
            p["data_file"]["content"] == 2 for p in prior_files.values()
        )
        if (
            prev_meta
            and prev_meta.get("snapshots")
            and not prior_has_eq  # eq->pos switch: the dropped equality
            # files covered unchanged buckets too — full recompute
        ):
            prior_lake_v = max(
                int(s["snapshot-id"]) for s in prev_meta["snapshots"]
            )
            try:
                changed = _changed_buckets(
                    snap, table.snapshot(prior_lake_v)
                )
            except Exception:
                changed = None
        # small append-only spans synthesize NEWLY-dead positions only
        # (the appended files' keys): previously-dead rows stay covered
        # by the prior position-delete files riding below as EXISTING —
        # Iceberg's accumulate-and-union delete semantics make the
        # restricted file exactly sufficient. (file_path, pos)
        # duplicates across delete files are spec-legal. Rewrite spans
        # fail the gate and recompute in full (prior entries point at
        # replaced files there and stop matching).
        keys = None
        if changed is not None:
            from datax_spark.lake.delta import _appended_keys_span

            try:
                keys = _appended_keys_span(
                    table, table.snapshot(prior_lake_v), snap
                )
            except Exception:
                keys = None
        synth = _synth_pos_delete_file(
            mdir, table, snap, snapshot_id, changed, keys=keys
        )
        for path, prior in prior_files.items():
            if prior["data_file"]["content"] != 1:
                continue
            del_existing += 1
            del_rows_existing += prior["data_file"]["record_count"]
            del_entries.append(
                {
                    "status": 0,  # EXISTING
                    "snapshot_id": prior["snapshot_id"],
                    "sequence_number": prior["sequence_number"],
                    "file_sequence_number": prior["sequence_number"],
                    "data_file": prior["data_file"],
                }
            )
        if synth is not None:
            dpath, nrec = synth
            del_added += 1
            del_rows_added += nrec
            del_entries.append(
                {
                    "status": 1,
                    "snapshot_id": snapshot_id,
                    "sequence_number": seq_num,
                    "file_sequence_number": seq_num,
                    "data_file": {
                        "content": 1,  # POSITION_DELETES
                        "file_path": dpath,
                        "file_format": "PARQUET",
                        "partition": {},
                        "record_count": nrec,
                        "file_size_in_bytes": os.path.getsize(dpath),
                        "lower_bounds": None,
                        "upper_bounds": None,
                        "split_offsets": None,
                        "equality_ids": None,
                        "sort_order_id": None,
                    },
                }
            )
    elif (live_deltas or live_eq) and delete_files == "dv":
        # ---- Iceberg v3 deletion vectors. Incremental like the pos
        # and Delta-DV paths: masks recompute only for buckets whose
        # file lists changed since the prior exported snapshot, and
        # the unchanged buckets' DVs ride along as EXISTING entries
        # still pointing into their original Puffin files (sound
        # because a key's rows, deltas and deletes all hash to one
        # bucket — a file's mask can only change with its bucket).
        # Full recompute when the prior export used a different delete
        # encoding (its delete files covered unchanged buckets too),
        # when the prior lake snapshot is gone, or on a rebucket.
        from datax_spark.lake.delta import _changed_buckets

        changed = None
        prior_other_deletes = any(
            p["data_file"]["content"] in (1, 2)
            for p in prior_files.values()
        )
        if (
            prev_meta
            and prev_meta.get("snapshots")
            and not prior_other_deletes
        ):
            prior_lake_v = max(
                int(s["snapshot-id"]) for s in prev_meta["snapshots"]
            )
            try:
                changed = _changed_buckets(
                    snap, table.snapshot(prior_lake_v)
                )
            except Exception:
                changed = None
        # small append-only spans recompute masks ONLY for the appended
        # keys and union with each file's prior DV blob (one Puffin
        # read per touched file); a changed-bucket file with no newly
        # dead rows keeps its prior DV as an EXISTING entry instead of
        # being recomputed. Bulk/rewrite spans take the full path.
        keys = None
        if changed is not None and prior_dvs:
            from datax_spark.lake.delta import _appended_keys_span

            try:
                keys = _appended_keys_span(
                    table, table.snapshot(prior_lake_v), snap
                )
            except Exception:
                keys = None
        prior_union = None
        if keys is not None:
            prior_union = {
                ref: (
                    p["data_file"]["file_path"],
                    p["data_file"]["content_offset"],
                    p["data_file"]["content_size_in_bytes"],
                )
                for ref, p in prior_dvs.items()
            }
        try:
            synth_dv = _synth_dv_file(
                mdir, table, snap, snapshot_id, changed,
                keys=keys, prior_union=prior_union,
            )
        except Exception:
            if keys is None:
                raise
            keys = prior_union = None  # fall back to the full recompute
            synth_dv = _synth_dv_file(
                mdir, table, snap, snapshot_id, changed
            )
        new_refs = (
            {ref for ref, _o, _l, _c in synth_dv[1]}
            if synth_dv is not None
            else set()
        )
        if changed is not None and prior_dvs:
            changed_set = set(changed)
            live_abs = set(abs_of.values())
            bucket_of: dict[str, int] = {}
            for section in ("buckets", "deltas"):
                for b, fl in getattr(snap, section).items():
                    for rel in fl:
                        bucket_of[os.path.join(location, rel)] = int(b)
            for ref in sorted(prior_dvs):
                prior = prior_dvs[ref]
                if ref not in live_abs or bucket_of.get(ref) is None:
                    continue  # referenced file gone
                if keys is not None:
                    if ref in new_refs:
                        continue  # superseded by the unioned new DV
                elif bucket_of[ref] in changed_set:
                    continue  # full path: mask recomputed
                del_existing += 1
                del_rows_existing += prior["data_file"]["record_count"]
                del_entries.append(
                    {
                        "status": 0,  # EXISTING
                        "snapshot_id": prior["snapshot_id"],
                        "sequence_number": prior["sequence_number"],
                        "file_sequence_number": prior["sequence_number"],
                        "data_file": prior["data_file"],
                    }
                )
        if synth_dv is not None:
            dpath, dv_info = synth_dv
            dsize = os.path.getsize(dpath)
            for ref, off, ln, card in dv_info:
                del_added += 1
                del_rows_added += card
                del_entries.append(
                    {
                        "status": 1,
                        "snapshot_id": snapshot_id,
                        "sequence_number": seq_num,
                        "file_sequence_number": seq_num,
                        "data_file": {
                            "content": 1,  # POSITION_DELETES (as a DV)
                            "file_path": dpath,
                            "file_format": "PUFFIN",
                            "partition": {},
                            "record_count": card,
                            "file_size_in_bytes": dsize,
                            "lower_bounds": None,
                            "upper_bounds": None,
                            "split_offsets": None,
                            "equality_ids": None,
                            "sort_order_id": None,
                            "referenced_data_file": ref,
                            "content_offset": off,
                            "content_size_in_bytes": ln,
                        },
                    }
                )
    elif addv is not None:
        key_cols = snap.properties["key_cols"]
        eq_ids = [col_ids[k] for k in key_cols]
        min_delete_v = min(addv[rel] for rel in live_deltas + live_eq)
        _check_no_null_seq_after(
            location, [(rel, addv[rel]) for _, rel in rels], min_delete_v
        )
        all_jobs = [(r, True) for r in sorted(live_deltas)] + [
            (r, False) for r in sorted(live_eq)
        ]
        # files already in the prior export carry their record_count
        # there — synthesize (= read the source keys) ONLY for new
        # ones, so per-sync work is O(new batch), not O(live deltas)
        new_jobs = [
            (rel, isd)
            for rel, isd in all_jobs
            if _synth_delete_path(mdir, rel) not in prior_files
        ]
        synths = _synth_delete_files(
            table.spark, mdir, location, new_jobs, key_cols
        )
        for rel, is_delta in all_jobs:
            dpath = _synth_delete_path(mdir, rel)
            prior = prior_files.get(dpath)
            if prior is not None:
                del_existing += 1
                del_rows_existing += prior["data_file"]["record_count"]
                del_entries.append(
                    {
                        "status": 0,
                        "snapshot_id": prior["snapshot_id"],
                        "sequence_number": prior["sequence_number"],
                        "file_sequence_number": prior["sequence_number"],
                        "data_file": prior["data_file"],
                    }
                )
                continue
            dpath, nrec = synths[rel]
            if nrec == 0:
                continue
            del_added += 1
            del_rows_added += nrec
            del_entries.append(
                {
                    "status": 1,
                    "snapshot_id": snapshot_id,
                    "sequence_number": addv[rel],
                    "file_sequence_number": addv[rel],
                    "data_file": {
                        "content": 2,  # EQUALITY_DELETES
                        "file_path": dpath,
                        "file_format": "PARQUET",
                        "partition": {},
                        "record_count": nrec,
                        "file_size_in_bytes": os.path.getsize(dpath),
                        "lower_bounds": None,
                        "upper_bounds": None,
                        "split_offsets": None,
                        "equality_ids": eq_ids,
                        "sort_order_id": None,
                    },
                }
            )

    # ---- write manifests (one data + optionally one delete per export)
    def _write_manifest_avro(kind: str, ents: list[dict]) -> str:
        p = os.path.join(
            mdir, f"manifest-{kind}-{snapshot_id}-{uuid.uuid4().hex}.avro"
        )
        write_container(
            p,
            _manifest_entry_schema(v3),
            ents,
            meta={
                "schema": json.dumps(ice_schema),
                "schema-id": str(schema_id),
                "partition-spec": "[]",
                "partition-spec-id": "0",
                "format-version": "3" if v3 else "2",
                "content": kind,
            },
        )
        return p

    # ---- v3 row lineage: this snapshot's id block starts at the
    # table's next-row-id; entries written with a NULL first_row_id
    # (newly added files, plus files first exported under v2 — their
    # ids assign lazily on upgrade, per the spec) inherit
    # manifest.first_row_id + the record counts of the null entries
    # before them, so the block advances by exactly the null entries'
    # rows. EXISTING files re-emit their reconstructed assignment
    # explicitly (_prior_file_index), keeping ids stable across the
    # per-export manifest rewrites.
    base_row_id = (
        int(prev_meta.get("next-row-id", 0)) if prev_meta else 0
    )
    assigned_rows = sum(
        e["data_file"]["record_count"]
        for e in entries
        if e["data_file"].get("first_row_id") is None
    )

    manifest_path = _write_manifest_avro("data", entries)
    list_rows = [
        {
            "first_row_id": base_row_id if v3 else None,
            "manifest_path": manifest_path,
            "manifest_length": os.path.getsize(manifest_path),
            "partition_spec_id": 0,
            "content": 0,
            "sequence_number": seq_num,
            "min_sequence_number": min(
                [e["sequence_number"] for e in entries], default=seq_num
            ),
            "added_snapshot_id": snapshot_id,
            "added_files_count": n_added,
            "existing_files_count": n_existing,
            "deleted_files_count": 0,
            "added_rows_count": rows_added,
            "existing_rows_count": rows_existing,
            "deleted_rows_count": 0,
            "partitions": [],
        }
    ]
    if del_entries:
        del_manifest_path = _write_manifest_avro("deletes", del_entries)
        list_rows.append(
            {
                "first_row_id": None,  # row ids are for data manifests
                "manifest_path": del_manifest_path,
                "manifest_length": os.path.getsize(del_manifest_path),
                "partition_spec_id": 0,
                "content": 1,  # DELETES
                "sequence_number": seq_num,
                "min_sequence_number": min(
                    e["sequence_number"] for e in del_entries
                ),
                "added_snapshot_id": snapshot_id,
                "added_files_count": del_added,
                "existing_files_count": del_existing,
                "deleted_files_count": 0,
                "added_rows_count": del_rows_added,
                "existing_rows_count": del_rows_existing,
                "deleted_rows_count": 0,
                "partitions": [],
            }
        )
    manifest_list_path = os.path.join(
        mdir, f"snap-{snapshot_id}-{uuid.uuid4().hex}.avro"
    )
    write_container(
        manifest_list_path,
        _manifest_list_schema(v3),
        list_rows,
        meta={"format-version": "3" if v3 else "2"},
    )

    # ---- metadata.json
    snapshot_entry = {
        "snapshot-id": snapshot_id,
        "sequence-number": seq_num,
        "timestamp-ms": now_ms,
        "manifest-list": manifest_list_path,
        "summary": {
            # spec operation vocabulary: "append" iff no previously
            # live DATA file disappeared AND no delete file was added
            # in this snapshot (pure adds — bulk loads, new-key MOR
            # delta appends), else "overwrite". The incremental append
            # scan (read_iceberg_appends) keys off this to refuse
            # rewritten history, like real engines.
            "operation": _snapshot_operation(
                prior_files, set(abs_of.values()), del_added
            ),
            "added-data-files": str(n_added),
            "total-data-files": str(n_added + n_existing),
            "added-records": str(rows_added),
            "total-records": str(rows_added + rows_existing),
            "added-files-size": str(bytes_added),
            "total-files-size": str(bytes_added + bytes_existing),
            **(
                {
                    "added-delete-files": str(del_added),
                    "total-delete-files": str(del_added + del_existing),
                    (
                        "total-position-deletes"
                        if delete_files in ("pos", "dv")
                        else "total-equality-deletes"
                    ): str(del_rows_added + del_rows_existing),
                }
                if del_entries
                else {}
            ),
        },
        "schema-id": schema_id,
    }
    if v3:
        # row-lineage block: catalogs advance next-row-id from these
        # two fields without reading manifests
        snapshot_entry["first-row-id"] = base_row_id
        snapshot_entry["added-rows"] = assigned_rows
    table_uuid = (
        prev_meta["table-uuid"]
        if prev_meta
        else str(uuid.uuid5(uuid.NAMESPACE_URL, f"datax-spark-lake:{location}"))
    )
    snapshots = (list(prev_meta["snapshots"]) if prev_meta else []) + [
        snapshot_entry
    ]
    snapshot_log = (
        list(prev_meta.get("snapshot-log", [])) if prev_meta else []
    ) + [{"timestamp-ms": now_ms, "snapshot-id": snapshot_id}]
    metadata_log = list(prev_meta.get("metadata-log", [])) if prev_meta else []
    if prev_meta:
        metadata_log.append(
            {
                "timestamp-ms": prev_meta["last-updated-ms"],
                "metadata-file": os.path.join(
                    mdir, f"v{prev_version}.metadata.json"
                ),
            }
        )
    meta = {
        "format-version": 3 if v3 else 2,
        "table-uuid": table_uuid,
        "location": location,
        **({"next-row-id": base_row_id + assigned_rows} if v3 else {}),
        "last-sequence-number": seq_num,
        "last-updated-ms": now_ms,
        "last-column-id": last_column_id,
        "current-schema-id": schema_id,
        "schemas": schemas,
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,  # spec: partition field ids start at 1000
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {
            "write.format.default": "parquet",
            "schema.name-mapping.default": json.dumps(
                _name_mapping(
                    ice_schema, snap.properties.get("renames") or {}
                )
            ),
        },
        "current-snapshot-id": snapshot_id,
        "snapshots": snapshots,
        "snapshot-log": snapshot_log,
        "metadata-log": metadata_log,
        "refs": {
            "main": {"snapshot-id": snapshot_id, "type": "branch"},
            # lake TAGS whose versions are exported snapshots ride as
            # Iceberg tag refs, so the mirror's time travel is named
            # (`read_iceberg(..., ref="v-gold")`). A tag created after
            # the last export mirrors at the NEXT export (sync_iceberg
            # no-ops while the head version is already published).
            **{
                name: {"snapshot-id": int(v), "type": "tag"}
                for name, v in sorted(
                    getattr(table, "tags", lambda: {})().items()
                )
                if any(s["snapshot-id"] == int(v) for s in snapshots)
            },
        },
    }
    new_version = prev_version + 1
    meta_path = os.path.join(mdir, f"v{new_version}.metadata.json")
    tmp = f"{meta_path}.tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    os.replace(tmp, meta_path)
    hint_tmp = os.path.join(mdir, f"version-hint.tmp-{os.getpid()}")
    with open(hint_tmp, "w") as f:
        f.write(str(new_version))
    os.replace(hint_tmp, os.path.join(mdir, "version-hint.text"))
    return meta_path


def sync_iceberg(table, delete_files: str = "eq") -> str | None:
    """Catch the Iceberg metadata up to the lake's current version —
    the continuous-publish form of ``export_iceberg``, safe to wire as
    a ``PipelineConfig.on_commit`` hook (``lambda m: sync_iceberg(t)``)
    so every committed CDC batch lands as a new Iceberg snapshot.

    No-ops (returns None) when already in sync, AND on the transient
    states Iceberg can't express (IcebergUnexportableState: inline
    tombstones or patch columns in live deltas, post-delete NULL-seq
    bulk rows, vacuumed early lineage) — the mirror catches up at the
    next exportable commit, e.g. right after ``auto_compact``. Live
    ``delete_encoding='eq'`` MOR states DO export (deltas as data files
    + synthesized equality-delete files), so a steady CDC stream
    mirrors every batch without waiting for compaction. Export cost is
    O(files added since the last sync): unchanged files ride along as
    EXISTING entries without re-reading footers.

    ``delete_files='pos'`` mirrors live states as position-delete
    files instead (see ``export_iceberg``) — that mode also exports
    inline-tombstone states, so a default-encoded (inline) CDC stream
    mirrors every batch too; only patch deltas stay transient.
    ``delete_files='dv'`` does the same with format-version-3
    deletion vectors (Puffin roaring bitmaps, incremental per changed
    bucket) — the modern encoding real v3 writers emit.

    Retention couples to lake ``vacuum`` through
    ``iceberg_pinned_versions``: vacuum treats every exported Iceberg
    snapshot like a tag (its lake manifest and data files survive), so
    an external Iceberg reader's time travel never dangles. The release
    valve is ``expire_iceberg`` — run it before vacuum to let old
    versions actually reclaim."""
    snap = table.snapshot()
    loc = os.path.abspath(table.path)
    v = _current_metadata_version(loc)
    if v:
        meta = _load_metadata(loc, v)
        if any(
            s["snapshot-id"] == int(snap.version) for s in meta["snapshots"]
        ):
            return None
    try:
        return export_iceberg(
            table, version=snap.version, delete_files=delete_files
        )
    except IcebergUnexportableState:
        return None


def iceberg_pinned_versions(location: str) -> set[int]:
    """Lake versions the CURRENT Iceberg metadata still exposes as
    snapshots (snapshot id == lake version by construction). Lake
    ``vacuum`` unions these into its retained set so expiring the
    Iceberg mirror (``expire_iceberg``) — not a lake-side retention
    knob — is what releases an exported snapshot's files. Returns empty
    when the table was never exported. Driver-side metadata read,
    O(snapshot count)."""
    try:
        meta = _load_metadata(location)
    except FileNotFoundError:
        return set()
    return {int(s["snapshot-id"]) for s in meta["snapshots"]}


def expire_iceberg(table_or_location, keep_last: int = 1) -> dict[str, int]:
    """Iceberg ``expire_snapshots``: publish a new metadata version that
    keeps only the newest ``keep_last`` snapshots and delete the expired
    snapshots' manifest-list/manifest Avro files. DATA files are never
    touched — the lake owns them, and this is exactly what unpins them
    from ``vacuum`` (see ``iceberg_pinned_versions``). Maintenance
    recipe: ``expire_iceberg(t, keep_last=k)`` then ``t.vacuum(...)``.

    Matches real Iceberg's documented hazard: a reader holding a STALE
    metadata.json (the files themselves are kept for the metadata-log)
    can no longer resolve expired snapshots' manifests; readers of the
    current metadata are unaffected. Driver-side O(snapshots) metadata
    work, no Spark jobs."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    location = (
        table_or_location
        if isinstance(table_or_location, str)
        else os.path.abspath(table_or_location.path)
    )
    prev_version = _current_metadata_version(location)
    meta = _load_metadata(location, prev_version)
    snaps = sorted(meta["snapshots"], key=lambda s: s["sequence-number"])
    if len(snaps) <= keep_last:
        return {
            "expired_snapshots": 0,
            "kept_snapshots": len(snaps),
            "removed_files": 0,
        }
    # spec behavior: snapshots referenced by a ref (a mirrored lake
    # tag) never expire by age — drop the tag ref first to release them
    pinned = {
        r["snapshot-id"]
        for name, r in meta.get("refs", {}).items()
        if name != "main"
    }
    kept = [
        s
        for i, s in enumerate(snaps)
        if i >= len(snaps) - keep_last or s["snapshot-id"] in pinned
    ]
    expired = [s for s in snaps if s not in kept]
    if not expired:
        return {
            "expired_snapshots": 0,
            "kept_snapshots": len(kept),
            "removed_files": 0,
        }
    # the current snapshot is the newest (export refuses id reuse and
    # ids are monotone lake versions) — it always survives
    assert any(
        s["snapshot-id"] == meta["current-snapshot-id"] for s in kept
    )
    kept_ids = {s["snapshot-id"] for s in kept}
    mdir = _metadata_dir(location)
    new_meta = dict(meta)
    new_meta["snapshots"] = kept
    new_meta["snapshot-log"] = [
        e for e in meta.get("snapshot-log", []) if e["snapshot-id"] in kept_ids
    ]
    new_meta["last-updated-ms"] = int(time.time() * 1000)
    new_meta["metadata-log"] = list(meta.get("metadata-log", [])) + [
        {
            "timestamp-ms": meta["last-updated-ms"],
            "metadata-file": os.path.join(
                mdir, f"v{prev_version}.metadata.json"
            ),
        }
    ]
    meta_path = os.path.join(mdir, f"v{prev_version + 1}.metadata.json")
    tmp = f"{meta_path}.tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(new_meta, f, indent=1, sort_keys=True)
    os.replace(tmp, meta_path)
    hint_tmp = os.path.join(mdir, f"version-hint.tmp-{os.getpid()}")
    with open(hint_tmp, "w") as f:
        f.write(str(prev_version + 1))
    os.replace(hint_tmp, os.path.join(mdir, "version-hint.text"))
    # physical cleanup AFTER the new metadata publishes (crash between
    # the two leaves unreferenced-but-harmless files, never a dangling
    # reference). Manifest-list + manifests are per-snapshot (each
    # export writes its own pair); synthesized equality-delete parquets
    # under metadata/ are SHARED across snapshots via EXISTING entries,
    # so they go only when no kept snapshot still references them. Lake
    # data files are never touched — vacuum owns those.
    kept_meta_files: set[str] = set()
    for s in kept:
        try:
            _, manifests = read_container(s["manifest-list"])
        except FileNotFoundError:
            continue
        for m in manifests:
            _, ents = read_container(m["manifest_path"])
            for e in ents:
                p = e["data_file"]["file_path"]
                if os.path.dirname(p) == mdir:
                    kept_meta_files.add(p)
    removed = 0
    for s in expired:
        try:
            _, manifests = read_container(s["manifest-list"])
        except FileNotFoundError:
            continue
        for m in manifests:
            mp = m["manifest_path"]
            if not os.path.exists(mp):
                continue
            _, ents = read_container(mp)
            for e in ents:
                p = e["data_file"]["file_path"]
                if (
                    os.path.dirname(p) == mdir
                    and p not in kept_meta_files
                    and os.path.exists(p)
                ):
                    os.unlink(p)
                    removed += 1
            os.unlink(mp)
            removed += 1
        os.unlink(s["manifest-list"])
        removed += 1
    return {
        "expired_snapshots": len(expired),
        "kept_snapshots": len(kept),
        "removed_files": removed,
    }


# ---------------------------------------------------------------------------
# import (scan planning purely from the Iceberg metadata)
# ---------------------------------------------------------------------------


def iceberg_plan(
    location: str,
    snapshot_id: int | None = None,
    metadata: dict | None = None,
    ref: str | None = None,
    filters: list[tuple[str, str, Any]] | None = None,
) -> dict[str, Any]:
    """Plan a scan from Iceberg metadata alone: resolve the snapshot,
    walk its manifest list and manifests, return schema + live data
    files (with per-file sequence numbers) + equality-delete files +
    position-delete files + deletion vectors. ``metadata`` short-cuts
    the version-hint file read when the caller already holds the
    metadata document (a REST catalog ``loadTable`` response); ``ref``
    resolves a named branch/tag ref instead of a snapshot id.

    ``filters`` — the ``plan_scan`` grammar, ``[(col, op, value), ...]``
    with ops ``= < <= > >=`` — prunes data files by the manifests'
    per-file [lower, upper] bounds (recorded at export for the lake's
    ``stats_cols``): a file is dropped only when a clause PROVABLY
    excludes every row; missing bounds fail open. Delete files are
    never pruned (a kept file's rows may still die to them); dropped
    files' deletes simply stop matching. ``skipped_files`` reports the
    pruning, and ``total_rows`` counts kept files only."""
    meta = metadata if metadata is not None else _load_metadata(location)
    if ref is not None:
        if snapshot_id is not None:
            raise ValueError("pass snapshot_id or ref, not both")
        r = meta.get("refs", {}).get(ref)
        if r is None:
            raise ValueError(
                f"ref {ref!r} not in {location} metadata "
                f"(have {sorted(meta.get('refs', {}))})"
            )
        snapshot_id = r["snapshot-id"]
    snap_id = (
        snapshot_id if snapshot_id is not None else meta["current-snapshot-id"]
    )
    snap = next(
        (s for s in meta["snapshots"] if s["snapshot-id"] == snap_id), None
    )
    if snap is None:
        raise ValueError(f"snapshot {snap_id} not in {location} metadata")
    schema_id = snap.get("schema-id", meta["current-schema-id"])
    ice_schema = next(
        s for s in meta["schemas"] if s["schema-id"] == schema_id
    )
    spec = next(
        (
            s
            for s in meta.get("partition-specs", [])
            if s["spec-id"] == meta.get("default-spec-id", 0)
        ),
        {"fields": []},
    )
    if spec.get("fields"):
        # identity-partitioned foreign tables may store partition values
        # ONLY in metadata; a plain parquet scan would silently null
        # them — refuse instead (this reader targets unpartitioned
        # metadata, which is all export_iceberg writes)
        raise NotImplementedError(
            "partitioned Iceberg tables are not supported by this reader"
        )
    files: list[str] = []
    data_seq: dict[str, int] = {}
    eq_deletes: list[tuple[str, int, list[int]]] = []
    pos_deletes: list[tuple[str, int]] = []
    dvs: list[dict[str, Any]] = []
    total_rows = 0
    skipped_files = 0
    # hoisted for the filter-pruning arm: at 100-TB scale the manifest
    # walk is O(files) and must not rebuild these per entry
    _type_of = {
        f["id"]: f["type"]
        for f in ice_schema["fields"]
        if isinstance(f["type"], str)
    }
    _col_ids = {f["name"]: f["id"] for f in ice_schema["fields"]}
    _, manifests = read_container(snap["manifest-list"])
    for m in manifests:
        _, entries = read_container(m["manifest_path"])
        for e in entries:
            if e["status"] == 2:
                continue
            df = e["data_file"]
            fmt = df["file_format"].upper()
            if df["content"] == 1 and fmt == "PUFFIN":
                # v3 deletion vector: one blob slice per referenced file
                if not df.get("referenced_data_file"):
                    raise ValueError(
                        f"PUFFIN delete entry without referenced_data_file "
                        f"in {m['manifest_path']}"
                    )
                dvs.append(
                    {
                        "puffin": df["file_path"],
                        "offset": df["content_offset"],
                        "length": df["content_size_in_bytes"],
                        "referenced": df["referenced_data_file"],
                        "cardinality": df["record_count"],
                        "seq": e["sequence_number"],
                    }
                )
                continue
            if fmt != "PARQUET":
                raise NotImplementedError(
                    f"file format {df['file_format']!r} not supported"
                )
            if df["content"] == 0:
                if filters:
                    bounds: dict[int, tuple[Any, Any]] = {}
                    lowers = {
                        kv["key"]: kv["value"]
                        for kv in (df.get("lower_bounds") or [])
                    }
                    uppers = {
                        kv["key"]: kv["value"]
                        for kv in (df.get("upper_bounds") or [])
                    }
                    for cid in set(lowers) & set(uppers):
                        t = _type_of.get(cid)
                        if t:
                            bounds[cid] = (
                                _decode_single(lowers[cid], t),
                                _decode_single(uppers[cid], t),
                            )
                    if not _file_may_match(bounds, filters, _col_ids):
                        skipped_files += 1
                        continue
                files.append(df["file_path"])
                data_seq[df["file_path"]] = e["sequence_number"]
                total_rows += df["record_count"]
            elif df["content"] == 2:
                eq_deletes.append(
                    (df["file_path"], e["sequence_number"], df["equality_ids"])
                )
            elif df["content"] == 1:
                pos_deletes.append((df["file_path"], e["sequence_number"]))
            else:
                raise NotImplementedError(
                    f"unknown delete-file content {df['content']!r}"
                )
    seen_refs: set[str] = set()
    for d in dvs:
        if d["referenced"] in seen_refs:
            raise ValueError(
                f"multiple deletion vectors reference {d['referenced']} "
                "(the v3 spec allows at most one per data file)"
            )
        seen_refs.add(d["referenced"])
    return {
        "snapshot_id": snap_id,
        "schema": _from_iceberg_type(ice_schema),
        "iceberg_schema": ice_schema,
        "files": files,
        "data_seq": data_seq,
        "eq_deletes": eq_deletes,
        "pos_deletes": pos_deletes,
        "dvs": dvs,
        "total_rows": total_rows,
        "skipped_files": skipped_files,
        "metadata": meta,
    }


def read_iceberg(
    spark: SparkSession,
    location: str,
    snapshot_id: int | None = None,
    metadata: dict | None = None,
    ref: str | None = None,
    filters: list[tuple[str, str, Any]] | None = None,
) -> DataFrame:
    """Read an Iceberg table (written by ``export_iceberg``) purely from
    its Iceberg metadata — the lake's own manifests are never consulted,
    which is what makes the round-trip a real interop proof. One
    multi-file parquet scan; name-based column resolution against the
    snapshot's schema (the name-mapping contract).

    Equality deletes apply by the spec's file-sequence rule: a data row
    dies iff some delete file matching its equality columns has a
    STRICTLY larger sequence number than the row's data file. Physical
    shape: the per-file sequence rides in via one broadcast
    (path -> seq) join on ``input_file_name()``, and the delete side
    collapses to a per-key max before ONE broadcast left join — the
    100-TB data side never shuffles.

    ``filters`` (plan_scan grammar) prunes files by manifest bounds at
    PLAN time (see ``iceberg_plan``) and applies the same predicate
    row-level, so the result is exactly the filtered table while the
    scan opens only files that can match."""
    from pyspark.sql import functions as _F

    plan = iceberg_plan(location, snapshot_id, metadata, ref, filters)
    if filters and plan["files"]:
        plan["files"], _ = _bloom_prune(spark, plan["files"], filters)
    schema: T.StructType = plan["schema"]

    _OPS = {
        "=": lambda c, v: c == _F.lit(v),
        "<": lambda c, v: c < _F.lit(v),
        "<=": lambda c, v: c <= _F.lit(v),
        ">": lambda c, v: c > _F.lit(v),
        ">=": lambda c, v: c >= _F.lit(v),
        "in": lambda c, v: c.isin(list(v)),
    }

    def _residual(d: DataFrame) -> DataFrame:
        for col, op, val in filters or []:
            if op not in _OPS:
                raise ValueError(f"unsupported filter op {op!r}")
            d = d.filter(_OPS[op](_F.col(col), val))
        return d

    if not plan["files"]:
        return _residual(spark.createDataFrame([], schema))
    # name mapping (spec "Column Projection"): a field listing several
    # names was renamed at some point — any one file physically carries
    # exactly one of them, so request all and coalesce in listed order
    # (current first, then newest retired), typed as the current field.
    mapping = json.loads(
        plan["metadata"].get("properties", {}).get(
            "schema.name-mapping.default", "[]"
        )
    )
    alt_names = {
        m["names"][0]: m["names"][1:]
        for m in mapping
        if len(m.get("names", [])) > 1
    }
    alt_names = {
        k: v for k, v in alt_names.items()
        if any(f.name == k for f in schema.fields)
    }
    from pyspark.sql import functions as F

    phys = []
    for f in schema.fields:
        phys.append(f)
        for old in alt_names.get(f.name, []):
            phys.append(T.StructField(old, f.dataType, True))
    df = spark.read.schema(T.StructType(phys)).parquet(*plan["files"])
    cols = []
    for f in schema.fields:
        alts = alt_names.get(f.name)
        if alts:
            cols.append(
                F.coalesce(F.col(f.name), *[F.col(a) for a in alts]).alias(
                    f.name
                )
            )
        else:
            cols.append(F.col(f.name))
    if (
        not plan["eq_deletes"]
        and not plan["pos_deletes"]
        and not plan["dvs"]
    ):
        return _residual(df.select(*cols))

    if plan["pos_deletes"] or plan["dvs"]:
        # ---- position-delete application (+ equality if both present):
        # a data row dies iff some position-delete file with sequence
        # number >= its data file's lists its (file_path, pos). The
        # delete side collapses to a per-(file,pos) max sequence and
        # BROADCASTS (bounded by mask volume — data superseded since
        # the last compaction); the data side reads `_metadata`
        # (file_path + row_index) and never shuffles.
        fpath = F.url_decode(
            F.regexp_replace(
                F.col("_metadata.file_path"), r"^[a-z]+:(//)?", ""
            )
        )
        seq_rows = [(p, int(s)) for p, s in plan["data_seq"].items()]
        seq_df = spark.createDataFrame(
            seq_rows, T.StructType([
                T.StructField("_fpath", T.StringType()),
                T.StructField("_fseq", T.LongType()),
            ])
        )
        data = df.select(
            *cols,
            fpath.alias("_fpath"),
            F.col("_metadata.row_index").alias("_pos"),
        ).join(F.broadcast(seq_df), "_fpath", "left")
        pschema = T.StructType([
            T.StructField("file_path", T.StringType()),
            T.StructField("pos", T.LongType()),
        ])
        pdel = None
        for p, s in plan["pos_deletes"]:
            d = spark.read.schema(pschema).parquet(p).select(
                F.col("file_path").alias("_fpath"),
                F.col("pos").alias("_pos"),
                F.lit(int(s)).cast("long").alias("_pdseq"),
            )
            pdel = d if pdel is None else pdel.unionByName(d)
        if plan["dvs"]:
            # v3 deletion vectors: decode the Puffin blob slices
            # driver-side (bounded by mask volume — the same rows a
            # compaction would drop) and ride the same broadcast
            # anti-join. A DV kills its positions in the referenced
            # file UNCONDITIONALLY (the manifest ties it to the file),
            # encoded here as a +inf delete sequence.
            from datax_spark.lake.puffin import (
                dv_positions_from_blob,
                read_puffin_blob,
            )

            dv_rows = []
            for d in plan["dvs"]:
                blob = read_puffin_blob(
                    d["puffin"], d["offset"], d["length"]
                )
                positions = dv_positions_from_blob(blob)
                if len(positions) != d["cardinality"]:
                    raise ValueError(
                        f"DV cardinality mismatch for {d['referenced']}: "
                        f"{len(positions)} != {d['cardinality']}"
                    )
                dv_rows.extend(
                    (d["referenced"], int(p), 1 << 62) for p in positions
                )
            dvf = spark.createDataFrame(
                dv_rows,
                T.StructType([
                    T.StructField("_fpath", T.StringType()),
                    T.StructField("_pos", T.LongType()),
                    T.StructField("_pdseq", T.LongType()),
                ]),
            )
            pdel = dvf if pdel is None else pdel.unionByName(dvf)
        pmax = pdel.groupBy("_fpath", "_pos").agg(
            F.max("_pdseq").alias("_pdmax")
        )
        joined = data.join(
            F.broadcast(pmax), on=["_fpath", "_pos"], how="left"
        )
        checked = F.coalesce(
            F.assert_true(
                F.col("_fseq").isNotNull(),
                F.lit("read_iceberg: _metadata.file_path did not match "
                      "any manifest file_path"),
            ).cast("boolean"),
            F.lit(True),
        )
        alive = checked & (
            F.col("_pdmax").isNull() | (F.col("_pdmax") < F.col("_fseq"))
        )
        if plan["eq_deletes"]:
            id_sets = {tuple(ids) for _, _, ids in plan["eq_deletes"]}
            if len(id_sets) != 1:
                raise NotImplementedError(
                    "heterogeneous equality_ids across delete files"
                )
            id_to_name = {
                fld["id"]: fld["name"]
                for fld in plan["iceberg_schema"]["fields"]
            }
            key_names = [id_to_name[i] for i in plan["eq_deletes"][0][2]]
            by_name = {f.name: f for f in schema.fields}
            key_schema = T.StructType([by_name[k] for k in key_names])
            dels = None
            for p, s, _ids in plan["eq_deletes"]:
                d = spark.read.schema(key_schema).parquet(p).select(
                    *key_names,
                    F.lit(int(s)).cast("long").alias("_dseq"),
                )
                dels = d if dels is None else dels.unionByName(d)
            dmax = dels.groupBy(*key_names).agg(
                F.max("_dseq").alias("_dmax")
            )
            joined = joined.join(
                F.broadcast(dmax), on=key_names, how="left"
            )
            alive = alive & (
                F.col("_dmax").isNull() | (F.col("_fseq") >= F.col("_dmax"))
            )
        return _residual(
            joined.filter(alive).select(*[f.name for f in schema.fields])
        )

    # ---- equality-delete application (file-sequence rule)
    id_sets = {tuple(ids) for _, _, ids in plan["eq_deletes"]}
    if len(id_sets) != 1:
        raise NotImplementedError(
            "heterogeneous equality_ids across delete files"
        )
    id_to_name = {
        fld["id"]: fld["name"] for fld in plan["iceberg_schema"]["fields"]
    }
    key_names = [id_to_name[i] for i in plan["eq_deletes"][0][2]]
    by_name = {f.name: f for f in schema.fields}
    key_schema = T.StructType([by_name[k] for k in key_names])
    # strip the URI scheme input_file_name prepends so paths join
    # against the manifest's absolute file_path values
    fpath = F.url_decode(
        F.regexp_replace(F.input_file_name(), r"^[a-z]+:(//)?", "")
    )
    seq_rows = [(p, int(s)) for p, s in plan["data_seq"].items()]
    seq_df = spark.createDataFrame(
        seq_rows, T.StructType([
            T.StructField("_fpath", T.StringType()),
            T.StructField("_fseq", T.LongType()),
        ])
    )
    data = df.select(*cols, fpath.alias("_fpath")).join(
        F.broadcast(seq_df), "_fpath", "left"
    )
    dels = None
    for p, s, _ids in plan["eq_deletes"]:
        d = spark.read.schema(key_schema).parquet(p).select(
            *key_names, F.lit(int(s)).cast("long").alias("_dseq")
        )
        dels = d if dels is None else dels.unionByName(d)
    dmax = dels.groupBy(*key_names).agg(F.max("_dseq").alias("_dmax"))
    joined = data.join(F.broadcast(dmax), on=key_names, how="left")
    # a NULL _fseq means input_file_name failed to match the manifest
    # path — that must surface, not silently keep/kill rows
    checked = F.coalesce(
        F.assert_true(
            F.col("_fseq").isNotNull(),
            F.lit("read_iceberg: input_file_name did not match any "
                  "manifest file_path"),
        ).cast("boolean"),
        F.lit(True),
    )
    alive = checked & (
        F.col("_dmax").isNull() | (F.col("_fseq") >= F.col("_dmax"))
    )
    return _residual(
        joined.filter(alive).select(*[f.name for f in schema.fields])
    )


def read_iceberg_appends(
    spark: SparkSession,
    location: str,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
    metadata: dict | None = None,
) -> DataFrame:
    """Incremental APPEND scan over the mirror: the rows added strictly
    after ``from_snapshot_id`` up to ``to_snapshot_id`` (default: the
    current snapshot) — the consumer loop real engines run against an
    Iceberg table (``option("start-snapshot-id", ...)``). Each row
    carries its ``_snapshot_id`` for lineage.

    Like real incremental scans this supports APPEND snapshots only:
    any snapshot in range whose summary operation is ``overwrite``
    (rewritten/deleted data — its added files carry surviving OLD rows,
    not deltas) raises, pointing the caller at the lake's own row-level
    change feed (``read_changes`` / the Delta CDF mirror), which
    expresses updates and deletes exactly. Driver work is O(snapshots
    in range + their manifests); the scan reads only the added files."""
    from pyspark.sql import functions as _F

    meta = metadata if metadata is not None else _load_metadata(location)
    snaps = sorted(meta["snapshots"], key=lambda s: s["sequence-number"])
    ids = [s["snapshot-id"] for s in snaps]
    if from_snapshot_id not in ids:
        raise ValueError(
            f"from_snapshot_id {from_snapshot_id} not in metadata "
            f"(have {ids}; it may have been expired)"
        )
    to_id = to_snapshot_id if to_snapshot_id is not None else ids[-1]
    if to_id not in ids:
        raise ValueError(f"to_snapshot_id {to_id} not in metadata")
    in_range = [
        s
        for s in snaps
        if from_snapshot_id < s["snapshot-id"] <= to_id
    ]
    schema = _from_iceberg_type(
        next(
            s
            for s in meta["schemas"]
            if s["schema-id"] == meta["current-schema-id"]
        )
    )
    out = None
    for s in in_range:
        op = s.get("summary", {}).get("operation")
        if op != "append":
            raise ValueError(
                f"snapshot {s['snapshot-id']} is {op!r}, not append — "
                "incremental append scans cannot express rewritten or "
                "deleted data; use the lake change feed "
                "(read_changes / the Delta CDF mirror) instead"
            )
        _, manifests = read_container(s["manifest-list"])
        added = []
        for m in manifests:
            if m["added_snapshot_id"] != s["snapshot-id"]:
                continue
            _, entries = read_container(m["manifest_path"])
            added.extend(
                e["data_file"]["file_path"]
                for e in entries
                if e["status"] == 1 and e["data_file"]["content"] == 0
            )
        if not added:
            continue
        d = spark.read.schema(schema).parquet(*added).withColumn(
            "_snapshot_id", _F.lit(int(s["snapshot-id"]))
        )
        out = d if out is None else out.unionByName(d)
    if out is None:
        return spark.createDataFrame(
            [],
            T.StructType(
                list(schema.fields)
                + [T.StructField("_snapshot_id", T.LongType())]
            ),
        )
    return out


# ---------------------------------------------------------------------------
# manifest min/max file skipping (the scan-planning half of an engine)
# ---------------------------------------------------------------------------


def _decode_single(b: bytes, ice_type: str) -> Any:
    """Inverse of ``_single_value`` (spec "Binary single-value")."""
    import struct as _struct

    if b is None:
        return None
    b = bytes(b)
    if ice_type == "string":
        return b.decode("utf-8")
    if ice_type == "long":
        return _struct.unpack("<q", b)[0]
    if ice_type == "int":
        return _struct.unpack("<i", b)[0]
    if ice_type == "double":
        return _struct.unpack("<d", b)[0]
    if ice_type == "float":
        return _struct.unpack("<f", b)[0]
    return None


def _file_may_match(
    bounds: dict[int, tuple[Any, Any]],
    filters: list[tuple[str, str, Any]],
    col_ids: dict[str, int],
) -> bool:
    """Manifest-bounds pruning: False only when some filter clause
    PROVABLY excludes every row of the file. Missing bounds or unknown
    ops fail open (the residual predicate still applies row-level)."""
    for col, op, val in filters:
        cid = col_ids.get(col)
        if cid is None or cid not in bounds:
            continue
        lo, hi = bounds[cid]
        if lo is None or hi is None:
            continue
        # incomparable types fail OPEN — the residual predicate would
        # have handled the cast row-level (ADVICE r4)
        try:
            if op == "=" and not (lo <= val <= hi):
                return False
            if op in (">=",) and hi < val:
                return False
            if op == ">" and hi <= val:
                return False
            if op in ("<=",) and lo > val:
                return False
            if op == "<" and lo >= val:
                return False
        except TypeError:
            continue
    return True


def _bloom_prune(
    spark: SparkSession,
    files: list[str],
    filters: list[tuple[str, str, Any]],
) -> tuple[list[str], int]:
    """The scan's third pruning pass (after manifest bounds): probe each
    surviving parquet file's own BLOOM FILTERS driver-side for ``=`` /
    ``in`` clauses — the point-lookup case min/max can't help with.
    Fails open everywhere (no bloom, unsupported type); executor
    fan-out past the same threshold the lake's plan_scan uses. Returns
    ``(kept_files, pruned_count)``."""
    probes: dict[str, Any] = {}
    for col, op, val in filters or []:
        if op == "=" and val is not None:
            probes[col] = [val]
        elif op == "in":
            vals = [v for v in val if v is not None]
            if vals:
                probes[col] = vals
    if not probes or not files:
        return files, 0
    from datax_spark.lake.parquet_bloom import file_might_contain
    from datax_spark.lake.stats import FILE_STATS_PARALLEL_THRESHOLD

    if len(files) <= FILE_STATS_PARALLEL_THRESHOLD:
        verdicts = [(p, file_might_contain(p, probes)) for p in files]
    else:
        sc = spark.sparkContext
        n_slices = max(1, min(len(files) // 8, sc.defaultParallelism))
        verdicts = (
            sc.parallelize(files, n_slices)
            .map(lambda p: (p, file_might_contain(p, probes)))
            .collect()
        )
    keep = dict(verdicts)
    kept = [p for p in files if keep.get(p, True)]
    return kept, len(files) - len(kept)


# ---------------------------------------------------------------------------
# metadata tables (the `t$snapshots` / `t$files` inspection surface)
# ---------------------------------------------------------------------------

_META_TABLE_KINDS = (
    "snapshots",
    "history",
    "refs",
    "manifests",
    "files",
    "data_files",
    "delete_files",
    "metadata_log_entries",
)


def iceberg_metadata_table(
    spark: SparkSession,
    location: str,
    kind: str,
    snapshot_id: int | None = None,
    metadata: dict | None = None,
) -> DataFrame:
    """The Iceberg METADATA-TABLE surface (what real engines expose as
    ``SELECT * FROM t$snapshots`` / ``t$files`` / ...), built purely
    from the exported metadata — the lake's own manifests are never
    consulted. Supported kinds: ``snapshots``, ``history``, ``refs``,
    ``manifests``, ``files`` (current snapshot's live entries, data AND
    deletes, incl. the v3 deletion-vector columns), ``data_files``,
    ``delete_files``, ``metadata_log_entries``. ``snapshot_id`` time
    travels the manifest-backed kinds; ``metadata`` short-cuts the
    version-hint read (a REST catalog loadTable response).

    Scale note: rows are built driver-side from the metadata/Avro
    files, O(snapshots + live files) — metadata-bounded work, the same
    reads any Iceberg engine does to serve these tables; nothing here
    touches data files."""
    if kind not in _META_TABLE_KINDS:
        raise ValueError(
            f"unknown metadata table {kind!r}; one of {_META_TABLE_KINDS}"
        )
    meta = metadata if metadata is not None else _load_metadata(location)

    def ts(ms):
        import datetime as _dt

        return _dt.datetime.fromtimestamp(ms / 1000.0)

    if kind == "snapshots":
        schema = T.StructType([
            T.StructField("committed_at", T.TimestampType()),
            T.StructField("snapshot_id", T.LongType()),
            T.StructField("sequence_number", T.LongType()),
            T.StructField("operation", T.StringType()),
            T.StructField("manifest_list", T.StringType()),
            T.StructField("summary", T.MapType(T.StringType(), T.StringType())),
            T.StructField("first_row_id", T.LongType()),
        ])
        rows = [
            (
                ts(s["timestamp-ms"]),
                int(s["snapshot-id"]),
                int(s["sequence-number"]),
                s.get("summary", {}).get("operation"),
                s["manifest-list"],
                {k: str(v) for k, v in s.get("summary", {}).items()},
                s.get("first-row-id"),
            )
            for s in meta.get("snapshots", [])
        ]
        return spark.createDataFrame(rows, schema)

    if kind == "history":
        current = meta.get("current-snapshot-id")
        # linear history (export appends snapshots in order): every
        # logged snapshot still in the snapshots list is an ancestor
        live = {s["snapshot-id"] for s in meta.get("snapshots", [])}
        schema = T.StructType([
            T.StructField("made_current_at", T.TimestampType()),
            T.StructField("snapshot_id", T.LongType()),
            T.StructField("is_current_ancestor", T.BooleanType()),
        ])
        rows = [
            (
                ts(e["timestamp-ms"]),
                int(e["snapshot-id"]),
                e["snapshot-id"] in live and e["snapshot-id"] <= current,
            )
            for e in meta.get("snapshot-log", [])
        ]
        return spark.createDataFrame(rows, schema)

    if kind == "refs":
        schema = T.StructType([
            T.StructField("name", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("snapshot_id", T.LongType()),
        ])
        rows = [
            (name, r.get("type", "branch"), int(r["snapshot-id"]))
            for name, r in sorted(meta.get("refs", {}).items())
        ]
        return spark.createDataFrame(rows, schema)

    if kind == "metadata_log_entries":
        schema = T.StructType([
            T.StructField("timestamp", T.TimestampType()),
            T.StructField("file", T.StringType()),
        ])
        rows = [
            (ts(e["timestamp-ms"]), e["metadata-file"])
            for e in meta.get("metadata-log", [])
        ]
        return spark.createDataFrame(rows, schema)

    # manifest-backed kinds resolve a snapshot
    snap_id = (
        snapshot_id
        if snapshot_id is not None
        else meta.get("current-snapshot-id")
    )
    snap = next(
        (s for s in meta.get("snapshots", []) if s["snapshot-id"] == snap_id),
        None,
    )
    if snap is None:
        raise ValueError(f"snapshot {snap_id} not in {location} metadata")
    _, manifests = read_container(snap["manifest-list"])

    if kind == "manifests":
        schema = T.StructType([
            T.StructField("content", T.IntegerType()),
            T.StructField("path", T.StringType()),
            T.StructField("length", T.LongType()),
            T.StructField("partition_spec_id", T.IntegerType()),
            T.StructField("added_snapshot_id", T.LongType()),
            T.StructField("added_files_count", T.IntegerType()),
            T.StructField("existing_files_count", T.IntegerType()),
            T.StructField("deleted_files_count", T.IntegerType()),
            T.StructField("added_rows_count", T.LongType()),
            T.StructField("existing_rows_count", T.LongType()),
            T.StructField("first_row_id", T.LongType()),
        ])
        rows = [
            (
                int(m["content"]),
                m["manifest_path"],
                int(m["manifest_length"]),
                int(m["partition_spec_id"]),
                int(m["added_snapshot_id"]),
                int(m["added_files_count"]),
                int(m["existing_files_count"]),
                int(m["deleted_files_count"]),
                int(m["added_rows_count"]),
                int(m["existing_rows_count"]),
                m.get("first_row_id"),
            )
            for m in manifests
        ]
        return spark.createDataFrame(rows, schema)

    # files / data_files / delete_files
    schema = T.StructType([
        T.StructField("content", T.IntegerType()),
        T.StructField("file_path", T.StringType()),
        T.StructField("file_format", T.StringType()),
        T.StructField("record_count", T.LongType()),
        T.StructField("file_size_in_bytes", T.LongType()),
        T.StructField("sequence_number", T.LongType()),
        T.StructField("snapshot_id", T.LongType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("equality_ids", T.ArrayType(T.IntegerType())),
        T.StructField("first_row_id", T.LongType()),
        T.StructField("referenced_data_file", T.StringType()),
        T.StructField("content_offset", T.LongType()),
        T.StructField("content_size_in_bytes", T.LongType()),
    ])
    rows = []
    for m in manifests:
        mf_first = m.get("first_row_id")
        assigned = 0
        _, entries = read_container(m["manifest_path"])
        for e in entries:
            if e["status"] == 2:
                continue
            df = e["data_file"]
            first = df.get("first_row_id")
            if (
                first is None
                and df["content"] == 0
                and mf_first is not None
            ):
                first = mf_first + assigned
                assigned += df["record_count"]
            rows.append(
                (
                    int(df["content"]),
                    df["file_path"],
                    df["file_format"],
                    int(df["record_count"]),
                    int(df["file_size_in_bytes"]),
                    int(e["sequence_number"]),
                    int(e["snapshot_id"]),
                    int(e["status"]),
                    df.get("equality_ids"),
                    first,
                    df.get("referenced_data_file"),
                    df.get("content_offset"),
                    df.get("content_size_in_bytes"),
                )
            )
    out = spark.createDataFrame(rows, schema)
    if kind == "data_files":
        out = out.filter("content = 0")
    elif kind == "delete_files":
        out = out.filter("content != 0")
    return out


def create_iceberg_views(
    spark: SparkSession,
    location: str,
    name: str,
    metadata: dict | None = None,
) -> list[str]:
    """SQL surface over the mirror: register ``name`` (the current
    snapshot's metadata-only read) plus the inspection views
    ``name_snapshots`` / ``name_history`` / ``name_refs`` /
    ``name_manifests`` / ``name_files`` as temp views, so
    ``spark.sql("SELECT ... FROM name")`` and the ``t$files``-style
    queries work without touching the lake's own manifests. Returns
    the registered view names. Views are snapshots of the metadata at
    registration — re-run after a sync to see new commits."""
    read_iceberg(spark, location, metadata=metadata).createOrReplaceTempView(
        name
    )
    out = [name]
    for kind in ("snapshots", "history", "refs", "manifests", "files"):
        vname = f"{name}_{kind}"
        iceberg_metadata_table(
            spark, location, kind, metadata=metadata
        ).createOrReplaceTempView(vname)
        out.append(vname)
    return out
