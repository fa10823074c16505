"""Manifest-committed, hash-bucketed ACID parquet table ("lake table").

This is the engine's exactly-once sink. No lakehouse jar (Iceberg/Delta)
ships in this sandbox, so we implement the minimal subset of that design
from scratch, mirroring the commit semantics the reference implements by
hand per writer plugin:

- DataX hdfswriter publishes atomically via tmp-dir + rename
  (hdfswriter/.../HdfsWriter.java:149-191); here: snapshot manifests
  published by atomic hard-link (exclusive create = compare-and-set).
- DataX odpswriter fences failed-over writers so a zombie task cannot
  commit (odpswriter/.../OdpsWriter.java:327-354); here: per-stream
  ``last_batch_id`` recorded in snapshot properties — replaying an
  already-applied batch is a no-op (exactly-once under retry).
- DataX otsstreamreader checkpoints per-shard positions
  (otsstreamreader/.../model/ShardCheckpoint.java:8-51); here: per-bucket
  ``max_seq`` lineage recorded in every snapshot.

Layout::

    table_dir/
      _manifests/v00000001.json     # one immutable snapshot per commit
      _manifests/refs/b-<sha>.json  # content-addressed per-bucket file
                                    # lists (manifest_mode='sharded')
      data/commit-<uuid>/_bucket=<b>/part-*.parquet

Data files are immutable and written ONCE under a per-commit staging dir;
a snapshot is just a JSON mapping ``bucket -> [data files]`` plus schema,
properties, and lineage. Commit = write-temp + ``os.link`` to the next
version number: the link fails if that version already exists, which gives
single-winner optimistic concurrency (same idea as an Iceberg catalog
swap). Readers list the manifest dir and read the highest version — always
a consistent snapshot.

Scale notes (100 TB / 1000 executors): rows are hash-bucketed by a key
column (``repo``) into ``num_buckets`` buckets; a MERGE rewrites only the
buckets its batch touches (copy-on-write), carrying every other bucket's
files forward by reference. Bucket count is chosen at table creation so
one bucket ~ one executor-sized unit of rewrite work; the per-commit
driver work is O(num_buckets), never O(rows).
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

MANIFEST_DIR = "_manifests"
REFS_DIR = os.path.join(MANIFEST_DIR, "refs")
DATA_DIR = "data"
BUCKET_COL = "_bucket"


class CommitConflict(Exception):
    """Another writer committed the version this commit was based on."""


class RestoreError(Exception):
    """restore() target is unusable: the manifest was vacuumed away or a
    data file it references no longer exists on disk."""


@dataclass
class Snapshot:
    version: int
    schema_json: dict[str, Any]
    buckets: dict[str, list[str]]  # bucket id (str) -> BASE data file relpaths
    properties: dict[str, Any] = field(default_factory=dict)
    lineage: dict[str, Any] = field(default_factory=dict)  # bucket -> stats
    # bucket id -> DELTA file relpaths (merge-on-read appends). Base files
    # are key-unique per bucket by construction (bulk load / compaction /
    # insert-only appends); delta files overlap base keys and each other
    # and are resolved at read (lake/mor.py). Always {} for COW tables.
    deltas: dict[str, list[str]] = field(default_factory=dict)
    # bucket id -> {file relpath -> {col: [min, max]}} parquet footer
    # bounds for the table's ``stats_cols`` property (lake/stats.py) —
    # the manifest-level file-skipping index used by ``scan``. Populated
    # only for BASE files (deltas are never pruned: a skipped delta
    # could resurrect a superseded base row). {} when stats are off.
    file_stats: dict[str, dict[str, dict[str, list]]] = field(
        default_factory=dict
    )
    # bucket id -> EQUALITY-DELETE file relpaths (Iceberg v2 format
    # analog, lake/mor.py): narrow files holding only (key_cols, _seq);
    # a row anywhere in the bucket with matching key and _seq <= the
    # delete's is dead at read time. Always {} for COW tables and for
    # MOR tables using inline tombstone rows.
    eq_deletes: dict[str, list[str]] = field(default_factory=dict)

    @property
    def schema(self) -> StructType:
        return StructType.fromJson(self.schema_json)

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "schema": self.schema_json,
                "buckets": self.buckets,
                "properties": self.properties,
                "lineage": self.lineage,
                "deltas": self.deltas,
                "file_stats": self.file_stats,
                "eq_deletes": self.eq_deletes,
            },
            sort_keys=True,
        )

    @staticmethod
    def from_json(text: str) -> "Snapshot":
        d = json.loads(text)
        return Snapshot(
            version=d["version"],
            schema_json=d["schema"],
            buckets=d["buckets"],
            properties=d.get("properties", {}),
            lineage=d.get("lineage", {}),
            deltas=d.get("deltas", {}),
            file_stats=d.get("file_stats", {}),
            eq_deletes=d.get("eq_deletes", {}),
        )

    # Sharded-manifest bookkeeping (set by LakeTable load/commit paths):
    # {"buckets": {bucket: ref_relpath}, "deltas": {...}} for buckets whose
    # file list is stored in a content-addressed side file instead of
    # inline. Excluded from equality/repr: two identical snapshots loaded
    # via different paths (inline vs sharded refs) must compare equal.
    _refs: dict[str, dict[str, str]] | None = field(
        default=None, compare=False, repr=False
    )
    # Publish wall-clock, recorded INSIDE the manifest at commit time so
    # TIMESTAMP-AS-OF time travel survives copy/restore/rsync of the
    # table directory (file mtimes don't — ADVICE r3). None only for
    # manifests written before round 4 (mtime fallback). Excluded from
    # equality: two runs producing identical state must compare equal.
    committed_at: float | None = field(default=None, compare=False, repr=False)
    # True when the commit that PRODUCED this snapshot only rewrote
    # files without changing any row (compaction / clustered rewrite) —
    # Delta's dataChange=false. read_changes skips these commit pairs
    # outright: diffing a compaction costs a full changed-bucket
    # exceptAll that provably nets zero changes (round 5: the 50M
    # sustained DV-mirror protocol spent most of each sync there).
    # Per-commit metadata like committed_at: excluded from equality and
    # from to_json (identical states stay fingerprint-equal).
    rewrite_only: bool = field(default=False, compare=False, repr=False)


def _conform_payload(df: DataFrame, payload: list[str], schema: StructType) -> DataFrame:
    """Project to exactly ``payload`` in order, casting to ``schema``'s
    types and nulling columns the frame lacks (pre-evolution snapshots)."""
    fields = {f.name: f for f in schema.fields}
    have = set(df.columns)
    cols = []
    for name in payload:
        dt = fields[name].dataType
        col = F.col(name).cast(dt) if name in have else F.lit(None).cast(dt)
        cols.append(col.alias(name))
    return df.select(*cols)


class SchemaEvolutionError(ValueError):
    """Schema change is unsafe: non-widening type drift, a retired name
    re-added, or DDL against a key/constraint column."""


class _AddColumnsNoOp(Exception):
    """Internal control flow for add_columns: every requested field is
    already present on the base snapshot — publish nothing."""

    def __init__(self, snapshot: "Snapshot"):
        self.snapshot = snapshot


# Safe numeric promotions (Iceberg type-evolution rules): widening only,
# so old files read up-cast and nothing rewrites. Shared by the commit
# paths here and the apply-side check in operators/merge._evolve_schema.
WIDENS_TO = {
    "byte": ("short", "integer", "long"),
    "short": ("integer", "long"),
    "integer": ("long",),
    "float": ("double",),
}


def _union_schema(a: StructType, b: StructType) -> StructType:
    """Additive union: ``a``'s fields (taking ``b``'s type where it is a
    numeric WIDENING of ``a``'s — wider-of-the-two is order-independent,
    so concurrent rebases converge), then ``b``'s new fields in order.
    Non-widening collisions keep ``a``'s type; the apply path raised on
    those before any commit reached here."""
    b_by_name = {f.name: f for f in b.fields}
    names = {f.name for f in a.fields}
    fields = []
    for f in a.fields:
        other = b_by_name.get(f.name)
        if (
            other is not None
            and other.dataType != f.dataType
            and other.dataType.typeName() in WIDENS_TO.get(f.dataType.typeName(), ())
        ):
            fields.append(StructField(f.name, other.dataType, True))
        else:
            fields.append(f)
    return StructType(fields + [f for f in b.fields if f.name not in names])


_INTEGRAL_TYPES = ("byte", "short", "integer", "long")
_FRACTIONAL_TYPES = ("float", "double")


def bucket_expr(bucket_key: str, num_buckets: int, dtype=None):
    """Deterministic bucket id for a row: pmod(xxhash64(key), B).

    xxhash64 runs JVM-side in whole-stage codegen — the analog of DataX's
    pk-range split (plugin-rdbms-util/.../SingleTableSplitUtil.java:33-124)
    but hash- rather than range-based, so hot key ranges can't land in one
    slice.

    ``dtype`` (the key column's type, from whichever schema the caller
    holds — table or batch, same numeric family either way): hash-v2
    canonicalization. Integral keys hash as LONG and fractional as
    DOUBLE, so numeric widening of the bucket key (int->long,
    float->double — Iceberg type evolution) NEVER re-buckets existing
    rows (Iceberg's bucket transform hashes the widest representation
    for the same reason). xxhash64(int 42) != xxhash64(long 42), so v1
    layouts (``dtype=None``, tables created before ``bucket_hash_version``
    existed) must instead REFUSE bucket-key widening — enforced in
    operators.merge._evolve_schema.
    """
    col = F.col(bucket_key)
    if dtype is not None:
        t = dtype.typeName()
        if t in _INTEGRAL_TYPES:
            col = col.cast("long")
        elif t in _FRACTIONAL_TYPES:
            col = col.cast("double")
    return F.pmod(F.xxhash64(col), F.lit(num_buckets)).cast("int")


def bucket_hash_dtype(schema: StructType, bucket_key: str, hash_version) -> "Any":
    """The canonicalization dtype ``bucket_expr`` needs for this layout:
    the bucket key's type on hash-v2 tables, None on v1 (raw-column
    hashing, pre-round-4)."""
    if int(hash_version or 1) < 2:
        return None
    for f in schema.fields:
        if f.name == bucket_key:
            return f.dataType
    return None


def snap_bucket_dtype(snap: "Snapshot"):
    """``bucket_hash_dtype`` straight off a snapshot."""
    p = snap.properties
    return bucket_hash_dtype(
        snap.schema, p["bucket_key"], p.get("bucket_hash_version", 1)
    )


class LakeTable:
    """A bucketed, snapshot-versioned parquet table with CAS commits."""

    def __init__(self, spark: SparkSession, path: str, branch: str | None = None):
        self.spark = spark
        self.path = os.path.abspath(path)
        # Writable BRANCH (Iceberg branch / WAP analog): commits on a
        # branch table publish manifests under _manifests/branches/<name>/
        # in their own CAS version sequence forked from main; data files
        # and content-addressed refs are shared. None = main.
        self.branch = branch

    @property
    def _mdir(self) -> str:
        if self.branch is None:
            return os.path.join(self.path, MANIFEST_DIR)
        return os.path.join(self.path, MANIFEST_DIR, "branches", self.branch)

    # ---------------------------------------------------------------- create
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: StructType,
        key_cols: list[str],
        bucket_key: str,
        num_buckets: int = 16,
        extra_properties: dict[str, Any] | None = None,
        manifest_mode: str = "sharded",
        stats_cols: list[str] | None = None,
        bloom_cols: list[str] | None = None,
        bloom_ndv: dict[str, int] | None = None,
        constraints: dict[str, str] | None = None,
    ) -> "LakeTable":
        """Create the table.

        ``stats_cols``: columns whose per-file [min, max] footer bounds
        are recorded in the manifest at every write (lake/stats.py) so
        ``scan(filters=...)`` can skip files driver-side. Opt-in: the
        footer harvest is metadata-only but still nonzero work, and
        hash-bucketed columns gain nothing from it.

        ``bloom_cols``: columns that get a parquet BLOOM FILTER in every
        data file written from now on. Complements min/max skipping: a
        point lookup on a high-cardinality, non-clustered column (e.g.
        ``path`` inside a repo bucket) gets ROW-GROUP skipping from the
        reader's pushed equality predicate even where range bounds are
        useless (hash-spread values span every file's [min, max]). Pure
        write-side opt-in; Spark's vectorized reader consumes the bloom
        automatically on pushed ``=`` filters, and ``plan_scan`` probes
        the same bloom DRIVER-SIDE to skip whole files before the read
        is even planned (lake/parquet_bloom.py). ``bloom_ndv`` sizes the
        bitset per column (expected distinct values PER FILE — without
        it parquet-mr reserves its 1 MiB default per file per column;
        ~10k NDV ≈ 16 KiB at the default 1% FPP).

        ``manifest_mode='sharded'`` (default) stores each bucket's file
        list in a content-addressed side file under ``_manifests/refs/``;
        the per-version snapshot then holds O(num_buckets) pointers, so
        commit serialization cost is O(buckets + changed files) instead
        of O(all files) — at 100-TB file counts the single inline JSON
        manifest is otherwise the driver-side bottleneck (an Iceberg
        manifest-list analog). ``'inline'`` keeps round-1 behavior
        (everything in one JSON); old tables without the property read as
        inline.
        """
        if manifest_mode not in ("inline", "sharded"):
            raise ValueError(f"unknown manifest_mode {manifest_mode!r}")
        path = os.path.abspath(path)
        os.makedirs(os.path.join(path, MANIFEST_DIR), exist_ok=False)
        os.makedirs(os.path.join(path, REFS_DIR), exist_ok=True)
        os.makedirs(os.path.join(path, DATA_DIR), exist_ok=True)
        snap = Snapshot(
            version=1,
            schema_json=schema.jsonValue(),
            buckets={},
            properties={
                "key_cols": key_cols,
                "bucket_key": bucket_key,
                "num_buckets": num_buckets,
                "streams": {},
                "manifest_mode": manifest_mode,
                # v2: bucket_expr canonicalizes numeric keys (integral as
                # long, fractional as double) so schema widening never
                # re-buckets. Absent on pre-round-4 tables => v1 (raw
                # hashing; bucket-key widening refused at apply time).
                "bucket_hash_version": 2,
                "stats_cols": list(stats_cols or []),
                "bloom_cols": list(bloom_cols or []),
                "bloom_ndv": dict(bloom_ndv or {}),
                # Named CHECK constraints (Delta table-constraint analog):
                # the apply path quarantines non-delete rows whose
                # expression is literally FALSE as `constraint:<name>`
                # (quality/quarantine.dirty_reason), counted in the same
                # one-pass stats job as the built-in dirty rules.
                "constraints": dict(constraints or {}),
                **(extra_properties or {}),
            },
        )
        table = cls(spark, path)
        table._write_manifest(snap)
        return table

    @classmethod
    def exists(cls, path: str) -> bool:
        return os.path.isdir(os.path.join(os.path.abspath(path), MANIFEST_DIR))

    # ------------------------------------------------------------- snapshots
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._mdir, f"v{version:08d}.json")

    def current_version(self) -> int:
        names = [
            n
            for n in os.listdir(self._mdir)
            if n.startswith("v") and n.endswith(".json")
        ]
        if not names:
            raise FileNotFoundError(f"no snapshots in {self.path}")
        return max(int(n[1:-5]) for n in names)

    def history(self) -> list[dict[str, Any]]:
        """Commit history from the retained manifests: version, publish
        time (manifest mtime), and what changed vs the predecessor —
        driver-side metadata only (Iceberg ``.history`` analog)."""
        versions = sorted(
            int(n[1:-5]) for n in os.listdir(self._mdir)
            if n.startswith("v") and n.endswith(".json")
        )
        out: list[dict[str, Any]] = []
        prev: Snapshot | None = None
        for v in versions:
            snap = self.snapshot(v)
            entry: dict[str, Any] = {
                "version": v,
                # manifest-recorded publish time; mtime only for
                # pre-round-4 manifests (rsync/restore shifts mtimes)
                "committed_at": snap.committed_at
                if snap.committed_at is not None
                else (
                    os.path.getmtime(self._manifest_path(v))
                    if os.path.exists(self._manifest_path(v))
                    else None
                ),
            }
            if prev is not None:
                entry["changed_buckets"] = sorted(
                    int(b)
                    for b in set(snap.buckets) | set(prev.buckets)
                    | set(snap.deltas) | set(prev.deltas)
                    | set(snap.eq_deletes) | set(prev.eq_deletes)
                    if snap.buckets.get(b, []) != prev.buckets.get(b, [])
                    or snap.deltas.get(b, []) != prev.deltas.get(b, [])
                    or snap.eq_deletes.get(b, []) != prev.eq_deletes.get(b, [])
                )
                entry["streams"] = {
                    sid: upd
                    for sid, upd in snap.properties.get("streams", {}).items()
                    if prev.properties.get("streams", {}).get(sid) != upd
                }
            out.append(entry)
            prev = snap
        return out

    def version_as_of(self, ts: float) -> int:
        """Newest version published at or before unix time ``ts``
        (Iceberg ``TIMESTAMP AS OF`` analog). Publish time is the
        ``committed_at`` recorded INSIDE each manifest at commit — file
        mtimes shift under copy/restore/rsync and would silently resolve
        to the wrong version (ADVICE r3); mtime is only the fallback for
        pre-round-4 manifests that lack the field. Raises if every
        retained snapshot is newer (history vacuumed past the asked-for
        time)."""
        best = None
        # regex scan instead of json.load: inline-mode manifests embed
        # full file lists, and a timestamp lookup over a long history
        # shouldn't pay O(history x manifest-parse) just to read one
        # float (sharded mode, the default, keeps these files small
        # either way)
        pat = re.compile(rb'"committed_at":\s*([0-9][0-9.eE+-]*)')
        for n in os.listdir(self._mdir):
            if not (n.startswith("v") and n.endswith(".json")):
                continue
            v = int(n[1:-5])
            mpath = os.path.join(self._mdir, n)
            committed = None
            try:
                with open(mpath, "rb") as f:
                    m = pat.search(f.read())
                if m:
                    committed = float(m.group(1))
            except (OSError, ValueError):
                committed = None
            if committed is None:
                committed = os.path.getmtime(mpath)
            if committed <= ts and (best is None or v > best):
                best = v
        if best is None:
            raise FileNotFoundError(
                f"no snapshot at or before ts={ts} in {self.path} "
                "(vacuumed or table newer than ts)"
            )
        return best

    def version_at_batch(self, stream_id: str, batch_id: int) -> int:
        """Newest version whose ``stream_id`` fence is at or before
        ``batch_id`` — time travel by REPLAY POSITION ("read the table
        as of binlog batch B") instead of wall clock. The fence
        (streams.<sid>.last_batch_id) is monotone across versions and
        carried forward by every commit, so the newest qualifying
        version includes every applied batch <= B of this stream PLUS
        any state-preserving maintenance (compaction/clustering) that
        landed before batch B+1 — but, like any single-stream cut, it is
        only a consistent log position for tables fed solely by that
        stream (out-of-band DML between applies is included up to the
        first post-cut apply).

        Versions predating the stream's first apply have no fence and
        qualify (an empty prefix of the log). Raises when even the
        OLDEST retained version is past ``batch_id`` (history vacuumed).

        Same regex scan as version_as_of: one small read per manifest,
        no O(history x manifest-parse) JSON loads in inline mode.
        """
        pat = re.compile(
            re.escape(json.dumps(stream_id)).encode()
            + rb':\s*\{[^{}]*"last_batch_id":\s*(-?\d+)'
        )
        best = None
        oldest = None
        for n in os.listdir(self._mdir):
            if not (n.startswith("v") and n.endswith(".json")):
                continue
            v = int(n[1:-5])
            if oldest is None or v < oldest:
                oldest = v
            try:
                with open(os.path.join(self._mdir, n), "rb") as f:
                    m = pat.search(f.read())
            except OSError:
                continue
            fence = int(m.group(1)) if m else None
            if (fence is None or fence <= batch_id) and (
                best is None or v > best
            ):
                best = v
        if best is None:
            raise FileNotFoundError(
                f"no retained snapshot at or before batch {batch_id} of "
                f"stream {stream_id!r} in {self.path} (history vacuumed)"
            )
        return best

    def restore(self, version: int) -> Snapshot:
        """RESTORE to ``version`` (Delta ``RESTORE TABLE ... VERSION AS OF``
        / Iceberg rollback analog): publish a NEW version whose complete
        state — base/delta/equality-delete file lists, file stats,
        lineage, schema, and properties INCLUDING stream fences — equals
        the target snapshot's. Metadata-only: nothing rewrites, nothing
        copies; the rolled-back versions stay in history (time travel
        still reaches them until vacuum expires them), so a bad restore
        is itself restorable.

        Rewinding the stream fences is the point of taking the WHOLE
        property map: after ``restore(v)``, a changelog replay from the
        restored position re-applies instead of being fenced out as a
        duplicate, so restore + replay reconstructs any past-and-forward
        state (the oracle-checked ``cdc_restore_replay`` contract).
        Structural properties (num_buckets, bucket_hash_version,
        retired_cols, mor_patch) revert with it — each is only
        consistent with the file layout it was committed with, e.g.
        restoring across a ``rebucket`` must restore the old bucket
        count or every hash probe would look in the wrong bucket.

        Guards, all BEFORE any commit:
        - the target manifest must still be retained (vacuum keep_last
          drops old ones) -> RestoreError;
        - every data file the target references must still exist
          (vacuum reclaims files only recent versions stop referencing;
          tagged versions are pinned and always restorable)
          -> RestoreError naming the missing files;
        - a concurrent commit between inspect and publish fails the
          manifest CAS -> CommitConflict. Restore never rebases by
          design: it is a statement about the state the caller saw, so
          the caller must re-inspect and re-issue deliberately.

        Restoring to the current state is a no-op (returns the current
        snapshot, publishes nothing — replayed restore scripts must not
        mint empty versions).

        Reference analog: DataX has no table versioning; this is the
        lake-side failover complement to the job-level restart semantics
        (core/.../job/JobContainer.java failover + the odpswriter
        truncate-and-reload recovery pattern, OdpsWriter.java:327-354),
        done in O(num_buckets) metadata instead of a reload.
        """
        cur = self.snapshot()
        try:
            target = self.snapshot(version)
        except FileNotFoundError as e:
            raise RestoreError(
                f"version {version} is not retained at {self.path} "
                "(expired by vacuum, or never committed)"
            ) from e

        def _state(s: Snapshot):
            return (
                s.schema_json, s.buckets, s.properties, s.lineage,
                s.deltas, s.file_stats, s.eq_deletes,
            )

        if _state(target) == _state(cur):
            return cur
        missing = [
            rel
            for rel in sorted(self._referenced_rels([target]))
            if not os.path.exists(os.path.join(self.path, rel))
        ]
        if missing:
            raise RestoreError(
                f"cannot restore {self.path} to version {version}: "
                f"{len(missing)} referenced data file(s) no longer exist "
                f"(vacuumed) — first few: {missing[:5]}"
            )
        new = Snapshot(
            version=cur.version + 1,
            schema_json=target.schema_json,
            # deep-copy: the caller may hold/mutate the target snapshot
            properties=json.loads(json.dumps(target.properties)),
            # list objects shared with ``target`` ON PURPOSE: sharded
            # manifest mode reuses a ref when the bucket's list IS the
            # base's (identity check in _shard_lists), so passing
            # ``target`` as the base publishes with zero re-hashing
            buckets=target.buckets,
            lineage=target.lineage,
            deltas=target.deltas,
            file_stats=target.file_stats,
            eq_deletes=target.eq_deletes,
        )
        self._write_manifest(new, target)  # CAS: conflict -> CommitConflict
        return new

    def snapshot(self, version: int | None = None) -> Snapshot:
        v = version if version is not None else self.current_version()
        mpath = self._manifest_path(v)
        if self.branch is not None and not os.path.exists(mpath):
            # pre-fork history is shared with main
            mpath = os.path.join(self.path, MANIFEST_DIR, f"v{v:08d}.json")
        with open(mpath) as f:
            d = json.loads(f.read())
        refs: dict[str, dict[str, str]] = {
            "buckets": {}, "deltas": {}, "file_stats": {}, "eq_deletes": {}
        }
        for kind in ("buckets", "deltas", "file_stats", "eq_deletes"):
            resolved: dict[str, Any] = {}
            for b, v_ in d.get(kind, {}).items():
                if isinstance(v_, dict) and "@ref" in v_:
                    refs[kind][b] = v_["@ref"]
                    with open(os.path.join(self.path, v_["@ref"])) as rf:
                        resolved[b] = json.load(rf)
                else:
                    resolved[b] = v_
            d[kind] = resolved
        snap = Snapshot(
            version=d["version"],
            schema_json=d["schema"],
            buckets=d["buckets"],
            properties=d.get("properties", {}),
            lineage=d.get("lineage", {}),
            deltas=d.get("deltas", {}),
            file_stats=d.get("file_stats", {}),
            eq_deletes=d.get("eq_deletes", {}),
        )
        snap._refs = refs
        snap.committed_at = d.get("committed_at")
        snap.rewrite_only = bool(d.get("rewrite_only", False))
        return snap

    def _shard_lists(
        self, kind: str, table: dict[str, Any], base: Snapshot | None
    ) -> tuple[dict[str, Any], dict[str, str]]:
        """Per-bucket values -> {bucket: {"@ref": path}} side-file pointers
        (file lists for buckets/deltas, per-file stats maps for file_stats).

        An UNTOUCHED bucket (same list OBJECT as the base snapshot's —
        commit paths build new dicts via ``dict(base.buckets)``, which
        preserves identity for carried-forward entries) reuses the base's
        ref with zero hashing; changed lists are content-addressed
        (sha256 of the JSON), so identical content across versions/
        buckets shares one side file and re-publishing is idempotent.
        """
        base_refs = (getattr(base, "_refs", None) or {}).get(kind, {}) if base else {}
        base_lists = getattr(base, kind, {}) if base else {}
        out: dict[str, Any] = {}
        refs: dict[str, str] = {}
        os.makedirs(os.path.join(self.path, REFS_DIR), exist_ok=True)
        for b, files in table.items():
            ref = base_refs.get(b)
            if ref is None or base_lists.get(b) is not files:
                blob = json.dumps(files, sort_keys=True).encode()
                h = hashlib.sha256(blob).hexdigest()[:24]
                ref = os.path.join(REFS_DIR, f"{kind[0]}-{h}.json")
                final = os.path.join(self.path, ref)
                if not os.path.exists(final):
                    tmp = final + f".tmp.{uuid.uuid4().hex}"
                    with open(tmp, "wb") as f:
                        f.write(blob)
                    os.replace(tmp, final)
            out[b] = {"@ref": ref}
            refs[b] = ref
        return out, refs

    def _write_manifest(self, snap: Snapshot, base: Snapshot | None = None) -> None:
        """Atomically publish ``snap`` as the next version via link-CAS.

        In sharded manifest mode the bucket/delta file lists are spilled
        to content-addressed side files first (reusing the base's refs
        for untouched buckets), keeping the versioned snapshot JSON at
        O(num_buckets) regardless of total file count.
        """
        ghosts = {f.name for f in snap.schema.fields} & set(
            snap.properties.get("retired_cols", [])
        )
        if ghosts:
            raise SchemaEvolutionError(
                f"schema re-introduces retired column name(s) {sorted(ghosts)}"
                " — old data files still hold values under them; pick fresh"
                " names (rename_column/drop_column burn the physical name)"
            )
        doc: dict[str, Any] = {
            "version": snap.version,
            "schema": snap.schema_json,
            "buckets": snap.buckets,
            "properties": snap.properties,
            "lineage": snap.lineage,
            "deltas": snap.deltas,
            "file_stats": snap.file_stats,
            "eq_deletes": snap.eq_deletes,
            "committed_at": time.time(),
        }
        if snap.rewrite_only:
            doc["rewrite_only"] = True
        if snap.properties.get("manifest_mode") == "sharded":
            b_out, b_refs = self._shard_lists("buckets", snap.buckets, base)
            d_out, d_refs = self._shard_lists("deltas", snap.deltas, base)
            s_out, s_refs = self._shard_lists(
                "file_stats", snap.file_stats, base
            )
            e_out, e_refs = self._shard_lists(
                "eq_deletes", snap.eq_deletes, base
            )
            doc["buckets"] = b_out
            doc["deltas"] = d_out
            doc["file_stats"] = s_out
            doc["eq_deletes"] = e_out
            snap._refs = {
                "buckets": b_refs, "deltas": d_refs, "file_stats": s_refs,
                "eq_deletes": e_refs,
            }
        final = self._manifest_path(snap.version)
        tmp = final + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(json.dumps(doc, sort_keys=True))
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, final)  # fails with EEXIST if version taken: CAS
        except FileExistsError as e:
            raise CommitConflict(
                f"version {snap.version} already committed at {self.path}"
            ) from e
        finally:
            os.unlink(tmp)

    # ---------------------------------------------------------------- reads
    def _abs_files(
        self,
        snap: Snapshot,
        buckets: list[int] | None = None,
        source: str = "base",
    ) -> list[str]:
        """Absolute data file paths for ``source`` in ('base', 'delta', 'eq')."""
        table = {
            "base": snap.buckets, "delta": snap.deltas, "eq": snap.eq_deletes
        }[source]
        sel = (
            table.items()
            if buckets is None
            else ((str(b), table.get(str(b), [])) for b in buckets)
        )
        return [os.path.join(self.path, rel) for _, files in sel for rel in files]

    def _read_files(
        self,
        files: list[str],
        schema: StructType,
        renames: dict[str, list[str]] | None = None,
    ) -> DataFrame:
        """One multi-file parquet scan with ``schema``'s names resolved.

        ``renames`` (snapshot property, ``rename_column``) maps a current
        column name to its RETIRED physical predecessors, oldest first.
        Files written before a rename store the value under the old
        physical name; parquet read-with-schema is name-based, so the
        scan requests BOTH names (typed as the current — possibly
        widened — type) and forwards with ``coalesce(current, newest
        retired, ..., oldest)``. Exactly one of the names exists
        physically in any given file (retired names can never be
        re-added — enforced at commit), so the coalesce is a pure
        rename, never a value merge. This is the name-based stand-in
        for Iceberg's field-id resolution: metadata-only rename with
        zero rewrite, at the documented cost that a retired physical
        name is burned forever on this table.
        """
        if not files:
            return self.spark.createDataFrame([], schema)
        live = {f.name for f in schema.fields}
        renames = {
            k: v for k, v in (renames or {}).items() if v and k in live
        }
        if not renames:
            return self.spark.read.schema(schema).parquet(*files)
        phys_fields: list[StructField] = []
        for f in schema.fields:
            phys_fields.append(f)
            for old in renames.get(f.name, []):
                phys_fields.append(StructField(old, f.dataType, True))
        df = self.spark.read.schema(StructType(phys_fields)).parquet(*files)
        cols = []
        for f in schema.fields:
            chain = renames.get(f.name)
            if chain:
                cols.append(
                    F.coalesce(
                        F.col(f.name), *[F.col(o) for o in reversed(chain)]
                    ).alias(f.name)
                )
            else:
                cols.append(F.col(f.name))
        return df.select(*cols)

    def read(
        self,
        buckets: list[int] | None = None,
        version: int | None = None,
        tag: str | None = None,
    ) -> DataFrame:
        """Read a consistent snapshot (optionally only some buckets).

        The manifest schema is passed explicitly so files written before an
        additive schema evolution read with nulls in the new columns — the
        DataX column-mapping analog (SURVEY.md §1.2) without a rewrite.
        Reads base files only; MOR delta resolution lives in MorTable.read.
        ``tag`` resolves a named snapshot ref (create_tag) — time travel
        by name, stable across later commits/compactions.
        """
        if tag is not None:
            if version is not None:
                raise ValueError("pass version OR tag, not both")
            version = self.resolve_tag(tag)
        snap = self.snapshot(version)
        return self._read_files(
            self._abs_files(snap, buckets), snap.schema,
            snap.properties.get("renames"),
        )

    # ---------------------------------------------------------- pruned scans
    def _bucket_id_of(self, snap: Snapshot, value: Any) -> int:
        """Bucket id a bucket_key value hashes to.

        One 1-row local job through the SAME JVM xxhash64 the write path
        uses (bucket_expr), cast to the column's stored type first — the
        driver never reimplements the hash, so write and prune can't
        drift.
        """
        props = snap.properties
        key = props["bucket_key"]
        dt = {f.name: f.dataType for f in snap.schema.fields}[key]
        row = self.spark.range(1).select(F.lit(value).cast(dt).alias(key))
        return int(
            row.select(
                bucket_expr(
                    key, props["num_buckets"], snap_bucket_dtype(snap)
                ).alias("b")
            ).first()["b"]
        )

    def _bucket_ids_of(self, snap: Snapshot, values: list[Any]) -> set[int]:
        """Bucket ids for a batch of bucket_key values — ONE local job
        over all values (the IN-list twin of _bucket_id_of), same JVM
        hash as the write path so write and prune can't drift."""
        if not values:
            return set()
        props = snap.properties
        key = props["bucket_key"]
        dt = {f.name: f.dataType for f in snap.schema.fields}[key]
        arr = F.array(*[F.lit(v).cast(dt) for v in values])
        rows = self.spark.range(1).select(F.explode(arr).alias(key)).select(
            bucket_expr(
                key, props["num_buckets"], snap_bucket_dtype(snap)
            ).alias("b")
        )
        return {int(r["b"]) for r in rows.collect()}

    def plan_scan(
        self,
        filters: list[tuple[str, str, Any]],
        buckets: list[int] | None = None,
        version: int | None = None,
        tag: str | None = None,
        prune_files: bool = True,
    ) -> dict[str, Any]:
        """Driver-side pruning plan for ``scan`` — which buckets and base
        files a filtered read must touch.

        Two passes, both pure manifest metadata (no Spark job except the
        1-row bucket hash):

        - **bucket pruning**: an ``=`` filter on the table's bucket key
          pins its hash bucket — 1/num_buckets of the table;
        - **file skipping**: per-file [min, max] footer bounds recorded
          at write time for ``stats_cols`` (lake/stats.py) drop base
          files whose range can't contain a matching row. CDC/append
          commits cluster naturally on seq/event-time, so range scans
          touch only the commits in range.

        Round 4 adds a third pass: **bloom probing**. For ``=`` filters
        on the table's ``bloom_cols``, each surviving file's own parquet
        bloom filter (written by Spark at every commit) is probed
        driver-side (lake/parquet_bloom.py), dropping files that PROVABLY
        lack the value — the point-lookup case min/max can't help with
        (hash-spread values span every file's range). Footer+bitset
        reads are lazy (only files that survived the first two passes)
        and fan out to executors above ``FILE_STATS_PARALLEL_THRESHOLD``
        candidates, so a wide lookup never serializes I/O on the driver.

        Returns ``{"version", "buckets", "files", "files_total",
        "files_kept", "files_bloom_pruned"}``; ``files`` are absolute
        base-file paths.
        """
        from datax_spark.lake.stats import file_survives, validate_filters

        validate_filters(filters)
        if tag is not None:
            if version is not None:
                raise ValueError("pass version OR tag, not both")
            version = self.resolve_tag(tag)
        snap = self.snapshot(version)
        props = snap.properties
        sel = (
            sorted(set(snap.buckets) | set(snap.deltas), key=int)
            if buckets is None
            else [str(b) for b in buckets]
        )
        for col, op, val in filters:
            if col != props.get("bucket_key"):
                continue
            if op == "=" and val is not None:
                hits = {str(self._bucket_id_of(snap, val))}
            elif op == "in":
                vals = [v for v in val if v is not None]
                hits = {str(b) for b in self._bucket_ids_of(snap, vals)}
            else:
                continue
            sel = [b for b in sel if b in hits]
        files: list[str] = []
        total = 0
        for b in sel:
            stats_b = snap.file_stats.get(b, {})
            for rel in snap.buckets.get(b, []):
                total += 1
                if prune_files and not file_survives(stats_b.get(rel), filters):
                    continue
                files.append(os.path.join(self.path, rel))
        bloom_pruned = 0
        probes: dict[str, list[Any]] = {}
        for col, op, val in filters:
            if col not in (props.get("bloom_cols") or []):
                continue
            if op == "=" and val is not None:
                probes[col] = [val]
            elif op == "in":
                vals = [v for v in val if v is not None]
                if vals:
                    probes[col] = vals
        if prune_files and probes and files:
            from datax_spark.lake.parquet_bloom import file_might_contain
            from datax_spark.lake.stats import FILE_STATS_PARALLEL_THRESHOLD

            if len(files) <= FILE_STATS_PARALLEL_THRESHOLD:
                verdicts = [(p, file_might_contain(p, probes)) for p in files]
            else:
                sc = self.spark.sparkContext
                n_slices = max(1, min(len(files) // 8, sc.defaultParallelism))
                verdicts = (
                    sc.parallelize(files, n_slices)
                    .map(lambda p: (p, file_might_contain(p, probes)))
                    .collect()
                )
            keep = dict(verdicts)
            bloom_pruned = sum(1 for v in keep.values() if not v)
            files = [p for p in files if keep.get(p, True)]
        return {
            "version": snap.version,
            "buckets": [int(b) for b in sel],
            "files": files,
            "files_total": total,
            "files_kept": len(files),
            "files_bloom_pruned": bloom_pruned,
        }

    def scan(
        self,
        filters: list[tuple[str, str, Any]],
        buckets: list[int] | None = None,
        version: int | None = None,
        tag: str | None = None,
    ) -> DataFrame:
        """Filtered read with manifest-level pruning.

        ``filters`` is a conjunction of ``(column, op, literal)`` with op
        in ``= < <= > >=``. Bucket pruning + per-file min/max skipping
        happen driver-side (plan_scan) BEFORE Spark plans the read, so at
        100-TB file counts the cluster opens O(surviving files), not
        every footer; the FULL predicate is then re-applied to the
        surviving rows, so pruning is an optimization, never a semantics
        change. The reference's analog is WHERE pushdown into the
        generated scan SQL (plugin-rdbms-util/.../SingleTableSplitUtil
        .java:126-139) — here the "index" is the manifest itself.
        """
        from datax_spark.lake.stats import filters_to_expr

        plan = self.plan_scan(filters, buckets, version, tag)
        snap = self.snapshot(plan["version"])
        df = self._read_files(
            plan["files"], snap.schema, snap.properties.get("renames")
        )
        expr = filters_to_expr(filters)
        return df.filter(expr) if expr is not None else df

    # ------------------------------------------------------------------ tags
    def _tag_path(self, name: str) -> str:
        if not name or not all(c.isalnum() or c in "._-" for c in name):
            raise ValueError(f"invalid tag name {name!r}")
        return os.path.join(self.path, MANIFEST_DIR, "tags", f"{name}.json")

    def create_tag(self, name: str, version: int | None = None,
                   replace: bool = False) -> int:
        """Pin a named ref to a snapshot version (Iceberg tag analog).

        Tags are one-file-per-name under ``_manifests/tags/``; creation
        is exclusive (two writers racing the same new tag: one wins)
        unless ``replace=True`` atomically moves an existing tag. A
        tagged version survives ``vacuum`` — its manifest and every file
        it references are retained until the tag is deleted.
        """
        v = version if version is not None else self.current_version()
        self.snapshot(v)  # must exist
        path = self._tag_path(name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        doc = json.dumps({"version": v}, sort_keys=True)
        if replace:
            tmp = path + f".tmp.{uuid.uuid4().hex}"
            with open(tmp, "w") as f:
                f.write(doc)
            os.replace(tmp, path)
        else:
            with open(path, "x") as f:
                f.write(doc)
        return v

    def resolve_tag(self, name: str) -> int:
        with open(self._tag_path(name)) as f:
            return int(json.load(f)["version"])

    def tags(self) -> dict[str, int]:
        d = os.path.join(self.path, MANIFEST_DIR, "tags")
        if not os.path.isdir(d):
            return {}
        out = {}
        for n in sorted(os.listdir(d)):
            if n.endswith(".json"):
                with open(os.path.join(d, n)) as f:
                    out[n[:-5]] = int(json.load(f)["version"])
        return out

    def delete_tag(self, name: str) -> None:
        os.unlink(self._tag_path(name))

    # -------------------------------------------------------------- branches
    def _branches_root(self) -> str:
        return os.path.join(self.path, MANIFEST_DIR, "branches")

    def create_branch(self, name: str, version: int | None = None) -> "LakeTable":
        """Fork a writable branch at ``version`` (default: current head).

        The write-audit-publish pattern (Iceberg WAP analog): ingest
        into a branch, audit it (read-by-branch, quality checks), then
        ``publish_branch`` fast-forwards main atomically — main readers
        never see unaudited commits. The branch gets its OWN CAS version
        sequence seeded with a hard link to the fork manifest; data
        files and sharded refs are shared (immutable, content-addressed).
        Returns a table handle opened on the branch (same class, so a
        MorTable branch keeps MOR semantics).
        """
        if self.branch is not None:
            raise ValueError("create_branch from the main table only")
        if not name or not all(c.isalnum() or c in "._-" for c in name):
            raise ValueError(f"invalid branch name {name!r}")
        v = version if version is not None else self.current_version()
        self.snapshot(v)  # must exist
        bdir = os.path.join(self._branches_root(), name)
        os.makedirs(os.path.dirname(bdir), exist_ok=True)
        os.mkdir(bdir)  # exclusive: racing creators, one wins
        os.link(self._manifest_path(v), os.path.join(bdir, f"v{v:08d}.json"))
        return type(self)(self.spark, self.path, branch=name)

    def branches(self) -> dict[str, int]:
        """branch name -> head version."""
        root = self._branches_root()
        if not os.path.isdir(root):
            return {}
        out = {}
        for n in sorted(os.listdir(root)):
            heads = [
                int(x[1:-5]) for x in os.listdir(os.path.join(root, n))
                if x.startswith("v") and x.endswith(".json")
            ]
            if heads:
                out[n] = max(heads)
        return out

    def drop_branch(self, name: str) -> None:
        import shutil

        shutil.rmtree(os.path.join(self._branches_root(), name))

    def publish_branch(self, name: str, drop: bool = True,
                       rebase: bool = False) -> int:
        """Publish a branch into main (the WAP 'publish').

        Fast-forward path (main unmoved since the fork): links every
        branch manifest after the fork point into main's version
        sequence via the same CAS. With ``rebase=True`` and a moved
        main, each branch commit is REPLAYED onto main as a bucket-level
        diff vs its branch parent — appends always rebase, replaced
        buckets require main not to have touched them since the fork,
        and stream fences abort a double-apply — the same safety rules
        as `_commit_loop`. Stream fences, lineage, and properties ride
        along either way, so replays stay exactly-once after
        publication. Returns the new main head version.

        Crash mid-publish leaves a consistent PREFIX of the branch on
        main (each linked/replayed manifest is a complete snapshot);
        re-running publish_branch resumes — fast-forward re-links are
        idempotent up to the CommitConflict on the first already-linked
        version, and the rebase path's stream fences skip batches the
        prefix already applied.
        """
        if self.branch is not None:
            raise ValueError("publish from the main table only")
        bdir = os.path.join(self._branches_root(), name)
        versions = sorted(
            int(x[1:-5]) for x in os.listdir(bdir)
            if x.startswith("v") and x.endswith(".json")
        )
        if not versions:
            raise FileNotFoundError(f"branch {name!r} has no manifests")
        fork, head = versions[0], versions[-1]
        cur = self.current_version()

        def _same(v: int) -> bool:
            mp = self._manifest_path(v)
            if not os.path.exists(mp):
                return False
            with open(os.path.join(bdir, f"v{v:08d}.json")) as a, open(mp) as b:
                return a.read() == b.read()

        # a crashed earlier publish leaves main at a PREFIX of the branch
        # — that still fast-forwards (the link loop below skips
        # already-identical versions)
        resumed_prefix = fork < cur <= head and all(
            _same(v) for v in versions if fork < v <= cur
        )
        if cur != fork and not resumed_prefix:
            if not rebase:
                raise CommitConflict(
                    f"main moved to v{cur} since branch {name!r} forked at "
                    f"v{fork}; publish_branch(rebase=True) to replay, or "
                    "re-branch"
                )
            out = self._publish_rebase(name, versions)
            if drop:
                self.drop_branch(name)
            return out
        for v in versions[1:]:
            src = os.path.join(bdir, f"v{v:08d}.json")
            try:
                os.link(src, self._manifest_path(v))
            except FileExistsError as e:
                # resume path: a prior crashed publish already linked
                # this exact manifest — anything else is a real race
                with open(src) as a, open(self._manifest_path(v)) as b:
                    if a.read() == b.read():
                        continue
                raise CommitConflict(
                    f"main gained v{v} during publish of {name!r}"
                ) from e
        if drop:
            self.drop_branch(name)
        return head

    @staticmethod
    def _diff_lists(
        prev: dict[str, list[str]], new: dict[str, list[str]]
    ) -> tuple[dict[str, list[str]], dict[str, list[str]]]:
        """Per-bucket diff of two file-list maps -> (replaced, appended).

        A list that EXTENDS its predecessor is an append (only the
        suffix replays); anything else — shrunk, rewritten, or emptied —
        is a replacement with the full new list."""
        repl: dict[str, list[str]] = {}
        app: dict[str, list[str]] = {}
        for b in set(prev) | set(new):
            old = prev.get(b, [])
            cur = new.get(b, [])
            if cur == old:
                continue
            if len(cur) > len(old) and cur[: len(old)] == old:
                app[b] = cur[len(old):]
            else:
                repl[b] = cur
        return repl, app

    def _publish_rebase(self, name: str, versions: list[int]) -> int:
        """Replay each branch commit's diff onto (moved) main."""
        bt = type(self)(self.spark, self.path, branch=name)
        streams_key = "streams"
        for pv, v in zip(versions, versions[1:]):
            prev, snap = bt.snapshot(pv), bt.snapshot(v)
            repl_base, app_base = self._diff_lists(prev.buckets, snap.buckets)
            repl_delta, app_delta = self._diff_lists(prev.deltas, snap.deltas)
            repl_eq, app_eq = self._diff_lists(prev.eq_deletes, snap.eq_deletes)
            stream_updates = {
                sid: upd
                for sid, upd in snap.properties.get(streams_key, {}).items()
                if prev.properties.get(streams_key, {}).get(sid) != upd
            }
            lineage_updates = {
                b: st for b, st in snap.lineage.items()
                if prev.lineage.get(b) != st
            }
            replaced_ids = sorted(set(repl_base) | set(repl_delta) | set(repl_eq))

            # resume/duplicate skip: a branch commit whose stream batches
            # are ALL already fenced on main was applied before (crashed
            # publish or an independent replay of the same batch ids) —
            # exactly-once means it must not replay
            if stream_updates:
                head_streams = self.snapshot(
                    self.current_version()
                ).properties.get(streams_key, {})
                if all(
                    upd.get("last_batch_id") is not None
                    and (head_streams.get(sid) or {}).get("last_batch_id")
                    is not None
                    and upd["last_batch_id"]
                    <= head_streams[sid]["last_batch_id"]
                    for sid, upd in stream_updates.items()
                ):
                    continue

            def unchanged_since_parent(cur: Snapshot) -> None:
                for b in replaced_ids:
                    if (
                        cur.buckets.get(b, []) != prev.buckets.get(b, [])
                        or cur.deltas.get(b, []) != prev.deltas.get(b, [])
                        or cur.eq_deletes.get(b, []) != prev.eq_deletes.get(b, [])
                    ):
                        raise CommitConflict(
                            f"bucket {b} diverged on main since branch "
                            f"{name!r} forked; cannot rebase its rewrite"
                        )

            def check(cur: Snapshot) -> None:
                self._check_stream_fence(cur, stream_updates)
                unchanged_since_parent(cur)

            orig = self.snapshot(self.current_version())
            check(orig)  # the loop only re-checks when the base moves

            def build(base: Snapshot) -> Snapshot:
                buckets = dict(base.buckets)
                deltas = dict(base.deltas)
                eq_deletes = dict(base.eq_deletes)
                for tgt, repl, app in (
                    (buckets, repl_base, app_base),
                    (deltas, repl_delta, app_delta),
                    (eq_deletes, repl_eq, app_eq),
                ):
                    for b, files in repl.items():
                        if files:
                            tgt[b] = files
                        else:
                            tgt.pop(b, None)
                    for b, files in app.items():
                        tgt[b] = tgt.get(b, []) + files
                # file-skipping stats ride the rebase: a replayed bucket
                # takes the BRANCH snapshot's bounds for its files (or
                # drops the entry — absent stats never mis-prune, they
                # just don't prune), appends merge the new files' bounds
                file_stats = dict(base.file_stats)
                for b, files in repl_base.items():
                    st = snap.file_stats.get(b)
                    if files and st:
                        file_stats[b] = {rel: st.get(rel, {}) for rel in files}
                    else:
                        file_stats.pop(b, None)
                for b, files in app_base.items():
                    st = snap.file_stats.get(b) or {}
                    add = {rel: st[rel] for rel in files if rel in st}
                    if add:
                        file_stats[b] = {**file_stats.get(b, {}), **add}
                props = json.loads(json.dumps(base.properties))
                if stream_updates:
                    props.setdefault(streams_key, {}).update(stream_updates)
                lineage = dict(base.lineage)
                lineage.update(lineage_updates)
                return Snapshot(
                    version=base.version + 1,
                    schema_json=_union_schema(
                        base.schema, snap.schema
                    ).jsonValue(),
                    buckets=buckets,
                    properties=props,
                    lineage=lineage,
                    deltas=deltas,
                    file_stats=file_stats,
                    eq_deletes=eq_deletes,
                )

            self._commit_loop(orig, build, check, rebase=True, max_retries=5)
        return self.current_version()

    # --------------------------------------------------------------- commits
    def write_bucket_data(
        self,
        df: DataFrame,
        num_buckets: int,
        bucket_key: str,
        sort_cols: list[str] | None = None,
        max_records_per_file: int | None = None,
    ) -> str:
        """Write ``df`` partitioned by bucket under a fresh staging dir.

        Returns the staging dir relpath. One Spark write job; files land
        directly in their final location (immutable), so publish is
        manifest-only — no rename storm (contrast DataX's per-file rename
        two-phase commit, hdfswriter/.../HdfsHelper.java:207-248).

        ``sort_cols`` sorts rows WITHIN each bucket before writing and
        ``max_records_per_file`` chunks the sorted run into bounded
        files — together they produce range-CLUSTERED files whose footer
        [min, max] bounds are near-disjoint, which is what makes
        manifest file skipping (lake/stats.py) effective inside a bucket
        (rewrite_clustered). Plain writes leave both off: no extra sort.
        """
        commit_rel = os.path.join(DATA_DIR, f"commit-{uuid.uuid4().hex}")
        out = os.path.join(self.path, commit_rel)
        try:
            tprops = self.snapshot().properties
            hash_v = tprops.get("bucket_hash_version", 1)
        except FileNotFoundError:
            # pre-create staging write: the table will be stamped v2
            tprops = {}
            hash_v = 2
        staged = df.withColumn(
            BUCKET_COL,
            bucket_expr(
                bucket_key,
                num_buckets,
                bucket_hash_dtype(df.schema, bucket_key, hash_v),
            ),
        ).repartition(BUCKET_COL)
        if sort_cols:
            # bucket-major so each bucket's rows stay contiguous in the
            # task even when hash slots collide buckets
            staged = staged.sortWithinPartitions(BUCKET_COL, *sort_cols)
        writer = staged.write.partitionBy(BUCKET_COL)
        if max_records_per_file:
            writer = writer.option("maxRecordsPerFile", max_records_per_file)
        bloom_cols = tprops.get("bloom_cols") or []
        bloom_ndv = tprops.get("bloom_ndv") or {}
        for c in bloom_cols:
            # parquet-mr per-column bloom toggle, consumed transparently
            # by the reader's pushed '=' predicates (row-group skipping)
            # AND probed driver-side by plan_scan (lake/parquet_bloom.py)
            writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
            if c in bloom_ndv:
                writer = writer.option(
                    f"parquet.bloom.filter.expected.ndv#{c}", str(bloom_ndv[c])
                )
        writer.parquet(out)
        return commit_rel

    @staticmethod
    def _list_staged(table_path: str, commit_rel: str) -> dict[str, list[str]]:
        """Map bucket -> staged parquet file relpaths (driver-side listing)."""
        out: dict[str, list[str]] = {}
        base = os.path.join(table_path, commit_rel)
        for entry in sorted(os.listdir(base)):
            if not entry.startswith(f"{BUCKET_COL}="):
                continue
            b = entry.split("=", 1)[1]
            files = sorted(
                os.path.join(commit_rel, entry, f)
                for f in os.listdir(os.path.join(base, entry))
                if f.endswith(".parquet")
            )
            if files:
                out[b] = files
        return out

    def _harvest_staged_stats(
        self, snap: Snapshot, staged: dict[str, list[str]]
    ) -> dict[str, dict[str, dict[str, list]]]:
        """Footer [min, max] bounds for staged files on the table's
        ``stats_cols`` — the write-time half of manifest file skipping
        (lake/stats.py). Pure parquet-metadata reads, no data scan; {}
        when the table opted out. Runs once per commit, BEFORE the CAS
        loop, so rebase retries never re-read footers."""
        cols = snap.properties.get("stats_cols") or []
        if not cols or not staged:
            return {}
        from datax_spark.lake.stats import collect_footer_stats

        rel_files = [rel for files in staged.values() for rel in files]
        per_file = collect_footer_stats(self.spark, self.path, rel_files, cols)
        return {
            b: {rel: per_file.get(rel, {}) for rel in files}
            for b, files in staged.items()
        }

    # ------------------------------------------------- optimistic concurrency
    def _check_stream_fence(
        self, cur: Snapshot, stream_updates: dict[str, Any] | None
    ) -> None:
        """Abort a rebase when the current snapshot already fenced our batch.

        The failover-fencing rule (odpswriter/.../OdpsWriter.java:327-354):
        if another writer advanced our stream's ``last_batch_id`` to or past
        the batch we are committing, our apply is a duplicate — rebasing it
        would double-apply, so it must die as a CommitConflict.
        """
        for sid, upd in (stream_updates or {}).items():
            bid = upd.get("last_batch_id")
            cur_last = (cur.properties.get("streams", {}).get(sid) or {}).get(
                "last_batch_id"
            )
            if bid is not None and cur_last is not None and bid <= cur_last:
                raise CommitConflict(
                    f"stream {sid!r} fenced: batch {bid} already committed "
                    f"(current last_batch_id={cur_last}) at {self.path}"
                )

    def _check_buckets_unchanged(
        self, orig: Snapshot, cur: Snapshot, buckets: list[int]
    ) -> None:
        """A replace commit read ``buckets`` content at ``orig``; rebasing is
        only safe if no intervening commit touched those buckets (base files
        OR deltas)."""
        for b in buckets:
            sb = str(b)
            if (
                cur.buckets.get(sb, []) != orig.buckets.get(sb, [])
                or cur.deltas.get(sb, []) != orig.deltas.get(sb, [])
                or cur.eq_deletes.get(sb, []) != orig.eq_deletes.get(sb, [])
            ):
                raise CommitConflict(
                    f"bucket {sb} changed since base v{orig.version}; "
                    f"replace commit cannot rebase at {self.path}"
                )

    def _commit_loop(self, orig: Snapshot, build, rebase_check, rebase: bool,
                     max_retries: int) -> Snapshot:
        """CAS-publish with automatic rebase.

        ``build(base_snapshot) -> Snapshot`` constructs the candidate on
        top of any base; ``rebase_check(cur)`` raises CommitConflict when
        rebasing onto ``cur`` is unsafe. The loop handles the DataX
        taskgroup-failover analog (TaskGroupContainer.java:162-241)
        declaratively: a loser of the manifest CAS reloads the winner's
        snapshot, verifies disjointness/fencing, and re-publishes — so an
        apply racing a compact()/vacuum() or a second stream on other
        buckets commits instead of stranding its staged files.
        """
        attempt_base_v = orig.version
        base = orig
        for attempt in range(max_retries + 1):
            cur_v = self.current_version()
            if cur_v != attempt_base_v:
                if not rebase:
                    raise CommitConflict(
                        f"base version {orig.version} superseded at {self.path}"
                    )
                cur = self.snapshot(cur_v)
                rebase_check(cur)
                attempt_base_v = cur_v
                base = cur
            snap = build(base)
            try:
                self._write_manifest(snap, base)
                return snap
            except CommitConflict:
                if not rebase or attempt == max_retries:
                    raise
        raise CommitConflict(f"retries exhausted at {self.path}")  # unreachable

    def commit_replace_buckets(
        self,
        base_version: int,
        commit_rel: str,
        replaced_buckets: list[int],
        schema: StructType | None = None,
        stream_updates: dict[str, Any] | None = None,
        lineage_updates: dict[str, Any] | None = None,
        rebase: bool = True,
        max_retries: int = 5,
        property_updates: dict[str, Any] | None = None,
        file_stats_updates: dict[str, dict[str, dict[str, list]]] | None = None,
        replace_lineage: bool = False,
        rewrite_only: bool = False,
    ) -> Snapshot:
        """Publish a snapshot replacing ``replaced_buckets`` with staged files.

        ``rewrite_only=True`` marks the commit as a pure file rewrite
        (compaction/clustering — no row changes): the change feed skips
        it and mirrors may stamp dataChange=false.

        ``replace_lineage=True`` makes ``lineage_updates`` the COMPLETE
        new lineage map instead of a merge — used when the bucket id
        space itself changes (rebucket) and old per-bucket entries would
        otherwise linger under dead ids.

        Untouched buckets carry forward by reference. If ``base_version``
        was superseded meanwhile, the commit REBASES automatically when
        safe — no intervening commit touched the replaced buckets and no
        stream fence was crossed — and raises CommitConflict otherwise
        (or always, with ``rebase=False``). A replaced bucket's old file
        stats are always dropped (stale bounds would mis-prune);
        ``file_stats_updates`` installs the new files' bounds.
        """
        orig = self.snapshot(base_version)
        staged = (
            self._list_staged(self.path, commit_rel) if commit_rel else {}
        )
        want_schema = schema or orig.schema
        if file_stats_updates is None:
            fsu = self._harvest_staged_stats(orig, staged)
        else:
            fsu = {str(b): v for b, v in file_stats_updates.items()}

        def check(cur: Snapshot) -> None:
            self._check_stream_fence(cur, stream_updates)
            self._check_buckets_unchanged(orig, cur, replaced_buckets)

        def build(base: Snapshot) -> Snapshot:
            buckets = dict(base.buckets)
            deltas = dict(base.deltas)
            eq_deletes = dict(base.eq_deletes)
            file_stats = dict(base.file_stats)
            for b in replaced_buckets:
                sb = str(b)
                if sb in staged:
                    buckets[sb] = staged[sb]
                else:
                    buckets.pop(sb, None)  # bucket emptied (all rows deleted)
                # replacing a bucket folds its deltas AND equality deletes
                # into the new base files
                deltas.pop(sb, None)
                eq_deletes.pop(sb, None)
                if sb in fsu:
                    file_stats[sb] = fsu[sb]
                else:
                    file_stats.pop(sb, None)
            props = json.loads(json.dumps(base.properties))
            if stream_updates:
                props.setdefault("streams", {}).update(stream_updates)
            if property_updates:
                props.update(json.loads(json.dumps(property_updates)))
            lineage = {} if replace_lineage else dict(base.lineage)
            for b, stats in (lineage_updates or {}).items():
                lineage[str(b)] = stats
            out = Snapshot(
                version=base.version + 1,
                # union with the rebased-onto schema: evolution is
                # additive-only, so merging both writers' columns is safe
                schema_json=_union_schema(base.schema, want_schema).jsonValue(),
                buckets=buckets,
                properties=props,
                lineage=lineage,
                deltas=deltas,
                file_stats=file_stats,
                eq_deletes=eq_deletes,
            )
            out.rewrite_only = rewrite_only
            return out

        return self._commit_loop(orig, build, check, rebase, max_retries)

    # ------------------------------------------------------------ change feed
    def _appended_files(
        self, old_snap, new_snap
    ) -> tuple[list[str], list[str], bool] | None:
        """(added delta rels, added eq rels, restrict) for an
        APPEND-ONLY MOR commit pair, or None when the single-pass diff
        doesn't apply (base files changed, files removed, patch deltas
        live, or this is a COW table — COW merges rewrite bucket files,
        so the changed key set is not recoverable from manifests). The
        append gate checks every bucket: base lists equal, old delta/eq
        lists a prefix of the new (the commit discipline — apply and
        DML increments only ever append).

        ``restrict`` says the appended batch is SMALL relative to the
        changed buckets' state (manifest byte sizes, no scan) — then
        the diff's input should additionally semi-join on the appended
        files' key set, turning its one shuffle into a broadcast-side
        prune (the 10^10-row-table regime). For bulk-shaped batches the
        extra semi-join is overhead over the groupBy's own
        changed-key filtering."""
        from datax_spark.lake.mor import MorTable

        if not isinstance(self, MorTable):
            return None
        if new_snap.properties.get("table_mode") != "mor":
            return None
        if new_snap.properties.get("mor_patch"):
            # pre/post images under partial-column patches need the
            # coalescing resolution — the generic two-read diff handles
            # it; single-pass winners would drop patched-in columns
            return None
        added_delta: list[str] = []
        added_eq: list[str] = []
        every = (
            set(old_snap.buckets) | set(new_snap.buckets)
            | set(old_snap.deltas) | set(new_snap.deltas)
            | set(old_snap.eq_deletes) | set(new_snap.eq_deletes)
        )
        for b in every:
            if old_snap.buckets.get(b, []) != new_snap.buckets.get(b, []):
                return None
            for old_t, new_t, out in (
                (old_snap.deltas, new_snap.deltas, added_delta),
                (old_snap.eq_deletes, new_snap.eq_deletes, added_eq),
            ):
                o, n = old_t.get(b, []), new_t.get(b, [])
                if o != n[: len(o)]:
                    return None
                out.extend(n[len(o):])
        if not added_delta and not added_eq:
            return None

        def _bytes(rels: list[str]) -> int:
            return sum(
                os.path.getsize(os.path.join(self.path, r))
                for r in rels
                if os.path.exists(os.path.join(self.path, r))
            )

        changed_b = {
            b for b in every
            if old_snap.deltas.get(b, []) != new_snap.deltas.get(b, [])
            or old_snap.eq_deletes.get(b, []) != new_snap.eq_deletes.get(b, [])
        }
        added_bytes = _bytes(added_delta) + _bytes(added_eq)
        state_bytes = sum(
            _bytes(t.get(b, []))
            for b in changed_b
            for t in (new_snap.buckets, new_snap.deltas, new_snap.eq_deletes)
        )
        return added_delta, added_eq, added_bytes * 4 <= state_bytes

    def read_changes(
        self, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Row-level change feed between two snapshots (Delta CDF /
        Iceberg incremental-read analog): the engine not only INGESTS a
        changelog but can EMIT one downstream.

        Returns the payload columns plus ``_change_type`` in
        ('insert', 'delete', 'update_preimage', 'update_postimage') and
        ``_commit_version`` — each change attributed to the commit that
        produced it, by diffing consecutive snapshots.

        Scale shape: a commit's manifest names exactly which buckets
        changed (file-list inequality — O(num_buckets) driver work), so
        the diff reads ONLY those buckets at both versions; untouched
        buckets (the overwhelming majority of a 100-TB table under CDC)
        are never scanned. Within a changed bucket the diff is
        ``exceptAll`` both ways + key-classification joins, all bounded
        by the changed buckets' size. Works on COW and MOR alike (MOR
        states are read resolved). Raises if an intermediate manifest
        was vacuumed away.
        """
        to_version = (
            self.current_version() if to_version is None else to_version
        )
        if to_version < from_version:
            raise ValueError("to_version must be >= from_version")
        to_snap = self.snapshot(to_version)
        props = to_snap.properties
        key_cols: list[str] = props["key_cols"]
        # The feed is emitted under to_version's column NAMES. A version
        # read from before a rename_column commit returns that era's
        # names; map them forward through the rename chains so every
        # era's frame unions cleanly and diffs compare value-to-value.
        chains = props.get("renames", {})

        def _forward(df: DataFrame) -> DataFrame:
            have = set(df.columns)
            for cur, chain in chains.items():
                if cur in have:
                    continue
                for old in reversed(chain):
                    if old in have:
                        df = df.withColumnRenamed(old, cur)
                        break
            return df

        parts: list[DataFrame] = []
        for v in range(from_version, to_version):
            old_snap, new_snap = self.snapshot(v), self.snapshot(v + 1)
            if new_snap.rewrite_only:
                # compaction / clustered rewrite: files moved, rows
                # didn't — a diff would net zero at full-bucket cost
                continue
            changed = sorted(
                int(b)
                for b in set(old_snap.buckets) | set(new_snap.buckets)
                | set(old_snap.deltas) | set(new_snap.deltas)
                | set(old_snap.eq_deletes) | set(new_snap.eq_deletes)
                if old_snap.buckets.get(b, []) != new_snap.buckets.get(b, [])
                or old_snap.deltas.get(b, []) != new_snap.deltas.get(b, [])
                or old_snap.eq_deletes.get(b, []) != new_snap.eq_deletes.get(b, [])
            )
            if not changed:
                continue
            payload = [
                f.name for f in to_snap.schema.fields
                if not f.name.startswith("_")
            ]
            # MOR append-only commits (the hot CDC loop: apply/DML
            # commits add delta/eq files, bases untouched) diff in ONE
            # PASS: scan the changed buckets once with the appended
            # files tagged, compute each key's pre-winner (appended
            # rows and eq-deletes excluded) and post-winner in one
            # per-key aggregation, classify, and drop value-equal
            # keys — one shuffle instead of two resolved reads + two
            # exceptAlls + four joins, and only keys touched by the
            # commit survive the aggregation (PLANS.md §17). Rewrites
            # (base lists differ) and live patch deltas fall back to
            # the generic full-bucket diff.
            appended = self._appended_files(old_snap, new_snap)
            if appended is not None:
                from pyspark.sql.types import StringType as _Str
                from pyspark.sql.types import StructField as _SF

                sp = _forward(
                    self._read_changes_single_pass(
                        old_snap, new_snap, changed, *appended
                    )
                )
                pair = _conform_payload(
                    sp, payload + ["_change_type"],
                    StructType(
                        list(to_snap.schema.fields)
                        + [_SF("_change_type", _Str())]
                    ),
                )
            else:
                old_df = _conform_payload(
                    _forward(self.read(buckets=changed, version=v)),
                    payload, to_snap.schema,
                )
                new_df = _conform_payload(
                    _forward(self.read(buckets=changed, version=v + 1)),
                    payload, to_snap.schema,
                )
                pre = old_df.exceptAll(new_df)
                post = new_df.exceptAll(old_df)
                post_keys = post.select(*key_cols).distinct()
                pre_keys = pre.select(*key_cols).distinct()
                ct = "_change_type"
                frames = [
                    pre.join(post_keys, key_cols, "left_semi")
                    .withColumn(ct, F.lit("update_preimage")),
                    pre.join(post_keys, key_cols, "left_anti")
                    .withColumn(ct, F.lit("delete")),
                    post.join(pre_keys, key_cols, "left_semi")
                    .withColumn(ct, F.lit("update_postimage")),
                    post.join(pre_keys, key_cols, "left_anti")
                    .withColumn(ct, F.lit("insert")),
                ]
                pair = frames[0]
                for f in frames[1:]:
                    pair = pair.unionByName(f)
            parts.append(pair.withColumn("_commit_version", F.lit(v + 1)))
        if not parts:
            schema = self.snapshot(to_version).schema
            from pyspark.sql.types import IntegerType, StringType, StructField

            empty_schema = StructType(
                [f for f in schema.fields if not f.name.startswith("_")]
                + [StructField("_change_type", StringType()),
                   StructField("_commit_version", IntegerType())]
            )
            return self.spark.createDataFrame([], empty_schema)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # ------------------------------------------------- schema evolution (DDL)
    def _schema_ddl_guard(self, snap: Snapshot, name: str, verb: str) -> None:
        """Shared preconditions for rename_column / drop_column."""
        props = snap.properties
        if name.startswith("_"):
            raise SchemaEvolutionError(
                f"cannot {verb} meta column {name!r}"
            )
        if name not in {f.name for f in snap.schema.fields}:
            raise SchemaEvolutionError(
                f"cannot {verb} {name!r}: no such column"
            )
        if name in props["key_cols"] or name == props["bucket_key"]:
            raise SchemaEvolutionError(
                f"cannot {verb} {name!r}: key / bucket columns are the "
                "table's physical identity (bucket hashing, dedup, "
                "eq-delete files all address rows by these names); "
                "recreate the table to change them"
            )
        pat = re.compile(rf"\b{re.escape(name)}\b")
        for cname, expr in (props.get("constraints") or {}).items():
            if pat.search(expr):
                raise SchemaEvolutionError(
                    f"cannot {verb} {name!r}: referenced by CHECK "
                    f"constraint {cname!r} ({expr!r})"
                )

    # Names the change-apply paths claim for CDC markers (kept in sync
    # with operators.merge.CDC_META_COLS, which builds from this set):
    # a payload column renamed TO one of these would be silently
    # overwritten with marker values on the next apply.
    CDC_RESERVED_NAMES = frozenset({"op", "seq", "ts", "batch_file"})

    def rename_column(
        self, old: str, new: str, max_retries: int = 3
    ) -> Snapshot:
        """Metadata-only column rename (Iceberg ALTER TABLE RENAME COLUMN
        semantics, `iceberg` spec's field-id resolution re-expressed for
        name-based parquet reads): no data file rewrites. The manifest
        records the retired physical name; every read requests both
        names and coalesces forward (_read_files), so files from before
        the rename keep resolving. Costs of the name-based stand-in,
        enforced loudly rather than silently corrupting:

        - a RETIRED name can never be (re-)added to this table — old
          files still carry values under it, and a name-based read
          could not tell the new column from the ghost (_write_manifest
          guard + operators.merge._evolve_schema);
        - key/bucket columns are not renamable (physical identity).

        Old files' min/max + bloom stats stay keyed under the retired
        name, so pruning on the new name FAILS OPEN for them (sound,
        unpruned) and tightens again as compaction/clustering rewrites
        files under the current name.
        """
        orig = self.snapshot()
        self._schema_ddl_guard(orig, old, "rename")
        if not new or new.startswith("_"):
            raise SchemaEvolutionError(f"invalid new column name {new!r}")
        if new in self.CDC_RESERVED_NAMES:
            raise SchemaEvolutionError(
                f"invalid new column name {new!r}: reserved for CDC "
                "change markers — the next apply would overwrite the "
                "column with marker values"
            )

        def build(base: Snapshot) -> Snapshot:
            names = {f.name for f in base.schema.fields}
            if old not in names:
                raise SchemaEvolutionError(
                    f"column {old!r} disappeared under a concurrent commit"
                )
            props = json.loads(json.dumps(base.properties))
            retired = set(props.get("retired_cols", []))
            if new in names or new in retired:
                raise SchemaEvolutionError(
                    f"cannot rename to {new!r}: name already "
                    + ("retired on" if new in retired else "present in")
                    + " this table"
                )
            renames = props.setdefault("renames", {})
            chain = renames.pop(old, []) + [old]
            renames[new] = chain
            retired.add(old)
            props["retired_cols"] = sorted(retired)
            for key in ("stats_cols", "bloom_cols"):
                props[key] = [
                    new if c == old else c for c in props.get(key, [])
                ]
            if old in props.get("bloom_ndv", {}):
                props["bloom_ndv"][new] = props["bloom_ndv"].pop(old)
            fields = [
                StructField(new, f.dataType, f.nullable)
                if f.name == old
                else f
                for f in base.schema.fields
            ]
            return Snapshot(
                version=base.version + 1,
                schema_json=StructType(fields).jsonValue(),
                buckets=base.buckets,
                properties=props,
                lineage=base.lineage,
                deltas=base.deltas,
                file_stats=base.file_stats,
                eq_deletes=base.eq_deletes,
            )

        def check(cur: Snapshot) -> None:
            pass  # metadata-only; build() re-validates against any base

        return self._commit_loop(orig, build, check, True, max_retries)

    def drop_column(self, name: str, max_retries: int = 3) -> Snapshot:
        """Metadata-only column drop (Iceberg DROP COLUMN semantics): the
        data files keep the bytes, reads stop requesting the column. The
        name — and every retired name in its rename chain — is burned
        forever on this table (re-adding it would RESURRECT the old
        files' values under name-based reads; Iceberg avoids that with a
        fresh field id, we refuse instead). Columns referenced by CHECK
        constraints, keys, or the bucket key are not droppable.
        """
        orig = self.snapshot()
        self._schema_ddl_guard(orig, name, "drop")

        def build(base: Snapshot) -> Snapshot:
            names = {f.name for f in base.schema.fields}
            if name not in names:
                raise SchemaEvolutionError(
                    f"column {name!r} disappeared under a concurrent commit"
                )
            props = json.loads(json.dumps(base.properties))
            retired = set(props.get("retired_cols", []))
            renames = props.setdefault("renames", {})
            retired.update(renames.pop(name, []))
            retired.add(name)
            props["retired_cols"] = sorted(retired)
            for key in ("stats_cols", "bloom_cols"):
                props[key] = [c for c in props.get(key, []) if c != name]
            props.get("bloom_ndv", {}).pop(name, None)
            fields = [f for f in base.schema.fields if f.name != name]
            return Snapshot(
                version=base.version + 1,
                schema_json=StructType(fields).jsonValue(),
                buckets=base.buckets,
                properties=props,
                lineage=base.lineage,
                deltas=base.deltas,
                file_stats=base.file_stats,
                eq_deletes=base.eq_deletes,
            )

        def check(cur: Snapshot) -> None:
            pass  # metadata-only; build() re-validates against any base

        return self._commit_loop(orig, build, check, True, max_retries)

    def add_columns(self, fields, max_retries: int = 3) -> Snapshot:
        """Metadata-only ADDITIVE column evolution (Iceberg ADD COLUMN):
        append nullable payload columns to the schema; no data files
        rewrite, old files read the new columns as null. This is the
        commit half of mid-stream binlog DDL (streaming/ddl.py) and the
        declared-type twin of the apply path's data-driven evolution
        (operators/merge._evolve_schema, which can only see the types a
        batch happens to carry).

        IDEMPOTENT under replay: a field already present with the SAME
        type is skipped; all-skipped means NO new version is committed
        (re-applied DDL batches stay no-ops). A present field with a
        DIFFERENT type raises — type changes must flow through the
        widening rules on the data path, never a DDL side door. RETIRED
        names (renamed/dropped) raise per the name-based-read contract.

        ``fields``: a StructType or list of StructField.
        """
        if isinstance(fields, StructType):
            fields = list(fields.fields)
        for f in fields:
            if not f.name or f.name.startswith("_"):
                raise SchemaEvolutionError(
                    f"invalid new column name {f.name!r}"
                )
            if f.name in self.CDC_RESERVED_NAMES:
                raise SchemaEvolutionError(
                    f"invalid new column name {f.name!r}: reserved for "
                    "CDC change markers"
                )
        orig = self.snapshot()

        def build(base: Snapshot) -> Snapshot:
            existing = {f.name: f for f in base.schema.fields}
            retired = set(base.properties.get("retired_cols", []))
            new_fields, seen = [], set()
            for f in fields:
                if f.name in seen:
                    continue
                seen.add(f.name)
                cur = existing.get(f.name)
                if cur is not None:
                    if cur.dataType != f.dataType:
                        raise SchemaEvolutionError(
                            f"column {f.name!r} exists as "
                            f"{cur.dataType.simpleString()}, DDL declares "
                            f"{f.dataType.simpleString()}; type changes "
                            "must go through the data-path widening rules"
                        )
                    continue  # replayed DDL: already added
                if f.name in retired:
                    raise SchemaEvolutionError(
                        f"column {f.name!r} is a RETIRED physical name on "
                        "this table (renamed or dropped): old data files "
                        "still carry values under it. Pick a fresh name"
                    )
                new_fields.append(StructField(f.name, f.dataType, True))
            if not new_fields:
                raise _AddColumnsNoOp(base)  # commit nothing
            schema = StructType(list(base.schema.fields) + new_fields)
            return Snapshot(
                version=base.version + 1,
                schema_json=schema.jsonValue(),
                buckets=base.buckets,
                properties=base.properties,
                lineage=base.lineage,
                deltas=base.deltas,
                file_stats=base.file_stats,
                eq_deletes=base.eq_deletes,
            )

        def check(cur: Snapshot) -> None:
            pass  # metadata-only; build() re-validates against any base

        # No-op = every field already present (a replayed DDL batch, or
        # a concurrent writer won the race mid-loop): return the base
        # unchanged instead of publishing an empty version.
        try:
            return self._commit_loop(orig, build, check, True, max_retries)
        except _AddColumnsNoOp as e:
            return e.snapshot

    # ------------------------------------------------------------ properties
    def last_batch_id(self, stream_id: str) -> int | None:
        streams = self.snapshot().properties.get("streams", {})
        entry = streams.get(stream_id)
        return None if entry is None else entry.get("last_batch_id")

    def count(self, metadata_only: bool = False) -> int:
        """Row count. ``metadata_only=True`` answers from the manifest's
        per-file footer row counts — ZERO Spark jobs, O(files) driver
        work (the Iceberg count(*)-from-manifests behavior). Requires a
        stats-enabled table (``stats_cols`` non-empty at create: the
        counts ride the same footer harvest) whose every base file has
        been written since; MOR tables must have no unresolved deltas or
        eq-deletes (their net effect on the count needs a real resolve —
        run ``compact()`` first)."""
        if not metadata_only:
            return self.read().count()
        snap = self.snapshot()
        if any(snap.deltas.values()) or any(snap.eq_deletes.values()):
            raise ValueError(
                "metadata count needs all deltas compacted (pending "
                "deltas/eq-deletes change the resolved count)"
            )
        total = 0
        for b, files in snap.buckets.items():
            for rel in files:
                st = (snap.file_stats.get(b) or {}).get(rel) or {}
                if "#rows" not in st:
                    raise ValueError(
                        f"no row-count stats for {rel}: table created "
                        "without stats_cols, or file written before the "
                        "row-count harvest existed"
                    )
                total += int(st["#rows"][0])
        return total

    def describe(self, version: int | None = None) -> dict[str, Any]:
        """Driver-side table summary — pure manifest metadata + file
        sizes, no Spark job (the DataX job-report analog,
        core/.../communication/CommunicationTool.java report strings).
        """
        snap = self.snapshot(version)

        def side(table: dict[str, list[str]]) -> dict[str, int]:
            files = [rel for fs in table.values() for rel in fs]
            return {
                "files": len(files),
                "bytes": sum(
                    os.path.getsize(p)
                    for rel in files
                    if os.path.exists(p := os.path.join(self.path, rel))
                ),
                "buckets": sum(1 for fs in table.values() if fs),
            }

        return {
            "path": self.path,
            "branch": self.branch,
            "version": snap.version,
            "table_mode": snap.properties.get("table_mode", "cow"),
            "num_buckets": snap.properties.get("num_buckets"),
            "key_cols": snap.properties.get("key_cols"),
            "bucket_key": snap.properties.get("bucket_key"),
            "base": side(snap.buckets),
            "delta": side(snap.deltas),
            "eq_deletes": side(snap.eq_deletes),
            "streams": snap.properties.get("streams", {}),
            "schema_fields": [f.name for f in snap.schema.fields],
            "tags": self.tags(),
            "branches": self.branches() if self.branch is None else {},
            "stats_cols": snap.properties.get("stats_cols", []),
            "bloom_cols": snap.properties.get("bloom_cols", []),
        }

    def create_view(self, name: str, version: int | None = None) -> None:
        """Register (a snapshot of) the table as a temp view for spark.sql.

        The SQL surface over the lake: views are snapshot-consistent
        (pinned to the manifest read at creation), so concurrent commits
        never tear a running query.
        """
        self.read(version=version).createOrReplaceTempView(name)

    # ------------------------------------------------------------ bulk load
    def _conform_to_stored(self, df: DataFrame, snap: Snapshot) -> DataFrame:
        """Cast ``df`` to the stored schema for a bulk/insert-only write.

        Payload columns must arrive with the frame (a missing one is a
        caller error and surfaces as Spark's unresolved-column); meta
        columns the frame doesn't carry (MOR stored schema: _seq/_op/
        _patch) fill NULL — the designed encoding for bulk/pre-stream
        base rows: no op, no patch marker, and a NULL seq that any
        delete out-seqs and any delta image supersedes (lake/mor.py
        resolution + eq-delete contracts).
        """
        have = set(df.columns)
        return df.select(
            *[
                (
                    F.col(f.name)
                    if f.name in have or not f.name.startswith("_")
                    else F.lit(None)
                )
                .cast(f.dataType)
                .alias(f.name)
                for f in snap.schema.fields
            ]
        )

    def bulk_load(self, df: DataFrame, mode: str = "truncate") -> Snapshot:
        """Initial snapshot load — the DataX full-sync (reader->writer bulk
        move) path, one parallel write + one commit.

        mode='truncate' replaces the whole table (odpswriter truncate
        analog, odpswriter/.../OdpsWriter.java); mode='nonConflict'
        refuses when the table already has data (hdfswriter nonConflict,
        hdfswriter/.../HdfsWriter.java:81-90). Rows must carry the table's
        payload columns; keys are not deduplicated (a bulk load is assumed
        key-unique — run dedup_latest first if not).
        """
        snap = self.snapshot()
        props = snap.properties
        if mode == "nonConflict" and any(snap.buckets.values()):
            raise FileExistsError(f"table {self.path} is not empty")
        if mode not in ("truncate", "nonConflict"):
            raise ValueError(f"unknown bulk_load mode {mode!r}")
        conformed = self._conform_to_stored(df, snap)
        commit_rel = self.write_bucket_data(
            conformed, props["num_buckets"], props["bucket_key"]
        )
        return self.commit_replace_buckets(
            snap.version,
            commit_rel,
            replaced_buckets=list(range(props["num_buckets"])),
        )

    def commit_append_buckets(
        self,
        base_version: int,
        commit_rel: str,
        stream_updates: dict[str, Any] | None = None,
        schema: StructType | None = None,
        lineage_updates: dict[str, Any] | None = None,
        as_delta: bool = False,
        rebase: bool = True,
        max_retries: int = 5,
        property_updates: dict[str, Any] | None = None,
        file_stats_updates: dict[str, dict[str, dict[str, list]]] | None = None,
        eq_commit_rel: str | None = None,
    ) -> Snapshot:
        """Publish a snapshot APPENDING staged files to their buckets.

        The insert-only fast path (DataX writeMode=insert append
        semantics): no read-back, no bucket rewrite — O(batch) work no
        matter how big the table is. ``as_delta=False`` appends to the
        BASE file set: callers must guarantee key-newness (use
        ``append_insert_only`` which enforces op=='insert').
        ``as_delta=True`` appends to the bucket's DELTA list (merge-on-
        read): keys may overlap base and prior deltas; MorTable.read
        resolves latest-wins. Buckets fragment one file per batch either
        way, so pair with ``compact``.

        An append never reads table content, so a superseded base rebases
        unconditionally onto the current snapshot (two streams on any
        buckets, or an apply racing a compact) — EXCEPT across a stream
        fence, which means another writer already applied this batch.

        ``eq_commit_rel``: a second staging dir whose files append to the
        buckets' EQUALITY-DELETE lists (Iceberg v2 delete-file analog,
        consumed by MorTable) — one atomic commit covers the data appends
        and the delete files together.
        """
        orig = self.snapshot(base_version)
        staged = self._list_staged(self.path, commit_rel) if commit_rel else {}
        eq_staged = (
            self._list_staged(self.path, eq_commit_rel) if eq_commit_rel else {}
        )
        want_schema = schema or orig.schema
        if file_stats_updates is None and not as_delta:
            fsu = self._harvest_staged_stats(orig, staged)
        else:
            fsu = {str(b): v for b, v in (file_stats_updates or {}).items()}

        def check(cur: Snapshot) -> None:
            self._check_stream_fence(cur, stream_updates)

        def build(base: Snapshot) -> Snapshot:
            buckets = dict(base.buckets)
            deltas = dict(base.deltas)
            eq_deletes = dict(base.eq_deletes)
            file_stats = dict(base.file_stats)
            target = deltas if as_delta else buckets
            for b, files in staged.items():
                target[b] = target.get(b, []) + files
            for b, files in eq_staged.items():
                eq_deletes[b] = eq_deletes.get(b, []) + files
            if not as_delta:
                # appended files extend the bucket: merge their bounds in
                # (existing files are immutable, their stats stay valid)
                for b, per_file in fsu.items():
                    file_stats[b] = {**file_stats.get(b, {}), **per_file}
            props = json.loads(json.dumps(base.properties))
            if stream_updates:
                props.setdefault("streams", {}).update(stream_updates)
            if property_updates:
                props.update(json.loads(json.dumps(property_updates)))
            lineage = dict(base.lineage)
            for b, stats in (lineage_updates or {}).items():
                lineage[str(b)] = stats
            return Snapshot(
                version=base.version + 1,
                schema_json=_union_schema(base.schema, want_schema).jsonValue(),
                buckets=buckets,
                properties=props,
                lineage=lineage,
                deltas=deltas,
                file_stats=file_stats,
                eq_deletes=eq_deletes,
            )

        return self._commit_loop(orig, build, check, rebase, max_retries)

    def append_insert_only(
        self, df: DataFrame, batch_id: int | None = None, stream_id: str = "default"
    ) -> Snapshot:
        """Append payload rows without touching existing data (fenced).

        The caller asserts the rows are brand-new keys (insert-only CDC
        segment / log-structured ingest). Fencing matches merge_apply:
        a replayed batch_id is a no-op.
        """
        snap = self.snapshot()
        props = snap.properties
        if batch_id is not None:
            last = (props.get("streams", {}).get(stream_id) or {}).get(
                "last_batch_id"
            )
            if last is not None and batch_id <= last:
                return snap
        conformed = self._conform_to_stored(df, snap)
        commit_rel = self.write_bucket_data(
            conformed, props["num_buckets"], props["bucket_key"]
        )
        updates = (
            {stream_id: {"last_batch_id": batch_id}} if batch_id is not None else None
        )
        return self.commit_append_buckets(
            snap.version, commit_rel, stream_updates=updates
        )

    # ------------------------------------------------------------ maintenance
    def compact(self, max_files_per_bucket: int = 1, max_retries: int = 3) -> dict[str, int]:
        """Bin-pack buckets whose file count exceeds the threshold.

        A long-running CDC stream leaves ~one file per bucket per batch;
        compaction rewrites only the fragmented buckets (copy-on-write,
        same publish path as a MERGE) and carries the rest forward by
        reference. Combine with ``vacuum`` to reclaim the old files.
        Losing a commit race to a concurrent apply re-runs the whole
        compaction against the winner's snapshot (the stale rewrite's
        staged files are left for vacuum).
        """
        for attempt in range(max_retries + 1):
            try:
                return self._compact_once(max_files_per_bucket)
            except CommitConflict:
                if attempt == max_retries:
                    raise
        raise AssertionError("unreachable")

    def _compact_once(self, max_files_per_bucket: int) -> dict[str, int]:
        snap = self.snapshot()
        props = snap.properties
        fragmented = [
            int(b) for b, files in snap.buckets.items()
            if len(files) > max_files_per_bucket
        ]
        if not fragmented:
            return {"compacted_buckets": 0, "files_before": 0, "files_after": 0}
        files_before = sum(len(snap.buckets[str(b)]) for b in fragmented)
        # write_bucket_data repartitions by bucket id: each fragmented
        # bucket lands in one task -> one output file per bucket.
        df = self.read(buckets=fragmented)
        commit_rel = self.write_bucket_data(
            df, props["num_buckets"], props["bucket_key"]
        )
        new_snap = self.commit_replace_buckets(
            snap.version, commit_rel, replaced_buckets=fragmented,
            rewrite_only=True,
        )
        files_after = sum(len(new_snap.buckets.get(str(b), [])) for b in fragmented)
        return {
            "compacted_buckets": len(fragmented),
            "files_before": files_before,
            "files_after": files_after,
        }

    def rewrite_clustered(
        self,
        sort_cols: list[str],
        target_file_rows: int = 1_000_000,
        buckets: list[int] | None = None,
        max_retries: int = 3,
    ) -> Snapshot:
        """Rewrite buckets with rows sorted by ``sort_cols`` into files of
        at most ``target_file_rows`` rows — the Delta ``OPTIMIZE ZORDER``
        analog (1-D linear clustering).

        Hash bucketing spreads a key's rows for join/merge locality, but
        it leaves every file spanning the full range of any OTHER column
        — so manifest file skipping (scan/plan_scan) can't prune inside a
        bucket. This maintenance rewrite re-lays each bucket's data as a
        sorted run chunked into bounded files with near-disjoint footer
        bounds: a seq/event-time range scan then touches O(range) files
        per bucket instead of all of them. At 100 TB a bucket is many
        files, which is exactly when this matters. Stats for the new
        files are harvested by the replace commit as usual; a lost
        commit race re-runs against the winner's snapshot.
        """
        for attempt in range(max_retries + 1):
            try:
                return self._rewrite_clustered_once(
                    sort_cols, target_file_rows, buckets
                )
            except CommitConflict:
                if attempt == max_retries:
                    raise
        raise AssertionError("unreachable")

    def _rewrite_clustered_once(
        self,
        sort_cols: list[str],
        target_file_rows: int,
        buckets: list[int] | None,
    ) -> Snapshot:
        snap = self.snapshot()
        props = snap.properties
        sel = (
            sorted(
                int(b)
                for b in set(snap.buckets) | set(snap.deltas)
                | set(snap.eq_deletes)
            )
            if buckets is None
            else list(buckets)
        )
        df = self._rewrite_source(snap, sel)
        commit_rel = self.write_bucket_data(
            df, props["num_buckets"], props["bucket_key"],
            sort_cols=sort_cols, max_records_per_file=target_file_rows,
        )
        return self.commit_replace_buckets(
            snap.version, commit_rel, replaced_buckets=sel,
            rewrite_only=True,
        )

    def _rewrite_source(self, snap: Snapshot, buckets: list[int]) -> DataFrame:
        """Rows a clustering rewrite must carry for ``buckets`` — the raw
        base files on COW; MorTable overrides to fold live deltas in
        (the replace commit clears their lists)."""
        return self._read_files(
            self._abs_files(snap, buckets), snap.schema,
            snap.properties.get("renames"),
        )

    def overwrite_where(
        self,
        filters: list,
        df: DataFrame,
        validate: bool = True,
        max_retries: int = 3,
    ) -> Snapshot:
        """Atomic predicate overwrite (Delta ``replaceWhere`` / dynamic
        partition overwrite analog): delete every stored row matching
        ``filters`` and insert ``df``, as ONE commit — the backfill
        primitive (re-deriving a corrupted time slice, replaying a
        partition from upstream).

        ``filters`` uses the ``scan`` tuple grammar. With an ``=`` filter
        on the bucket key the rewrite touches only that key's hash bucket
        (plus buckets ``df`` hashes into); any other predicate rewrites
        every bucket that may hold matching rows — correct, just a bigger
        copy-on-write. On MOR tables the rewrite folds live deltas in
        resolved (the replace commit clears the buckets' delta and
        eq-delete lists), so overwritten history can't resurrect.

        ``validate``: require every ``df`` row to satisfy the predicate
        (the Delta contract) — otherwise a later identical overwrite
        would silently delete the out-of-slice rows. One narrow count
        job; opt out for trusted callers.

        Losing the commit CAS to a concurrent writer re-runs against the
        winner's snapshot (same policy as ``compact``).
        """
        from datax_spark.lake.stats import filters_to_expr, validate_filters

        validate_filters(filters)
        pred = filters_to_expr(filters)
        if validate:
            # NOT(pred IS TRUE): a NULL-predicate row is outside the
            # slice too (the survivor filter keeps such rows), so it must
            # fail validation — plain ~pred would let it slip through as
            # NULL and re-running the same overwrite would duplicate it.
            bad = df.filter(~F.coalesce(pred, F.lit(False))).limit(1).count()
            if bad:
                raise ValueError(
                    "overwrite_where: df has rows NOT matching the "
                    "predicate; they would fall outside the overwritten "
                    "slice (pass validate=False to force)"
                )
        for attempt in range(max_retries + 1):
            try:
                return self._overwrite_once(filters, pred, df)
            except CommitConflict:
                if attempt == max_retries:
                    raise
        raise AssertionError("unreachable")

    def _apply_set_exprs(
        self, snap: Snapshot, matched: DataFrame, set_exprs: dict[str, Any]
    ) -> DataFrame:
        """Validate SET expressions and project ``matched`` (resolved
        payload rows) with them applied — shared by the COW and MOR
        ``update_where`` paths so the DML guards cannot drift."""
        props = snap.properties
        payload = [
            f.name for f in snap.schema.fields if not f.name.startswith("_")
        ]
        for c in set_exprs:
            if c in props["key_cols"] or c == props["bucket_key"]:
                raise ValueError(
                    f"cannot SET key/bucket column {c!r} (row identity); "
                    "delete + insert instead"
                )
            if c not in payload:
                raise ValueError(f"cannot SET unknown column {c!r}")
        types = {f.name: f.dataType for f in snap.schema.fields}
        sets = {
            c: (F.expr(e) if isinstance(e, str) else e)
            for c, e in set_exprs.items()
        }
        return matched.select(
            *[
                (sets[c].cast(types[c]) if c in sets else F.col(c)).alias(c)
                for c in payload
            ]
        )

    def update_where(
        self,
        filters: list,
        set_exprs: dict[str, Any],
        max_retries: int = 3,
    ) -> Snapshot:
        """Row-level UPDATE by predicate (Delta ``UPDATE ... SET``): the
        matching slice rewrites with the SET expressions applied — one
        atomic ``overwrite_where`` commit, pruned to the buckets that
        may hold matches. ``set_exprs`` maps payload column -> Column or
        SQL string evaluated over the current row. Key/bucket columns
        refuse (row identity). MorTable overrides with an O(matching
        rows) delta append; this COW form is the physical-rewrite path.
        """
        snap = self.snapshot()
        matched = self.scan(filters, version=snap.version)
        updated = self._apply_set_exprs(snap, matched, set_exprs)
        return self.overwrite_where(
            filters, updated, validate=False, max_retries=max_retries
        )

    def delete_where(
        self, filters: list, max_retries: int = 3
    ) -> Snapshot:
        """Row-level DELETE by predicate (Delta ``DELETE FROM`` analog):
        ``overwrite_where`` with an empty replacement. The GDPR/erasure
        path: combine with ``vacuum(keep_last=1)`` (and dropping any tags
        or branches pinning old versions) to physically remove the rows'
        files — retained snapshots still see them until expired, by
        design (immutable history)."""
        empty = self.spark.createDataFrame([], self.snapshot().schema)
        return self.overwrite_where(
            filters, empty, validate=False, max_retries=max_retries
        )

    # ------------------------------------------------------------ MERGE INTO
    def _merge_seq_base(self, snap: Snapshot, buckets: list[int]) -> int:
        """Base seq for merge_into's synthesized change rows. COW tables
        store no per-row seq (the rewrite replaces matched keys
        unconditionally), so 0 works; MorTable overrides with the
        affected buckets' live max so merge images out-seq every stored
        row under latest-wins resolution."""
        return 0

    def _merge_apply_changes(self, chg: DataFrame, batch_id: int):
        """Apply merge_into's deduped change batch through the layout's
        exactly-once path (COW fenced MERGE here; MOR delta append in
        the override)."""
        from datax_spark.operators.merge import merge_apply

        return merge_apply(
            self, chg, batch_id=batch_id, stream_id="_merge_into"
        )

    def merge_into(
        self,
        source: DataFrame,
        when_matched_update: "dict[str, Any] | str | None" = None,
        when_matched_delete: "Any | None" = None,
        when_not_matched_insert: "dict[str, Any] | str | None" = None,
        update_condition: "Any | None" = None,
    ) -> Snapshot:
        """Declarative three-clause MERGE (Delta/Iceberg ``MERGE INTO``
        analog; the set-based generalization of the rdbms writers'
        replace/update writeModes, CommonRdbmsWriter.java:88-169): join
        ``source`` to the live table ON the table's key columns and, per
        source row, delete / update / insert in ONE atomic fenced
        commit.

        Clauses (any subset, at least one):
        - ``when_matched_delete``: condition (SQL string or Column over
          ``t.*``/``s.*`` aliases, or ``True``) — matched rows
          satisfying it are deleted. Evaluated FIRST among matched rows.
        - ``when_matched_update``: ``"*"`` (every non-key payload column
          := ``s.<col>``; source must carry them all) or a dict of
          payload column -> expression over ``t.*``/``s.*``. Applies to
          matched rows not claimed by the delete clause, optionally
          gated by ``update_condition``. Key/bucket columns refuse (row
          identity — delete + insert instead).
        - ``when_not_matched_insert``: ``"*"`` (insert the source row)
          or a dict of payload column -> expression over ``s.*``
          (unspecified columns NULL; key columns always come from the
          source row and refuse overrides). Without this clause,
          unmatched source rows are IGNORED — the behavior that an
          upsert cannot express and the reason MERGE needs the join.

        Contract: ``source`` must be key-unique (one row per table key;
        duplicates raise, the Delta multiple-source-rows error — pre-
        dedup with ``dedup_latest`` if the source can carry several).
        NULL conditions count as non-matching (three-valued safety).

        Physical shape (the 100-TB story): source keys hash to their
        buckets in one column-pruned pass (O(distinct buckets) driver
        rows); ONLY those buckets' resolved rows join the source — an
        equi-join on the key columns that AQE broadcasts whenever the
        source is small, so a 1k-row merge into a 10^10-row table reads
        a handful of buckets and shuffles nothing else. The synthesized
        change batch then rides the exactly-once apply path: COW
        rewrites only affected buckets; MOR appends O(changes) delta
        rows and never touches base files. Cites: Delta MERGE semantics
        (public protocol), odpswriter block-commit atomicity analog.
        """
        if (
            when_matched_update is None
            and when_matched_delete is None
            and when_not_matched_insert is None
        ):
            raise ValueError("merge_into: at least one clause is required")
        snap = self.snapshot()
        props = snap.properties
        keys: list[str] = props["key_cols"]
        bkey: str = props["bucket_key"]
        nb: int = props["num_buckets"]
        payload = [
            f.name for f in snap.schema.fields if not f.name.startswith("_")
        ]
        types = {f.name: f.dataType for f in snap.schema.fields}
        missing = [k for k in keys if k not in source.columns]
        if missing:
            raise ValueError(f"merge_into: source lacks key columns {missing}")

        def _cond(c):
            if c is None:
                return None
            if c is True:
                return F.lit(True)
            return F.expr(c) if isinstance(c, str) else c

        def _exprs(spec, kind: str):
            if spec is None:
                return None
            if spec == "*":
                cols = (
                    payload
                    if kind == "insert"
                    else [c for c in payload if c not in keys and c != bkey]
                )
                lack = [c for c in cols if c not in source.columns]
                if lack:
                    raise ValueError(
                        f"merge_into: {kind} '*' needs source columns {lack}"
                    )
                return {c: F.col(f"s.{c}") for c in cols}
            out = {}
            for c, e in spec.items():
                if c in keys or c == bkey:
                    raise ValueError(
                        f"merge_into: cannot {kind} key/bucket column {c!r} "
                        "(row identity)"
                    )
                if c not in payload:
                    raise ValueError(
                        f"merge_into: unknown {kind} column {c!r}"
                    )
                out[c] = F.expr(e) if isinstance(e, str) else e
            return out

        upd = _exprs(when_matched_update, "update")
        ins = _exprs(when_not_matched_insert, "insert")
        del_c = _cond(when_matched_delete)
        upd_c = _cond(update_condition)
        if upd is None and upd_c is not None:
            raise ValueError(
                "merge_into: update_condition without when_matched_update"
            )

        src = source.select(
            *[
                F.col(c).cast(types[c]).alias(c) if c in keys else F.col(c)
                for c in source.columns
            ]
        )
        dup = (
            src.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError(
                "merge_into: source has multiple rows per key (the Delta "
                "multiple-source-rows error) — dedup the source first"
            )
        buckets = sorted(
            int(r["b"])
            for r in src.select(
                bucket_expr(bkey, nb, snap_bucket_dtype(snap)).alias("b")
            )
            .distinct()
            .collect()
        )
        if not buckets:  # empty source: nothing to merge, no commit
            return snap
        # INNER join, not the textbook right-outer: an outer join can
        # only hash-broadcast its NON-preserved side, so a small source
        # preserved by a right-outer forces a sort-merge shuffle of the
        # full-width target buckets. Inner joins broadcast EITHER side
        # (AQE picks the source at runtime when it's small), the target
        # streams unshuffled, and the matched frame — bounded by the
        # source size — persists so the three arms don't rescan it. The
        # insert arm then anti-joins the source against the matched KEY
        # set (≤ source rows, broadcastable by construction).
        tgt = self.read(buckets=buckets, version=snap.version).select(*payload)
        m = tgt.alias("t").join(
            src.alias("s"),
            [F.col(f"t.{k}") == F.col(f"s.{k}") for k in keys],
            "inner",
        ).persist()

        def _safe(c):
            return F.coalesce(c, F.lit(False))

        try:
            parts = []
            if del_c is not None:
                parts.append(
                    m.filter(_safe(del_c)).select(
                        *[F.col(f"t.{c}").alias(c) for c in payload],
                        F.lit("delete").alias("op"),
                    )
                )
            if upd is not None:
                keep = ~_safe(del_c) if del_c is not None else F.lit(True)
                if upd_c is not None:
                    keep = keep & _safe(upd_c)
                parts.append(
                    m.filter(keep).select(
                        *[
                            (
                                upd[c].cast(types[c])
                                if c in upd
                                else F.col(f"t.{c}")
                            ).alias(c)
                            for c in payload
                        ],
                        F.lit("update").alias("op"),
                    )
                )
            if ins is not None:
                mkeys = m.select(
                    *[F.col(f"s.{k}").alias(k) for k in keys]
                )
                unmatched = src.alias("s").join(mkeys, on=keys, how="left_anti")
                parts.append(
                    unmatched.select(
                        *[
                            (
                                F.col(f"s.{c}")
                                if c in keys
                                else (
                                    ins[c].cast(types[c])
                                    if c in ins
                                    else F.lit(None).cast(types[c])
                                )
                            ).alias(c)
                            for c in payload
                        ],
                        F.lit("insert").alias("op"),
                    )
                )
            chg = parts[0]
            for p in parts[1:]:
                chg = chg.unionByName(p)
            seq0 = self._merge_seq_base(snap, buckets)
            chg = chg.withColumn("seq", F.lit(seq0 + 1))
            res = self._merge_apply_changes(chg, batch_id=snap.version)
        finally:
            m.unpersist()
        if not res.applied:
            raise CommitConflict(
                "concurrent merge_into fenced this one; retry"
            )
        return self.snapshot(res.version)

    def _overwrite_once(self, filters: list, pred, df: DataFrame) -> Snapshot:
        snap = self.snapshot()
        props = snap.properties
        key, nb = props["bucket_key"], props["num_buckets"]
        plan = self.plan_scan(filters, version=snap.version, prune_files=False)
        new_buckets = {
            int(r["b"])
            for r in df.select(
                bucket_expr(key, nb, snap_bucket_dtype(snap)).alias("b")
            )
            .distinct()
            .collect()
        }
        affected = sorted(set(plan["buckets"]) | new_buckets)
        # NULL-predicate rows do NOT match the overwrite slice and must
        # survive: keep every row where pred is not literally TRUE.
        survivors = self._rewrite_source(snap, affected).filter(
            ~F.coalesce(pred, F.lit(False))
        )
        incoming = _conform_payload(
            df, [f.name for f in snap.schema.fields], snap.schema
        )
        merged = survivors.unionByName(incoming)
        commit_rel = self.write_bucket_data(merged, nb, key)
        return self.commit_replace_buckets(
            snap.version, commit_rel, replaced_buckets=affected
        )

    def rewrite_zordered(
        self,
        cols: list[str],
        target_file_rows: int = 1_000_000,
        buckets: list[int] | None = None,
        max_retries: int = 3,
        bits: int | None = None,
    ) -> Snapshot:
        """Multi-dimensional clustering rewrite (Delta OPTIMIZE ZORDER
        analog): sort each bucket by the Morton interleave of ``cols``'
        rank bits, so manifest file skipping prunes range scans on ANY
        of the columns — where ``rewrite_clustered`` (lexicographic)
        only tightens the leading one. Costs one extra narrow agg job
        for the global column bounds; the z-value itself is pure Column
        arithmetic inside the rewrite projection (lake/zorder.py).
        """
        from datax_spark.lake.zorder import (
            DEFAULT_BITS,
            column_bounds,
            zorder_expr,
        )

        bounds = column_bounds(self.read(buckets=buckets), cols)
        z = zorder_expr(cols, bounds, bits or DEFAULT_BITS)
        return self.rewrite_clustered(
            [z], target_file_rows, buckets, max_retries
        )

    def rebucket(self, new_num_buckets: int, max_retries: int = 3) -> Snapshot:
        """Change the table's bucket count online (Iceberg partition-
        evolution analog for our hash layout).

        ``num_buckets`` is sized at creation so one bucket ~ one
        executor-sized rewrite unit; at 100x data growth that sizing
        goes stale — buckets outgrow executor memory and every MERGE
        straggles on the fattest one. This maintenance op re-hashes the
        FULL resolved state into ``new_num_buckets`` buckets in one
        parallel write + one replace-all commit: readers see the old
        layout until the CAS publishes, writers racing it conflict and
        retry against the new layout (same rules as compact). MOR
        deltas/eq-deletes are folded in resolved (the override keeps
        patch-flag hygiene); per-bucket lineage is re-keyed
        conservatively to the pre-rebucket global max_seq — positions
        are per-OLD-bucket and the new buckets' true maxima are unknown
        without a second scan.

        Future applies read ``num_buckets``/``bucket_expr`` from the new
        snapshot, so the cutover needs no coordination beyond the CAS.
        """
        if new_num_buckets < 1:
            raise ValueError("new_num_buckets must be >= 1")
        for attempt in range(max_retries + 1):
            try:
                return self._rebucket_once(new_num_buckets)
            except CommitConflict:
                if attempt == max_retries:
                    raise
        raise AssertionError("unreachable")

    def _rebucket_once(self, new_num_buckets: int) -> Snapshot:
        snap = self.snapshot()
        props = snap.properties
        old_n = props["num_buckets"]
        all_ids = sorted(
            int(b)
            for b in set(snap.buckets) | set(snap.deltas) | set(snap.eq_deletes)
        )
        df = self._rewrite_source(snap, all_ids)
        commit_rel = self.write_bucket_data(
            df, new_num_buckets, props["bucket_key"]
        )
        max_seq = max(
            (
                int(st["max_seq"])
                for st in snap.lineage.values()
                if isinstance(st, dict) and st.get("max_seq") is not None
            ),
            default=None,
        )
        staged = self._list_staged(self.path, commit_rel)
        lineage_updates = (
            {b: {"max_seq": max_seq, "rebucketed": True} for b in staged}
            if max_seq is not None
            else None
        )
        return self.commit_replace_buckets(
            snap.version,
            commit_rel,
            # cover every old AND new bucket id: old ids beyond the new
            # count are emptied, stale lineage/stats dropped with them
            replaced_buckets=list(range(max(old_n, new_num_buckets))),
            property_updates={"num_buckets": new_num_buckets},
            lineage_updates=lineage_updates,
            replace_lineage=True,
            rewrite_only=True,  # rows unchanged — only the layout moved
        )

    def vacuum(self, keep_last: int = 2, min_age_sec: float = 0.0) -> dict[str, int]:
        """Drop old snapshots and delete data files they alone reference.

        Equivalent of Iceberg ``expire_snapshots`` + ``remove_orphan_files``:
        keeps the newest ``keep_last`` manifests, unions their referenced
        file sets, and removes every data file outside that set (including
        files orphaned by crashed commits that never published). Readers of
        retained snapshots are unaffected — files are immutable and only
        unreferenced ones are removed. Driver-side O(files) metadata work.

        ``min_age_sec``: skip commit dirs younger than this. A CONCURRENT
        in-flight commit's staged files are unreferenced until its
        manifest publishes, so a production vacuum racing live writers
        must set this above the worst-case stage->publish latency (the
        Iceberg ``older_than`` analog); 0 is only safe with writers
        quiesced.
        """
        import time as _time

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        mdir = os.path.join(self.path, MANIFEST_DIR)
        versions = sorted(
            int(n[1:-5]) for n in os.listdir(mdir)
            if n.startswith("v") and n.endswith(".json")
        )
        # tagged versions are pinned: their manifests and referenced
        # files survive vacuum until the tag is deleted (Iceberg refs
        # retention semantics)
        tagged = set(self.tags().values()) & set(versions)
        # versions the exported Iceberg mirror still exposes are pinned
        # the same way — an external Iceberg reader's time travel must
        # not dangle; expire_iceberg is what releases them. Iceberg
        # snapshot ids name MAIN versions only (export refuses
        # branches), so a branch table's version namespace never pins
        from datax_spark.lake.iceberg import iceberg_pinned_versions

        ice_pinned = (
            iceberg_pinned_versions(self.path) & set(versions)
            if self.branch is None
            else set()
        )
        # the Delta mirror pins its HEAD the same way (older Delta
        # versions dangle past lake retention — real Delta VACUUM's own
        # documented contract); clean via a fresh sync_delta + vacuum
        from datax_spark.lake.delta import delta_pinned_versions

        delta_pinned = (
            delta_pinned_versions(self.path) & set(versions)
            if self.branch is None
            else set()
        )
        keep_versions = sorted(
            set(versions[-keep_last:]) | tagged | ice_pinned | delta_pinned
        )
        referenced: set[str] = set()
        kept_snaps: list[Snapshot] = []
        for v in keep_versions:
            kept_snaps.append(self.snapshot(v))
        # live branches pin everything their manifests reference (a
        # branch head may point at data no main snapshot still lists)
        kept_snaps.extend(self._branch_snapshots())
        referenced.update(self._referenced_rels(kept_snaps))
        removed_files = 0
        now = _time.time()
        data_root = os.path.join(self.path, DATA_DIR)
        for commit_dir in sorted(os.listdir(data_root)):
            cpath = os.path.join(data_root, commit_dir)
            if min_age_sec > 0 and now - os.path.getmtime(cpath) < min_age_sec:
                continue
            for root, _dirs, files in os.walk(cpath, topdown=False):
                for f in files:
                    rel = os.path.relpath(os.path.join(root, f), self.path)
                    if rel not in referenced:
                        os.unlink(os.path.join(root, f))
                        removed_files += 1
                if not os.listdir(root):
                    os.rmdir(root)
        removed_snapshots = 0
        for v in versions:
            if v not in keep_versions:
                os.unlink(self._manifest_path(v))
                removed_snapshots += 1
        # sharded-manifest side files: drop refs no kept snapshot points at
        removed_refs = 0
        refs_root = os.path.join(self.path, REFS_DIR)
        if os.path.isdir(refs_root):
            kept_refs: set[str] = set()
            for snap in kept_snaps:
                snap_refs = snap._refs or {}
                for kind_refs in snap_refs.values():
                    kept_refs.update(
                        os.path.basename(r) for r in kind_refs.values()
                    )
            for name in os.listdir(refs_root):
                if name.endswith(".json") and name not in kept_refs:
                    os.unlink(os.path.join(refs_root, name))
                    removed_refs += 1
        return {
            "removed_files": removed_files,
            "removed_snapshots": removed_snapshots,
            "removed_refs": removed_refs,
            "kept_versions": len(keep_versions),
        }

    def _branch_snapshots(
        self, collect_errors: list[str] | None = None
    ) -> list[Snapshot]:
        """Every snapshot of every live branch. With ``collect_errors``
        given, unreadable manifests are recorded there instead of
        raising (fsck wants the inventory; vacuum must not delete on a
        partial view, so it propagates)."""
        out: list[Snapshot] = []
        for bname in self.branches():
            bt = LakeTable(self.spark, self.path, branch=bname)
            for x in os.listdir(bt._mdir):
                if x.startswith("v") and x.endswith(".json"):
                    try:
                        out.append(bt.snapshot(int(x[1:-5])))
                    except Exception as e:
                        if collect_errors is None:
                            raise
                        collect_errors.append(f"{bname}/{x}: {e}")
        return out

    @staticmethod
    def _referenced_rels(snaps: list[Snapshot]) -> set[str]:
        """Union of every data-file relpath the snapshots reference —
        ALL file-bearing manifest sections (base buckets, MOR deltas,
        equality-deletes). The single source of truth shared by vacuum
        (what not to delete) and fsck (what must exist)."""
        refs: set[str] = set()
        for snap in snaps:
            for side in (snap.buckets, snap.deltas, snap.eq_deletes):
                for files in side.values():
                    refs.update(files)
        return refs

    def fsck(self) -> dict[str, Any]:
        """Manifest/storage consistency check — driver-side metadata only,
        zero Spark jobs (the HDFS `fsck` / Iceberg orphan-scan ops tool).

        Verifies, across every RETAINED snapshot on main and all live
        branches:

        - every referenced base/delta/eq-delete file exists on disk and
          is non-empty (``missing``: a truncated copy or external
          deletion — data loss, readers of that version WILL fail);
        - every referenced file's path bucket (``_bucket=N``) matches
          the manifest key that lists it (``misplaced``: a corrupted
          manifest edit — reads would return rows under the wrong
          bucket, breaking bucket pruning);
        - sharded-manifest side refs resolve (a missing ref file throws
          on ``snapshot()`` load; caught and reported as
          ``unreadable_versions``);
        - files on disk no retained snapshot references (``orphans``:
          crashed commits or not-yet-vacuumed history — harmless, but
          they cost storage; ``vacuum`` reclaims them).

        Returns counts plus bounded sample lists. ``ok`` is True iff
        nothing is missing/misplaced/unreadable (orphans don't fail).
        """
        versions = sorted(
            int(n[1:-5])
            for n in os.listdir(os.path.join(self.path, MANIFEST_DIR))
            if n.startswith("v") and n.endswith(".json")
        )
        snaps: list[Snapshot] = []
        unreadable: list[str] = []
        for v in versions:
            try:
                snaps.append(self.snapshot(v))
            except Exception as e:  # missing ref / corrupt JSON
                unreadable.append(f"v{v}: {e}")
        snaps.extend(self._branch_snapshots(collect_errors=unreadable))

        referenced = self._referenced_rels(snaps)
        missing: list[str] = []
        misplaced: list[str] = []
        for snap in snaps:
            for side in (snap.buckets, snap.deltas, snap.eq_deletes):
                for bucket, files in side.items():
                    for rel in files:
                        m = re.search(rf"{BUCKET_COL}=(\d+)/", rel)
                        if m and m.group(1) != str(bucket):
                            misplaced.append(f"{rel} listed under bucket {bucket}")
        for rel in referenced:
            ap = os.path.join(self.path, rel)
            if not os.path.isfile(ap) or os.path.getsize(ap) == 0:
                missing.append(rel)

        orphans: list[str] = []
        data_root = os.path.join(self.path, DATA_DIR)
        if os.path.isdir(data_root):
            for root, _dirs, files in os.walk(data_root):
                for f in files:
                    # Spark commit markers (_SUCCESS) and local-fs .crc
                    # sidecars are never manifest-listed; reporting them
                    # would flag every healthy commit dir as orphaned.
                    if f.startswith(("_", ".")):
                        continue
                    rel = os.path.relpath(os.path.join(root, f), self.path)
                    if rel not in referenced:
                        orphans.append(rel)

        def _cap(xs):  # bounded samples so the report stays printable
            return sorted(set(xs))[:20]

        return {
            "ok": not (missing or misplaced or unreadable),
            "versions_checked": len(snaps),
            "files_referenced": len(referenced),
            "missing": len(set(missing)),
            "misplaced": len(set(misplaced)),
            "orphans": len(orphans),
            "unreadable_versions": len(unreadable),
            "samples": {
                "missing": _cap(missing),
                "misplaced": _cap(misplaced),
                "orphans": _cap(orphans),
                "unreadable": unreadable[:20],
            },
        }
