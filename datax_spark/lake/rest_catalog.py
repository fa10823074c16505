"""Apache Iceberg REST catalog — server and client, pure stdlib.

The REST catalog protocol (the public ``rest-catalog-open-api.yaml``
shipped with Apache Iceberg) is how modern engines discover tables and
commit to them: a table is a *pointer* to its current metadata
document, and a commit is an optimistic ``POST`` of ``requirements``
(assertions against the current state) plus ``updates`` (the metadata
mutations), which the SERVER validates and applies atomically —
returning 409 ``CommitFailedException`` when a requirement fails so
the loser reloads and retries. This mirrors DataX's writer-side
failover/idempotence contract (task retry + at-most-once visible
effect, core/.../AbstractTaskPluginCollector semantics) at the catalog
layer, and is the same optimistic-CAS shape as the lake's own
``_commit_loop``.

Implemented endpoint surface (single-part namespaces):

- ``GET  /v1/config``
- ``GET/POST /v1/namespaces``, ``GET /v1/namespaces/{ns}``
- ``GET  /v1/namespaces/{ns}/tables``
- ``POST /v1/namespaces/{ns}/register``       (existing metadata file)
- ``GET/HEAD/DELETE /v1/namespaces/{ns}/tables/{t}``
- ``POST /v1/namespaces/{ns}/tables/{t}``     (CommitTableRequest)

Commit vocabulary: requirements ``assert-create``,
``assert-table-uuid``, ``assert-ref-snapshot-id``,
``assert-current-schema-id``; updates ``assign-uuid``,
``upgrade-format-version``, ``add-schema``, ``set-current-schema``,
``add-snapshot``, ``set-snapshot-ref``, ``remove-snapshots``,
``set-properties``, ``remove-properties``, ``set-location``. Unknown
requirement/update types fail the request loudly (400) — silently
ignoring an assertion would corrupt the optimistic-concurrency
contract. Applied metadata persists as
``metadata/NNNNN-<uuid>.metadata.json`` under the table location (the
convention real REST servers use; the exporter's ``vN`` naming and
``version-hint.text`` stay untouched, so the local HadoopCatalog-style
flow and the REST flow coexist).

v3 row lineage rides the commit: ``add-snapshot`` validates the
snapshot's ``first-row-id`` >= the table's ``next-row-id`` and
advances ``next-row-id`` to ``first-row-id + added-rows`` — the server
enforces id-block disjointness without reading a single manifest.

``sync_iceberg_rest`` is the publisher glue: run the local
``sync_iceberg`` (manifests + vN metadata as before), then register or
commit the delta — new snapshots, schema additions, format upgrades —
through the catalog with ``assert-ref-snapshot-id`` on ``main``, so
concurrent publishers of the same table serialize through the server
exactly like two Iceberg writers.

Auth is an optional static bearer token (401 without it) — the spec's
OAuth dance is out of scope for an in-process fixture server and
unreachable in this sandbox.
"""

from __future__ import annotations

import json
import os
import re
import threading
import time
import urllib.error
import urllib.parse
import urllib.request
import uuid as uuidlib
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any


class CommitConflict(Exception):
    """A commit requirement failed (HTTP 409 CommitFailedException):
    the table moved under the committer — reload and retry."""


class CatalogError(Exception):
    """Any non-retryable catalog error (4xx other than 409)."""


# ---------------------------------------------------------------------------
# requirement / update application (shared by server; pure functions)
# ---------------------------------------------------------------------------


def check_requirements(
    meta: dict | None, requirements: list[dict]
) -> str | None:
    """Return a failure message when any requirement does not hold
    against ``meta`` (None = table does not exist yet), else None.
    Unknown requirement types raise ValueError — never skip an
    assertion the committer asked for."""
    for r in requirements:
        t = r.get("type")
        if t == "assert-create":
            if meta is not None:
                return "assert-create: table already exists"
        elif meta is None:
            return f"{t}: table does not exist"
        elif t == "assert-table-uuid":
            if meta.get("table-uuid") != r.get("uuid"):
                return (
                    f"assert-table-uuid: {meta.get('table-uuid')} != "
                    f"{r.get('uuid')}"
                )
        elif t == "assert-ref-snapshot-id":
            ref = meta.get("refs", {}).get(r.get("ref"))
            want = r.get("snapshot-id")
            if want is None:
                if ref is not None:
                    return f"assert-ref-snapshot-id: ref {r['ref']} exists"
            elif ref is None or ref.get("snapshot-id") != want:
                return (
                    f"assert-ref-snapshot-id: ref {r.get('ref')} is at "
                    f"{ref and ref.get('snapshot-id')}, not {want}"
                )
        elif t == "assert-current-schema-id":
            if meta.get("current-schema-id") != r.get("current-schema-id"):
                return (
                    f"assert-current-schema-id: "
                    f"{meta.get('current-schema-id')} != "
                    f"{r.get('current-schema-id')}"
                )
        else:
            raise ValueError(f"unknown commit requirement type {t!r}")
    return None


def apply_updates(meta: dict | None, updates: list[dict]) -> dict:
    """Apply spec metadata updates to ``meta`` (copied, never mutated).
    Unknown update types raise ValueError."""
    m: dict[str, Any] = dict(meta) if meta else {}
    for u in updates:
        t = u.get("action") or u.get("type")
        if t == "assign-uuid":
            m["table-uuid"] = u["uuid"]
        elif t == "upgrade-format-version":
            new_v = int(u["format-version"])
            if new_v < int(m.get("format-version", 2)):
                raise ValueError(
                    f"cannot downgrade format-version "
                    f"{m.get('format-version')} -> {new_v}"
                )
            m["format-version"] = new_v
            if new_v >= 3:
                m.setdefault("next-row-id", 0)
        elif t == "add-schema":
            schemas = list(m.get("schemas", []))
            schemas.append(u["schema"])
            m["schemas"] = schemas
            if "last-column-id" in u:
                m["last-column-id"] = max(
                    int(u["last-column-id"]),
                    int(m.get("last-column-id", 0)),
                )
        elif t == "set-current-schema":
            sid = int(u["schema-id"])
            if sid == -1:  # spec: -1 = the schema added in this commit
                sid = m["schemas"][-1]["schema-id"]
            if not any(s["schema-id"] == sid for s in m.get("schemas", [])):
                raise ValueError(f"set-current-schema: unknown id {sid}")
            m["current-schema-id"] = sid
        elif t == "add-snapshot":
            s = u["snapshot"]
            snaps = list(m.get("snapshots", []))
            if any(x["snapshot-id"] == s["snapshot-id"] for x in snaps):
                raise ValueError(
                    f"add-snapshot: id {s['snapshot-id']} already present"
                )
            if int(m.get("format-version", 2)) >= 3:
                nri = int(m.get("next-row-id", 0))
                if s.get("first-row-id") is None:
                    raise ValueError(
                        "add-snapshot: v3 snapshot missing first-row-id"
                    )
                if int(s["first-row-id"]) < nri:
                    raise ValueError(
                        f"add-snapshot: first-row-id {s['first-row-id']} "
                        f"< table next-row-id {nri} (row-id blocks must "
                        "not overlap)"
                    )
                m["next-row-id"] = int(s["first-row-id"]) + int(
                    s.get("added-rows", 0)
                )
            snaps.append(s)
            m["snapshots"] = snaps
            m["last-sequence-number"] = max(
                int(s.get("sequence-number", 0)),
                int(m.get("last-sequence-number", 0)),
            )
            m["last-updated-ms"] = int(time.time() * 1000)
        elif t == "set-snapshot-ref":
            name = u["ref-name"]
            sid = int(u["snapshot-id"])
            if not any(
                s["snapshot-id"] == sid for s in m.get("snapshots", [])
            ):
                raise ValueError(
                    f"set-snapshot-ref: unknown snapshot {sid}"
                )
            refs = dict(m.get("refs", {}))
            refs[name] = {
                "snapshot-id": sid,
                "type": u.get("type", "branch"),
            }
            m["refs"] = refs
            if name == "main":
                m["current-snapshot-id"] = sid
                m["snapshot-log"] = list(m.get("snapshot-log", [])) + [
                    {
                        "timestamp-ms": int(time.time() * 1000),
                        "snapshot-id": sid,
                    }
                ]
        elif t == "remove-snapshots":
            drop = set(u["snapshot-ids"])
            m["snapshots"] = [
                s
                for s in m.get("snapshots", [])
                if s["snapshot-id"] not in drop
            ]
            m["snapshot-log"] = [
                e
                for e in m.get("snapshot-log", [])
                if e["snapshot-id"] not in drop
            ]
        elif t == "set-properties":
            props = dict(m.get("properties", {}))
            props.update(u["updates"])
            m["properties"] = props
        elif t == "remove-properties":
            props = dict(m.get("properties", {}))
            for k in u["removals"]:
                props.pop(k, None)
            m["properties"] = props
        elif t == "set-location":
            m["location"] = u["location"]
        else:
            raise ValueError(f"unknown metadata update type {t!r}")
    return m


# ---------------------------------------------------------------------------
# server
# ---------------------------------------------------------------------------


class IcebergRestCatalogServer:
    """In-process REST catalog. Tables are pointers to metadata files
    on the shared filesystem (the warehouse); a successful commit
    persists the new document as
    ``<location>/metadata/NNNNN-<uuid>.metadata.json`` BEFORE the
    pointer swaps, so a crash between the two leaves an orphan file,
    never a dangling pointer. One lock serializes commits — the
    requirement check and the pointer swap are atomic together, which
    is the whole point of the protocol."""

    def __init__(self, token: str | None = None):
        self.token = token
        self._lock = threading.Lock()
        self._namespaces: dict[str, dict] = {}
        # (ns, name) -> {"metadata-location": str, "metadata": dict}
        self._tables: dict[tuple[str, str], dict] = {}
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _reply(self, code: int, body: dict | None = None):
                data = b"" if code == 204 else json.dumps(body or {}).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                if self.command != "HEAD" and data:
                    self.wfile.write(data)

            def _error(self, code: int, typ: str, msg: str):
                self._reply(
                    code,
                    {
                        "error": {
                            "message": msg,
                            "type": typ,
                            "code": code,
                        }
                    },
                )

            def _authed(self) -> bool:
                if outer.token is None:
                    return True
                got = self.headers.get("Authorization", "")
                if got == f"Bearer {outer.token}":
                    return True
                self._error(401, "NotAuthorizedException", "bad token")
                return False

            def _body(self) -> dict:
                n = int(self.headers.get("Content-Length") or 0)
                return json.loads(self.rfile.read(n) or b"{}")

            def do_GET(self):
                if not self._authed():
                    return
                outer._route(self, "GET")

            def do_HEAD(self):
                if not self._authed():
                    return
                outer._route(self, "HEAD")

            def do_POST(self):
                if not self._authed():
                    return
                outer._route(self, "POST")

            def do_DELETE(self):
                if not self._authed():
                    return
                outer._route(self, "DELETE")

        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self._httpd.server_address[1]
        self.url = f"http://127.0.0.1:{self.port}"
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )

    # -- lifecycle
    def start(self) -> "IcebergRestCatalogServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    # -- routing
    _R_TABLES = re.compile(r"^/v1/namespaces/([^/]+)/tables$")
    _R_TABLE = re.compile(r"^/v1/namespaces/([^/]+)/tables/([^/]+)$")
    _R_REGISTER = re.compile(r"^/v1/namespaces/([^/]+)/register$")
    _R_NS = re.compile(r"^/v1/namespaces/([^/]+)$")

    def _route(self, h, method: str) -> None:
        path = urllib.parse.urlparse(h.path).path
        try:
            if path == "/v1/config" and method == "GET":
                h._reply(200, {"defaults": {}, "overrides": {}})
            elif path == "/v1/namespaces" and method == "GET":
                h._reply(
                    200,
                    {"namespaces": [[ns] for ns in sorted(self._namespaces)]},
                )
            elif path == "/v1/namespaces" and method == "POST":
                b = h._body()
                ns = b["namespace"][0]
                with self._lock:
                    if ns in self._namespaces:
                        h._error(
                            409,
                            "AlreadyExistsException",
                            f"namespace {ns} exists",
                        )
                        return
                    self._namespaces[ns] = dict(b.get("properties", {}))
                h._reply(
                    200,
                    {
                        "namespace": [ns],
                        "properties": self._namespaces[ns],
                    },
                )
            elif (m := self._R_NS.match(path)) and method == "GET":
                ns = urllib.parse.unquote(m.group(1))
                if ns not in self._namespaces:
                    h._error(
                        404, "NoSuchNamespaceException", f"{ns} not found"
                    )
                    return
                h._reply(
                    200,
                    {"namespace": [ns], "properties": self._namespaces[ns]},
                )
            elif (m := self._R_TABLES.match(path)) and method == "GET":
                ns = urllib.parse.unquote(m.group(1))
                if ns not in self._namespaces:
                    h._error(
                        404, "NoSuchNamespaceException", f"{ns} not found"
                    )
                    return
                h._reply(
                    200,
                    {
                        "identifiers": [
                            {"namespace": [n], "name": t}
                            for (n, t) in sorted(self._tables)
                            if n == ns
                        ]
                    },
                )
            elif (m := self._R_REGISTER.match(path)) and method == "POST":
                self._register(h, urllib.parse.unquote(m.group(1)))
            elif m := self._R_TABLE.match(path):
                ns = urllib.parse.unquote(m.group(1))
                name = urllib.parse.unquote(m.group(2))
                if method in ("GET", "HEAD"):
                    self._load(h, ns, name, method)
                elif method == "POST":
                    self._commit(h, ns, name)
                elif method == "DELETE":
                    with self._lock:
                        if (ns, name) not in self._tables:
                            h._error(
                                404,
                                "NoSuchTableException",
                                f"{ns}.{name} not found",
                            )
                            return
                        del self._tables[(ns, name)]
                    h._reply(204)
            else:
                h._error(404, "NotFoundException", f"no route {path}")
        except (KeyError, ValueError, TypeError) as e:
            h._error(400, "BadRequestException", str(e))
        except OSError as e:
            # e.g. _register opening a client-supplied metadata-location
            # that doesn't exist: a clean 400, never a dead handler
            # thread + connection abort (ADVICE r4)
            h._error(400, "BadRequestException", str(e))

    def _register(self, h, ns: str) -> None:
        b = h._body()
        name, loc = b["name"], b["metadata-location"]
        with open(loc) as f:
            meta = json.load(f)
        with self._lock:
            if ns not in self._namespaces:
                h._error(404, "NoSuchNamespaceException", f"{ns} not found")
                return
            if (ns, name) in self._tables:
                h._error(
                    409,
                    "AlreadyExistsException",
                    f"table {ns}.{name} already registered",
                )
                return
            self._tables[(ns, name)] = {
                "metadata-location": loc,
                "metadata": meta,
            }
        h._reply(200, {"metadata-location": loc, "metadata": meta})

    def _load(self, h, ns: str, name: str, method: str) -> None:
        t = self._tables.get((ns, name))
        if t is None:
            h._error(404, "NoSuchTableException", f"{ns}.{name} not found")
            return
        h._reply(
            200,
            {
                "metadata-location": t["metadata-location"],
                "metadata": t["metadata"],
                "config": {},
            },
        )

    def _commit(self, h, ns: str, name: str) -> None:
        b = h._body()
        with self._lock:
            entry = self._tables.get((ns, name))
            meta = entry["metadata"] if entry else None
            fail = check_requirements(meta, b.get("requirements", []))
            if fail is not None:
                h._error(409, "CommitFailedException", fail)
                return
            new_meta = apply_updates(meta, b.get("updates", []))
            # persist BEFORE the pointer swap
            loc = new_meta.get("location")
            if not loc:
                raise ValueError("metadata has no location")
            mdir = os.path.join(loc, "metadata")
            os.makedirs(mdir, exist_ok=True)
            n = len(new_meta.get("metadata-log", [])) + len(
                new_meta.get("snapshots", [])
            )
            fname = f"{n:05d}-{uuidlib.uuid4().hex}.metadata.json"
            fpath = os.path.join(mdir, fname)
            tmp = f"{fpath}.tmp-{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(new_meta, f, indent=1, sort_keys=True)
            os.replace(tmp, fpath)
            self._tables[(ns, name)] = {
                "metadata-location": fpath,
                "metadata": new_meta,
            }
        h._reply(200, {"metadata-location": fpath, "metadata": new_meta})


# ---------------------------------------------------------------------------
# client
# ---------------------------------------------------------------------------


class RestCatalog:
    """Minimal Iceberg REST catalog client (urllib)."""

    def __init__(self, url: str, token: str | None = None):
        self.url = url.rstrip("/")
        self.token = token

    def _call(
        self,
        method: str,
        path: str,
        body: dict | None = None,
    ) -> dict:
        req = urllib.request.Request(
            f"{self.url}{path}",
            method=method,
            data=json.dumps(body).encode() if body is not None else None,
            headers={
                "Content-Type": "application/json",
                **(
                    {"Authorization": f"Bearer {self.token}"}
                    if self.token
                    else {}
                ),
            },
        )
        try:
            with urllib.request.urlopen(req) as resp:
                data = resp.read()
                return json.loads(data) if data else {}
        except urllib.error.HTTPError as e:
            try:
                err = json.loads(e.read()).get("error", {})
            except Exception:
                err = {}
            msg = f"{err.get('type', 'HTTPError')}: {err.get('message', e)}"
            if e.code == 409 and err.get("type") == "CommitFailedException":
                raise CommitConflict(msg) from None
            raise CatalogError(f"{e.code} {msg}") from None

    def config(self) -> dict:
        return self._call("GET", "/v1/config")

    def create_namespace(self, ns: str, properties: dict | None = None):
        return self._call(
            "POST",
            "/v1/namespaces",
            {"namespace": [ns], "properties": properties or {}},
        )

    def list_namespaces(self) -> list[str]:
        return [
            n[0] for n in self._call("GET", "/v1/namespaces")["namespaces"]
        ]

    def list_tables(self, ns: str) -> list[str]:
        out = self._call(
            "GET", f"/v1/namespaces/{urllib.parse.quote(ns)}/tables"
        )
        return [i["name"] for i in out["identifiers"]]

    def table_exists(self, ns: str, name: str) -> bool:
        try:
            self.load_table(ns, name)
            return True
        except CatalogError as e:
            if str(e).startswith("404"):
                return False
            raise

    def register_table(self, ns: str, name: str, metadata_location: str):
        return self._call(
            "POST",
            f"/v1/namespaces/{urllib.parse.quote(ns)}/register",
            {"name": name, "metadata-location": metadata_location},
        )

    def load_table(self, ns: str, name: str) -> dict:
        return self._call(
            "GET",
            f"/v1/namespaces/{urllib.parse.quote(ns)}/tables/"
            f"{urllib.parse.quote(name)}",
        )

    def commit_table(
        self,
        ns: str,
        name: str,
        requirements: list[dict],
        updates: list[dict],
    ) -> dict:
        return self._call(
            "POST",
            f"/v1/namespaces/{urllib.parse.quote(ns)}/tables/"
            f"{urllib.parse.quote(name)}",
            {
                "identifier": {"namespace": [ns], "name": name},
                "requirements": requirements,
                "updates": updates,
            },
        )

    def drop_table(self, ns: str, name: str):
        return self._call(
            "DELETE",
            f"/v1/namespaces/{urllib.parse.quote(ns)}/tables/"
            f"{urllib.parse.quote(name)}",
        )


# ---------------------------------------------------------------------------
# publisher glue
# ---------------------------------------------------------------------------


def catalog_commit_updates(cat_meta: dict, local_meta: dict) -> list[dict]:
    """The spec updates that carry the catalog's metadata forward to the
    locally exported document: format upgrade, new schemas, new
    snapshots (in sequence order), the main-ref move, and property
    changes. Empty when already caught up.

    Update ORDER is load-bearing when the catalog lags across the
    v2->v3 boundary (missed pre-upgrade snapshots, e.g. interleaved
    local-only syncs): v2-era snapshots carry no ``first-row-id``, and
    a server already upgraded to v3 rejects them as a non-retryable
    400. The format upgrade therefore lands AFTER the add-snapshot
    updates for snapshots lacking ``first-row-id`` and before those
    carrying one (ADVICE r4) — sound because first-row-id assignment is
    monotone with sequence number (row lineage starts at the upgrade
    and never un-assigns)."""
    updates: list[dict] = []
    upgrade = None
    if int(local_meta["format-version"]) > int(
        cat_meta.get("format-version", 2)
    ):
        upgrade = {
            "action": "upgrade-format-version",
            "format-version": local_meta["format-version"],
        }
    have_schemas = {s["schema-id"] for s in cat_meta.get("schemas", [])}
    for s in local_meta["schemas"]:
        if s["schema-id"] not in have_schemas:
            updates.append(
                {
                    "action": "add-schema",
                    "schema": s,
                    "last-column-id": local_meta["last-column-id"],
                }
            )
    if local_meta["current-schema-id"] != cat_meta.get("current-schema-id"):
        updates.append(
            {
                "action": "set-current-schema",
                "schema-id": local_meta["current-schema-id"],
            }
        )
    have_snaps = {
        s["snapshot-id"] for s in cat_meta.get("snapshots", [])
    }
    local_snaps = {s["snapshot-id"] for s in local_meta["snapshots"]}
    expired = sorted(have_snaps - local_snaps)
    if expired:
        # a local expire_iceberg shrank the document — mirror the
        # removal or the catalog would advertise snapshots whose
        # manifest files are gone
        updates.append(
            {"action": "remove-snapshots", "snapshot-ids": expired}
        )
    new_snaps = sorted(
        (
            s
            for s in local_meta["snapshots"]
            if s["snapshot-id"] not in have_snaps
        ),
        key=lambda s: s["sequence-number"],
    )
    for s in new_snaps:
        if upgrade is not None and s.get("first-row-id") is not None:
            updates.append(upgrade)
            upgrade = None
        updates.append({"action": "add-snapshot", "snapshot": s})
    if upgrade is not None:
        updates.append(upgrade)
    if new_snaps and local_meta.get("current-snapshot-id") is not None:
        updates.append(
            {
                "action": "set-snapshot-ref",
                "ref-name": "main",
                "snapshot-id": local_meta["current-snapshot-id"],
                "type": "branch",
            }
        )
    if local_meta.get("properties", {}) != cat_meta.get("properties", {}):
        updates.append(
            {
                "action": "set-properties",
                "updates": local_meta.get("properties", {}),
            }
        )
    return updates


def sync_iceberg_rest(
    table,
    catalog: RestCatalog,
    namespace: str,
    name: str,
    delete_files: str = "eq",
    max_retries: int = 3,
) -> str | None:
    """Publish the table's current lake version through the REST
    catalog: run the local ``sync_iceberg`` (manifests + metadata on
    the shared filesystem, exactly as before), then REGISTER the table
    on first contact or COMMIT the delta — new snapshots, schema
    additions, format upgrades — under ``assert-table-uuid`` +
    ``assert-ref-snapshot-id(main)``. A 409 reloads the catalog state
    and retries with a recomputed delta, so concurrent publishers of
    the same table serialize through the server (the loser's rebase is
    usually empty — its snapshots arrived with the winner's commit).
    Safe as an ``on_commit`` hook. Returns the catalog's new
    metadata-location, or None when already caught up / the state is
    transiently unexportable."""
    from datax_spark.lake.iceberg import (
        _current_metadata_version,
        _load_metadata,
        sync_iceberg,
    )

    sync_iceberg(table, delete_files=delete_files)
    location = os.path.abspath(table.path)
    v = _current_metadata_version(location)
    if not v:
        return None  # nothing exportable yet
    local_meta = _load_metadata(location, v)
    if not catalog.table_exists(namespace, name):
        if namespace not in catalog.list_namespaces():
            try:
                catalog.create_namespace(namespace)
            except CatalogError as e:  # concurrent first contact
                if "409" not in str(e):
                    raise
        meta_path = os.path.join(
            location, "metadata", f"v{v}.metadata.json"
        )
        try:
            return catalog.register_table(namespace, name, meta_path)[
                "metadata-location"
            ]
        except CatalogError as e:
            if "409" not in str(e):
                raise
            # someone else registered between exists-check and register:
            # fall through to the commit path below
    for _ in range(max_retries):
        loaded = catalog.load_table(namespace, name)
        cat_meta = loaded["metadata"]
        if cat_meta.get("table-uuid") != local_meta.get("table-uuid"):
            raise CatalogError(
                f"{namespace}.{name} in the catalog is a different table "
                f"(uuid {cat_meta.get('table-uuid')} != "
                f"{local_meta.get('table-uuid')})"
            )
        updates = catalog_commit_updates(cat_meta, local_meta)
        if not updates:
            return None  # caught up (possibly by a concurrent publisher)
        requirements = [
            {
                "type": "assert-table-uuid",
                "uuid": local_meta["table-uuid"],
            },
            {
                "type": "assert-ref-snapshot-id",
                "ref": "main",
                "snapshot-id": cat_meta.get("current-snapshot-id"),
            },
        ]
        try:
            return catalog.commit_table(
                namespace, name, requirements, updates
            )["metadata-location"]
        except CommitConflict:
            continue  # reload + recompute the delta
    raise CommitConflict(
        f"lost the commit race {max_retries} times for {namespace}.{name}"
    )


def read_iceberg_catalog(
    spark, catalog: RestCatalog, namespace: str, name: str,
    snapshot_id: int | None = None,
):
    """Read a table THROUGH the catalog: ``loadTable`` supplies the
    metadata document (no version-hint file involved — the pointer the
    rest of the world sees), and the existing metadata-only reader does
    the scan, deletes, DVs and time travel."""
    from datax_spark.lake.iceberg import read_iceberg

    loaded = catalog.load_table(namespace, name)
    meta = loaded["metadata"]
    return read_iceberg(
        spark, meta["location"], snapshot_id=snapshot_id, metadata=meta
    )
