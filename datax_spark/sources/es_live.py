"""Live Elasticsearch writer over the REAL wire protocol (HTTP + JSON).

Round 4 upgrades elasticsearchwriter from an option-dict builder
(sources/connectors.py, for the es-hadoop connector) to an executable
implementation of the reference's actual write path
(elasticsearchwriter/.../ESWriter.java):

- ``es_create_index``: prepare-phase index lifecycle — ``cleanup=True``
  deletes then recreates with mappings/settings (ESWriter.java:62-80);
- ``es_bulk_write``: executor-parallel batched ``POST /_bulk`` NDJSON
  (action metadata line + source line per doc, exactly the ES bulk
  grammar), ``batch_entries`` docs per request (Key.getBatchSize),
  per-request retry with backoff (Key.getTrySize), and PER-ITEM failure
  accounting — a rejected item is a dirty record counted against the
  error budget, not a job failure (ESWriter.java:403-443);
- ``es_alias_swap``: post-phase ATOMIC alias cutover via
  ``POST /_aliases`` remove+add actions (ESWriter.java:204-208 /
  ESClient.alias with needCleanAlias).

Everything is stdlib ``urllib`` — no ES client library ships here — and
the wire bytes are what a real cluster accepts; tests drive it against
an in-process HTTP fixture implementing the same endpoints
(tests/test_es_live.py), the same way the JDBC family is proven on
embedded Derby.

Scale shape: the bulk posts run INSIDE ``mapInPandas`` — one Arrow
batch in, one (indexed, errors) count row out — so 1000 executors fan
out to the cluster concurrently and the driver sees only O(partitions)
count rows. Document routing/idempotence rides ``_id`` (the column
tagged ``type: "id"`` in the DataX column spec).
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from typing import Any

from pyspark.sql import DataFrame


class EsHttpError(RuntimeError):
    """Transport/protocol-level failure after retries."""


def _http(
    method: str, endpoint: str, path: str, body: Any = None
) -> tuple[int, dict]:
    data = None
    headers = {"Content-Type": "application/json"}
    if body is not None:
        if isinstance(body, (bytes, bytearray)):
            data = bytes(body)
            headers["Content-Type"] = "application/x-ndjson"
        else:
            data = json.dumps(body).encode()
    req = urllib.request.Request(
        endpoint.rstrip("/") + path, data=data, headers=headers, method=method
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            raw = resp.read()
            return resp.status, (json.loads(raw) if raw else {})
    except urllib.error.HTTPError as e:
        raw = e.read()
        try:
            return e.code, json.loads(raw) if raw else {}
        except ValueError:
            return e.code, {"error": raw.decode(errors="replace")}
    except urllib.error.URLError as e:
        raise EsHttpError(f"{method} {path}: {e}") from e


def es_create_index(
    endpoint: str,
    index: str,
    mappings: dict | None = None,
    settings: dict | None = None,
    cleanup: bool = False,
) -> None:
    """Prepare-phase lifecycle: optionally drop, then create (idempotent
    when it already exists and cleanup is False) — ESWriter.java:62-80."""
    if cleanup:
        status, out = _http("DELETE", endpoint, f"/{index}")
        # 404 = already absent (fine); anything else failing the drop
        # must raise — otherwise the subsequent create hits
        # already-exists, succeeds vacuously, and the caller merges new
        # data into the STALE index it believes was rebuilt
        if status >= 300 and status != 404:
            raise EsHttpError(f"cleanup delete {index}: {status} {out}")
    body: dict[str, Any] = {}
    if mappings:
        body["mappings"] = mappings
    if settings:
        body["settings"] = settings
    status, out = _http("PUT", endpoint, f"/{index}", body or None)
    if status >= 300 and "resource_already_exists" not in json.dumps(out):
        raise EsHttpError(f"create index {index}: {status} {out}")


def es_bulk_write(
    df: DataFrame,
    endpoint: str,
    index: str,
    id_cols: list[str] | None = None,
    action: str = "index",
    batch_entries: int = 1000,
    try_size: int = 3,
    retry_sleep_sec: float = 1.0,
    op_col: str | None = None,
) -> dict[str, int]:
    """Executor-parallel bulk indexing. Returns {"indexed": n, "errors": m}.

    ``action``: ``index`` (DataX actionType index / writeMode replace —
    full-doc idempotent put by _id) or ``update`` (doc-as-upsert — the
    actionType update analog). ``id_cols`` compose the ``_id`` (joined
    with ``:``); absent, ES auto-generates ids (at-least-once, like the
    reference without an id-typed column). Item-level rejections count
    as errors (the reference's dirty records); request-level failures
    retry ``try_size`` times then raise.

    ``op_col``: CDC mode — rows whose ``op_col`` is ``'delete'`` emit a
    bulk DELETE action (no source line) instead of an upsert; requires
    ``id_cols``. Delete-of-missing (404) counts as success: deletes are
    idempotent, which is what makes streaming replays safe without a
    fence. The op column never enters the stored document.
    """
    if action not in ("index", "update"):
        raise ValueError(f"unknown bulk action {action!r}")
    if op_col is not None and not id_cols:
        raise ValueError("op_col (CDC deletes) requires id_cols")
    cols = df.columns

    def _batches(it):
        import pandas as pd

        def post(lines: list[bytes]) -> tuple[int, int]:
            body = b"\n".join(lines) + b"\n"
            last: Exception | None = None
            for attempt in range(max(1, try_size)):
                try:
                    status, out = _http("POST", endpoint, "/_bulk", body)
                except EsHttpError as e:
                    last = e
                    time.sleep(retry_sleep_sec * (attempt + 1))
                    continue
                if status >= 300:
                    last = EsHttpError(f"bulk: {status} {out}")
                    time.sleep(retry_sleep_sec * (attempt + 1))
                    continue
                ok = err = 0
                for item in out.get("items", []):
                    kind, r = next(iter(item.items()))
                    st = r.get("status", 500)
                    if st < 300 or (kind == "delete" and st == 404):
                        ok += 1  # idempotent delete: missing doc is done
                    else:
                        err += 1
                return ok, err
            raise last  # type: ignore[misc]

        def clean(v):
            # Arrow->pandas surfaces SQL NULLs as NaN/NaT; json.dumps
            # would emit the bare token NaN (invalid JSON a real ES
            # rejects with a request-level parse error — the stdlib
            # fixture tolerates it, so only this guard keeps the wire
            # format strict)
            if v is None or (isinstance(v, float) and v != v):
                return None
            try:
                import pandas as pd

                if pd.isna(v):
                    return None
            except (TypeError, ValueError):
                pass  # arrays/containers: not a scalar NA probe
            return v

        for pdf in it:
            ok = err = 0
            lines: list[bytes] = []
            pending = 0
            for row in pdf[cols].itertuples(index=False):
                doc = {c: clean(v) for c, v in zip(cols, row)}
                meta: dict[str, Any] = {"_index": index}
                if id_cols:
                    meta["_id"] = ":".join(str(doc[c]) for c in id_cols)
                if op_col is not None and doc.get(op_col) == "delete":
                    lines.append(json.dumps({"delete": meta}).encode())
                    pending += 1
                    if pending >= batch_entries:
                        o, e = post(lines)
                        ok, err = ok + o, err + e
                        lines, pending = [], 0
                    continue
                if op_col is not None:
                    doc = {c: v for c, v in doc.items() if c != op_col}
                if action == "index":
                    lines.append(json.dumps({"index": meta}).encode())
                    lines.append(json.dumps(doc, default=str).encode())
                else:
                    lines.append(json.dumps({"update": meta}).encode())
                    lines.append(
                        json.dumps(
                            {"doc": doc, "doc_as_upsert": True}, default=str
                        ).encode()
                    )
                pending += 1
                if pending >= batch_entries:
                    o, e = post(lines)
                    ok, err = ok + o, err + e
                    lines, pending = [], 0
            if lines:
                o, e = post(lines)
                ok, err = ok + o, err + e
            yield pd.DataFrame({"indexed": [ok], "errors": [err]})

    counts = df.mapInPandas(_batches, "indexed long, errors long")
    from pyspark.sql import functions as F

    row = counts.agg(
        F.sum("indexed").alias("i"), F.sum("errors").alias("e")
    ).first()
    return {"indexed": int(row["i"] or 0), "errors": int(row["e"] or 0)}


def es_alias_swap(
    endpoint: str, alias: str, index: str, clean: bool = False
) -> None:
    """Post-phase ATOMIC alias cutover: one ``POST /_aliases`` with
    remove(old)+add(new) actions — readers of ``alias`` flip between
    consistent indices with no gap (ESClient.alias; clean=True is
    needCleanAlias: drop every other index from the alias)."""
    actions: list[dict[str, Any]] = []
    if clean:
        actions.append({"remove": {"index": "*", "alias": alias}})
    actions.append({"add": {"index": index, "alias": alias}})
    status, out = _http("POST", endpoint, "/_aliases", {"actions": actions})
    if status >= 300:
        raise EsHttpError(f"alias swap {alias}->{index}: {status} {out}")


def run_es_writer(df: DataFrame, param: dict[str, Any]) -> dict[str, int]:
    """The compile_writer entry: DataX elasticsearchwriter parameter
    block -> prepare (cleanup/create) + bulk write + alias post, start
    to finish on the live HTTP protocol."""
    endpoint = param["endpoint"]
    index = param["index"]
    id_cols = [
        c["name"] for c in param.get("column", []) if c.get("type") == "id"
    ] or None
    es_create_index(
        endpoint,
        index,
        mappings=param.get("mappings"),
        settings=param.get("settings"),
        cleanup=bool(param.get("cleanup", False)),
    )
    result = es_bulk_write(
        df,
        endpoint,
        index,
        id_cols=id_cols,
        action="update" if param.get("actionType") == "update" else "index",
        batch_entries=int(param.get("batchSize", 1000)),
        try_size=int(param.get("trySize", 3)),
    )
    alias = param.get("alias")
    if alias:
        es_alias_swap(
            endpoint, alias, index, clean=bool(param.get("needCleanAlias"))
        )
    return result


def tail_to_es(
    spark: SparkSession,
    log_dir: str,
    checkpoint_dir: str,
    schema,
    endpoint: str,
    index: str,
    key_cols: list[str],
    timeout_sec: float = 120.0,
    max_files_per_trigger: int = 1,
    envelope: str | None = None,
    batch_entries: int = 1000,
    quarantine_dir: str | None = None,
):
    """CDC tail -> SEARCH-INDEX materialization: Structured Streaming
    micro-batches of change events keep an ES index in sync with the
    source (the classic binlog-to-search pipeline; DataX users run the
    batch form of this daily).

    Per micro-batch: latest-wins dedup on ``key_cols`` (one image per
    key per batch), then ONE bulk apply — upserts index full docs by the
    composite ``_id``, deletes emit bulk DELETE actions. Replay safety
    needs NO fence here: indexing by _id is an idempotent PUT and
    delete-of-missing counts as done, so a checkpoint-replayed batch
    converges to the same index state (contrast the lake sink, whose
    appends need the batch-id fence). Checkpoint/resume, bounded
    triggers, and the optional envelope parse are the same machinery as
    tail_and_apply — this is just a different sink.
    """
    from datax_spark.operators.dedup import dedup_latest
    from datax_spark.quality.quarantine import append_quarantine, split_dirty
    from datax_spark.streaming.pipeline import tail_and_apply

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        events = batch_df.drop("ts", "batch_file")
        # same dirty taxonomy as the lake sink: null keys / invalid ops /
        # null content never reach the index — and like the lake sink
        # they land in the quarantine log (with ``quarantine_dir``
        # unset they are dropped, which the caller opts into explicitly)
        clean, dirty = split_dirty(
            events,
            key_cols=key_cols,
            content_col="content" if "content" in events.columns else None,
        )
        if quarantine_dir:
            append_quarantine(dirty, quarantine_dir, batch_id)
        deduped = dedup_latest(clean, key_cols)
        es_bulk_write(
            deduped, endpoint, index,
            id_cols=key_cols, op_col="op", batch_entries=batch_entries,
        )

    return tail_and_apply(
        spark,
        table_path="",  # unused: the custom sink replaces the lake apply
        log_dir=log_dir,
        checkpoint_dir=checkpoint_dir,
        schema=schema,
        max_files_per_trigger=max_files_per_trigger,
        timeout_sec=timeout_sec,
        sink=_sink,
        envelope=envelope,
    )
