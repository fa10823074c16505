"""Live Phoenix (hbase11xsqlwriter) over the Avatica JSON wire protocol.

The reference writes through the Phoenix THICK JDBC driver — UPSERT
INTO with prepared-statement parameters, autoCommit(false), batch
commit with a row-by-row retry that routes failing rows to dirty
(hbase11xsqlwriter/.../HbaseSQLWriterTask.java:80-150), nullMode
skip|empty (:286-302), and a truncate option. The thick driver needs
the HBase/ZK jars; the PUBLIC HTTP surface of the same store is the
Phoenix Query Server speaking Avatica's documented JSON protocol —
the same substitution the REST gateway makes for the plain HBase
writer. This client implements the Avatica requests the task needs
(openConnection / connectionSync autoCommit=false / prepare /
executeBatch / execute / commit / rollback / close*) over stdlib
urllib; tests drive an in-process fixture implementing the same JSON
grammar with a failing-row mode that exercises the batch->single
fallback exactly like the reference's doBatchUpsert/doSingleUpsert.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request
import uuid
from typing import Any

from pyspark.sql import DataFrame


class AvaticaError(RuntimeError):
    def __init__(self, message: str):
        super().__init__(message)
        self.message = message


class AvaticaClient:
    """Minimal Avatica JSON client (POST one request object per call)."""

    def __init__(self, url: str, timeout: float = 60.0):
        self.url = url.rstrip("/")
        self.timeout = timeout
        self.connection_id = str(uuid.uuid4())
        self._next_stmt = 0

    def _call(self, payload: dict) -> dict:
        req = urllib.request.Request(
            self.url, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                resp = json.loads(r.read())
        except urllib.error.HTTPError as e:
            try:
                resp = json.loads(e.read())
            except ValueError:
                raise AvaticaError(f"HTTP{e.code}") from None
        if resp.get("response") == "error":
            raise AvaticaError(resp.get("errorMessage", "unknown"))
        return resp

    def open(self, auto_commit: bool = False) -> None:
        self._call({"request": "openConnection",
                    "connectionId": self.connection_id})
        # the task runs autoCommit(false) + explicit commit per batch
        # (HbaseSQLWriterTask.prepare:83)
        self._call({"request": "connectionSync",
                    "connectionId": self.connection_id,
                    "connProps": {"autoCommit": auto_commit,
                                  "props": {}}})

    def prepare(self, sql: str) -> int:
        resp = self._call({"request": "prepare",
                           "connectionId": self.connection_id,
                           "sql": sql, "maxRowCount": -1})
        return resp["statement"]["id"]

    def execute_batch(self, statement_id: int,
                      rows: list[list[dict]]) -> list[int]:
        resp = self._call({"request": "executeBatch",
                           "connectionId": self.connection_id,
                           "statementId": statement_id,
                           "parameterValues": rows})
        return resp.get("updateCounts", [])

    def execute_sql(self, sql: str) -> None:
        self._next_stmt += 1
        self._call({"request": "prepareAndExecute",
                    "connectionId": self.connection_id,
                    "statementId": 1_000_000 + self._next_stmt,
                    "sql": sql, "maxRowCount": -1})

    def commit(self) -> None:
        self._call({"request": "commit",
                    "connectionId": self.connection_id})

    def rollback(self) -> None:
        self._call({"request": "rollback",
                    "connectionId": self.connection_id})

    def close_statement(self, statement_id: int) -> None:
        self._call({"request": "closeStatement",
                    "connectionId": self.connection_id,
                    "statementId": statement_id})

    def close(self) -> None:
        try:
            self._call({"request": "closeConnection",
                        "connectionId": self.connection_id})
        except (AvaticaError, OSError):
            pass


def _typed(v: Any) -> dict:
    """Python value -> Avatica TypedValue."""
    if v is None:
        return {"type": "NULL", "value": None}
    if isinstance(v, bool):
        return {"type": "BOOLEAN", "value": v}
    if isinstance(v, int):
        return {"type": "LONG", "value": v}
    if isinstance(v, float):
        return {"type": "DOUBLE", "value": v}
    return {"type": "STRING", "value": str(v)}


def upsert_sql_template(table: str, columns: list[str]) -> str:
    """The reference's generated statement, double-quoted identifiers to
    preserve case (HbaseSQLWriterTask.createPreparedStatement:172-183)."""
    cols = ",".join(f'"{c}"' for c in columns)
    marks = ",".join("?" * len(columns))
    return f'upsert into "{table}" ({cols} ) values ({marks})'


def phoenix_write(
    df: DataFrame,
    query_server: str,
    table: str,
    columns: list[str] | None = None,
    batch_size: int = 256,
    null_mode: str = "skip",
    truncate: bool = False,
) -> dict[str, int]:
    """Executor-parallel UPSERT through the query server: per partition
    one connection + one prepared statement, ``batch_size`` rows per
    executeBatch+commit; a failed batch rolls back and retries ROW BY
    ROW, collecting failing rows as dirty — doBatchUpsert/doSingleUpsert
    verbatim. nullMode: ``skip`` binds NULL (Phoenix leaves the cell
    absent), ``empty`` binds '' / 0 (getColumnByte's empty arm).
    Returns {"written", "errors"}."""
    if null_mode not in ("skip", "empty"):
        raise ValueError(f"nullMode must be skip|empty, got {null_mode!r}")
    cols = columns or df.columns
    sql = upsert_sql_template(table, cols)
    if truncate:
        cl = AvaticaClient(query_server)
        cl.open(auto_commit=True)
        cl.execute_sql(f'delete from "{table}"')
        cl.close()

    def _bind(v):
        if v is None or (isinstance(v, float) and v != v):
            if null_mode == "skip":
                return _typed(None)
            return {"type": "STRING", "value": ""}
        return _typed(v.item() if hasattr(v, "item") else v)

    def _batches(it):
        import pandas as pd

        cl = AvaticaClient(query_server)
        cl.open(auto_commit=False)
        stmt = cl.prepare(sql)
        written = errors = 0

        def flush(rows):
            nonlocal written, errors
            if not rows:
                return
            try:
                cl.execute_batch(stmt, rows)
                cl.commit()
                written += len(rows)
            except AvaticaError:
                # batch failed: rollback, then row-by-row to isolate the
                # dirty rows (HbaseSQLWriterTask.java:115-150)
                cl.rollback()
                for row in rows:
                    try:
                        cl.execute_batch(stmt, [row])
                        cl.commit()
                        written += 1
                    except AvaticaError:
                        cl.rollback()
                        errors += 1

        for pdf in it:
            batch: list[list[dict]] = []
            for rec in pdf[list(cols)].itertuples(index=False):
                batch.append([_bind(v) for v in rec])
                if len(batch) >= batch_size:
                    flush(batch)
                    batch = []
            flush(batch)
        cl.close_statement(stmt)
        cl.close()
        yield pd.DataFrame({"written": [written], "errors": [errors]})

    out = df.mapInPandas(_batches, "written long, errors long") \
        .groupBy().sum()
    row = out.collect()[0]
    return {"written": int(row[0] or 0), "errors": int(row[1] or 0)}
