"""Ground-truth oracles for the CDC apply engine.

Two independent implementations of "replay the change log":

- ``replay_oracle_pandas``: genuinely sequential — a single-threaded dict
  replay in seq order, one event at a time. This is the semantic spec
  (what DataX's 1:1 ordered channel would produce) and shares no code
  path with the engine.
- ``replay_oracle_duckdb``: set-oriented SQL in a different engine
  (DuckDB), used at larger scales where the dict replay is slow.

Both apply the same validity rules as quality/quarantine.py: invalid op,
null key, or null/sentinel content on a non-delete are skipped (they go
to quarantine in the engine, so they must not mutate oracle state).
"""

from __future__ import annotations

import hashlib

import pandas as pd

VALID_OPS = {"insert", "update", "delete"}
NULL_FORMAT = "\\N"


def _is_dirty(row: dict) -> bool:
    if row["op"] not in VALID_OPS:
        return True
    if row["repo"] is None or row["path"] is None or row["commit"] is None:
        return True
    if row["op"] != "delete" and (
        row["content"] is None or row["content"] == NULL_FORMAT
    ):
        return True
    return False


def replay_oracle_pandas(events: pd.DataFrame, extra_payload: list[str] | None = None) -> pd.DataFrame:
    """Sequential replay -> final state DataFrame (repo,path,commit,lang,content,...)."""
    payload = ["lang", "content"] + (extra_payload or [])
    state: dict[tuple, dict] = {}
    ev = events.sort_values("seq", kind="mergesort")
    cols = ["repo", "path", "commit", "op", "seq"] + [
        c for c in payload if c in ev.columns
    ]
    for row in ev[cols].itertuples(index=False):
        d = dict(zip(cols, row))
        # normalize pandas NaN -> None
        for k, v in d.items():
            if isinstance(v, float) and pd.isna(v):
                d[k] = None
        if _is_dirty({**{"content": None}, **d}):
            continue
        key = (d["repo"], d["path"], d["commit"])
        if d["op"] == "delete":
            state.pop(key, None)
        else:
            state[key] = {c: d.get(c) for c in payload}
    rows = [
        {"repo": k[0], "path": k[1], "commit": k[2], **v} for k, v in state.items()
    ]
    out_cols = ["repo", "path", "commit"] + payload
    if not rows:
        return pd.DataFrame(columns=out_cols)
    return pd.DataFrame(rows)[out_cols]


def state_fingerprint(df: pd.DataFrame) -> str:
    """Order-insensitive sha256 over (key, sha256(content)) per row.

    The per-row invariant from BASELINE.json input_hint: content sha256
    equality. Null content hashes to the literal 'null'.
    """
    def h(row) -> str:
        c = row["content"]
        ch = (
            "null"
            if c is None or (isinstance(c, float) and pd.isna(c))
            else hashlib.sha256(str(c).encode()).hexdigest()
        )
        return f"{row['repo']}|{row['path']}|{row['commit']}|{ch}"

    lines = sorted(h(r) for _, r in df.iterrows())
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


def replay_oracle_duckdb(parquet_glob: str) -> pd.DataFrame:
    """Set-oriented replay in DuckDB over the change-log parquet files."""
    import duckdb

    q = f"""
    WITH ev AS (
      SELECT * FROM read_parquet('{parquet_glob}')
      WHERE op IN ('insert','update','delete')
        AND repo IS NOT NULL AND path IS NOT NULL AND "commit" IS NOT NULL
        AND NOT (op <> 'delete' AND (content IS NULL OR content = '\\N'))
    ), latest AS (
      SELECT *, row_number() OVER (
        PARTITION BY repo, path, "commit" ORDER BY seq DESC) AS rn
      FROM ev
    )
    SELECT repo, path, "commit", lang, content
    FROM latest WHERE rn = 1 AND op <> 'delete'
    ORDER BY repo, path, "commit"
    """
    return duckdb.sql(q).df()


def spark_state_fingerprint(df) -> str:
    """Same fingerprint computed distributed (Spark side), for big states.

    Uses sha2 per row then an order-insensitive combine (sum of the first
    16 hex digits as unsigned ints + xor via bit_xor) — collision-safe
    enough for equality testing, computed without collecting rows.
    """
    from pyspark.sql import functions as F

    line = F.concat_ws(
        "|",
        F.col("repo"),
        F.col("path"),
        F.col("commit"),
        F.coalesce(F.sha2(F.col("content"), 256), F.lit("null")),
    )
    hashed = df.select(F.sha2(line, 256).alias("h"))
    agg = hashed.select(
        F.sum(F.conv(F.substring("h", 1, 15), 16, 10).cast("decimal(38,0)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return f"{agg['s']}:{agg['n']}"
