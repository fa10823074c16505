"""Dialect-aware upsert statement generation (DataX WriterUtil analog).

The reference's rdbms writers build per-dialect upsert SQL from the
column list and writeMode (plugin-rdbms-util/.../writer/WriterUtil.java:
114-199: MySQL ``REPLACE INTO`` / ``INSERT ... ON DUPLICATE KEY UPDATE``,
DB2/generic ``MERGE INTO`` at :125-152). Our native sink is the lake
MERGE, but jobs that target a real RDBMS through ``foreachPartition`` /
JDBC still need the statement — this module generates it, unit-tested,
with the same three writeModes.
"""

from __future__ import annotations


def _cols(columns: list[str]) -> str:
    return ", ".join(columns)


def _placeholders(columns: list[str]) -> str:
    return ", ".join("?" for _ in columns)


def upsert_sql(
    table: str,
    columns: list[str],
    write_mode: str = "insert",
    key_columns: list[str] | None = None,
    dialect: str = "mysql",
) -> str:
    """Build the write statement for (table, columns, writeMode, dialect).

    write_mode: 'insert' -> plain INSERT; 'replace' -> whole-row
    last-write-wins; 'update' -> upsert patching non-key columns.
    Mirrors WriterUtil.getWriteTemplate/doMergeIntoOrReplace.
    """
    base = f"INSERT INTO {table} ({_cols(columns)}) VALUES ({_placeholders(columns)})"
    if write_mode == "insert":
        return base
    if write_mode not in ("replace", "update"):
        raise ValueError(f"unknown writeMode {write_mode!r}")

    if dialect == "mysql":
        if write_mode == "replace":
            return (
                f"REPLACE INTO {table} ({_cols(columns)}) "
                f"VALUES ({_placeholders(columns)})"
            )
        updates = ", ".join(f"{c}=VALUES({c})" for c in columns)
        return f"{base} ON DUPLICATE KEY UPDATE {updates}"

    if dialect == "postgresql":
        keys = key_columns or []
        if not keys:
            raise ValueError("postgresql upsert requires key_columns")
        conflict = ", ".join(keys)
        if write_mode == "replace":
            sets = ", ".join(f"{c}=EXCLUDED.{c}" for c in columns if c not in keys)
        else:
            sets = ", ".join(f"{c}=EXCLUDED.{c}" for c in columns if c not in keys)
        return f"{base} ON CONFLICT ({conflict}) DO UPDATE SET {sets}"

    if dialect in ("db2", "generic"):
        # WriterUtil.java:125-152 MERGE INTO form.
        keys = key_columns or []
        if not keys:
            raise ValueError(f"{dialect} merge requires key_columns")
        on = " AND ".join(f"T.{k} = S.{k}" for k in keys)
        sets = ", ".join(f"T.{c} = S.{c}" for c in columns if c not in keys)
        src_cols = ", ".join(f"? AS {c}" for c in columns)
        ins_cols = _cols(columns)
        ins_vals = ", ".join(f"S.{c}" for c in columns)
        return (
            f"MERGE INTO {table} AS T USING (SELECT {src_cols} FROM SYSIBM.SYSDUMMY1) AS S "
            f"ON ({on}) "
            f"WHEN MATCHED THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
        )

    raise ValueError(f"unsupported dialect {dialect!r}")


def jdbc_write_options(param: dict) -> dict[str, str]:
    """DataX rdbms-writer parameter block -> spark JDBC write options.

    Plain-insert path only (Spark's df.write.jdbc); replace/update modes
    route through ``upsert_sql`` + foreachPartition, or natively through
    the lake MERGE sink (CommonRdbmsWriter.java:176-609 analog).
    """
    return {
        "url": param["jdbcUrl"],
        "dbtable": param["table"],
        "user": param.get("username", ""),
        "password": param.get("password", ""),
        "batchsize": str(param.get("batchSize", 2048)),  # DataX default 2048
        "isolationLevel": param.get("isolationLevel", "READ_UNCOMMITTED"),
        "truncate": str(param.get("writeMode") == "truncate").lower(),
    }
