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
        # replace and update coincide on postgres: EXCLUDED.* is the whole
        # incoming row either way. With no non-key columns there is nothing
        # to SET — fall back to DO NOTHING (the row already exists intact).
        sets = ", ".join(f"{c}=EXCLUDED.{c}" for c in columns if c not in keys)
        if not sets:
            return f"{base} ON CONFLICT ({conflict}) DO NOTHING"
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


def merge_from_staging_sql(
    table: str,
    staging: str,
    columns: list[str],
    write_mode: str = "update",
    key_columns: list[str] | None = None,
    dialect: str = "generic",
) -> str:
    """Set-based upsert: one statement merging a STAGING table into ``table``.

    The scale-correct form of DataX's row-at-a-time upsert
    (CommonRdbmsWriter.java:176-609 executes the WriterUtil statement per
    record batch): Spark writes the batch to a staging table in parallel
    (JVM JDBC, executor-side), then ONE set-based MERGE/upsert applies it
    transactionally — no per-row round trips, no Python in the loop.
    The staging rows must be key-unique (run dedup_latest first); a
    MERGE with duplicate source keys is an error in every dialect.
    """
    cols = _cols(columns)
    if write_mode == "insert":
        return f"INSERT INTO {table} ({cols}) SELECT {cols} FROM {staging}"
    if write_mode not in ("replace", "update"):
        raise ValueError(f"unknown writeMode {write_mode!r}")
    keys = key_columns or []
    if dialect == "mysql":
        if write_mode == "replace":
            return f"REPLACE INTO {table} ({cols}) SELECT {cols} FROM {staging}"
        updates = ", ".join(f"{c}=VALUES({c})" for c in columns)
        return (
            f"INSERT INTO {table} ({cols}) SELECT {cols} FROM {staging} "
            f"ON DUPLICATE KEY UPDATE {updates}"
        )
    if not keys:
        raise ValueError(f"{dialect} staged upsert requires key_columns")
    if dialect == "postgresql":
        conflict = ", ".join(keys)
        sets = ", ".join(f"{c}=EXCLUDED.{c}" for c in columns if c not in keys)
        action = f"DO UPDATE SET {sets}" if sets else "DO NOTHING"
        return (
            f"INSERT INTO {table} ({cols}) SELECT {cols} FROM {staging} "
            f"ON CONFLICT ({conflict}) {action}"
        )
    if dialect in ("db2", "generic", "derby"):
        # ANSI MERGE — runs as-is on Derby >= 10.11 (what the sandbox
        # round-trip test executes), DB2, and Oracle/SQLServer modulo
        # terminators.
        on = " AND ".join(f"T.{k} = S.{k}" for k in keys)
        sets = ", ".join(f"T.{c} = S.{c}" for c in columns if c not in keys)
        ins_vals = ", ".join(f"S.{c}" for c in columns)
        matched = f"WHEN MATCHED THEN UPDATE SET {sets} " if sets else ""
        return (
            f"MERGE INTO {table} T USING {staging} S ON ({on}) "
            f"{matched}"
            f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({ins_vals})"
        )
    raise ValueError(f"unsupported dialect {dialect!r}")


def delete_matching_sql(
    table: str,
    staging: str,
    key_columns: list[str],
    dialect: str = "generic",
) -> str:
    """Set-based key delete: kill every ``table`` row whose key appears
    in ``staging`` (which holds ONLY key columns). The delete half of a
    CDC apply against an RDBMS sink — the reference has no delete
    writeMode (DataX jobs truncate or append); a changelog sink needs
    one, so this is the set-based form of the per-row DELETE a binlog
    applier would issue.
    """
    if not key_columns:
        raise ValueError("delete_matching_sql requires key_columns")
    if dialect == "mysql":
        on = " AND ".join(f"T.{k} = S.{k}" for k in key_columns)
        return f"DELETE T FROM {table} T INNER JOIN {staging} S ON {on}"
    # ANSI correlated EXISTS — Derby/DB2/postgres all accept it
    on = " AND ".join(f"S.{k} = T.{k}" for k in key_columns)
    return (
        f"DELETE FROM {table} T WHERE EXISTS "
        f"(SELECT 1 FROM {staging} S WHERE {on})"
    )


def clone_table_sql(
    table: str, staging: str, columns: list[str], dialect: str = "generic"
) -> str:
    """DDL cloning ``table``'s column types into an empty ``staging``.

    Letting Spark auto-create the staging table maps StringType to the
    dialect's widest type (CLOB on Derby, TEXT on postgres), which both
    bloats the stage and trips Derby's MERGE-with-LOB restriction
    (DERBY-6662-class XSDA8) — cloning from the target keeps the exact
    declared types.
    """
    if dialect == "mysql":
        return f"CREATE TABLE {staging} LIKE {table}"
    cols = _cols(columns)
    return (
        f"CREATE TABLE {staging} AS SELECT {cols} FROM {table} WITH NO DATA"
    )


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
