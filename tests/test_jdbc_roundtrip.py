"""LIVE rdbms path: Derby (embedded, ships in Spark's jars) round trips.

Executes what plans/job.py previously only spec-compiled: partitioned
JDBC reads (incl. the ``pk IS NULL`` residual slice DataX adds and Spark
drops), driver-side preSql/postSql, the staged set-based upsert for all
three writeModes, and the dry-run preCheck.

Reference parity: CommonRdbmsReader.java:42-353 (read),
CommonRdbmsWriter.java:88-169 (pre/postSql) + 176-609 (write modes),
SingleTableSplitUtil.java:109-121 (NULL slice), preCheck:61-98 (dryRun).

NB: Derby uppercases unquoted identifiers while Spark's JDBC writer
quotes column names — tables/columns here are uppercase so the unquoted
DataX-style merge SQL resolves against the Spark-created staging table.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datax_spark.operators.dedup import dedup_latest
from datax_spark.operators.upsert_sql import merge_from_staging_sql
from datax_spark.plans.job import compile_reader
from datax_spark.sources.jdbc import (
    jdbc_execute,
    jdbc_query,
    jdbc_read_partitioned,
    jdbc_upsert,
    pk_range_predicates,
    pre_check,
    quantile_split_predicates,
    split_pk_bounds,
)


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "db"
    return f"jdbc:derby:{db};create=true"


@pytest.fixture(scope="module")
def src_table(spark, derby_url):
    """DX_SRC: 100 rows with an int split column, 3 of them NULL."""
    jdbc_execute(
        spark,
        derby_url,
        [
            "CREATE TABLE DX_SRC (ID INT NOT NULL PRIMARY KEY, "
            "SPLIT_COL INT, NAME VARCHAR(32))"
        ],
    )
    rows = [
        f"INSERT INTO DX_SRC VALUES ({i}, "
        f"{'NULL' if i % 33 == 0 else i * 7 % 100}, 'name_{i}')"
        for i in range(1, 101)
    ]
    jdbc_execute(spark, derby_url, rows)
    return "DX_SRC"


def test_jdbc_connect_and_query(spark, derby_url, src_table):
    assert jdbc_query(spark, derby_url, "SELECT COUNT(*) FROM DX_SRC") == [(100,)]


def test_split_pk_bounds_probe(spark, derby_url, src_table):
    mn, mx = split_pk_bounds(spark, derby_url, "DX_SRC", "SPLIT_COL")
    assert mn == 0 and mx == 99


def test_partitioned_read_with_null_slice(spark, derby_url, src_table):
    """The DataX-parity predicate split carries NULL-pk rows in a
    DEDICATED slice (SingleTableSplitUtil.java:109-121); Spark's native
    range split folds them into the first partition ('OR col IS NULL') —
    no loss either way, but the dedicated slice isolates NULL-heavy skew."""
    mn, mx = split_pk_bounds(spark, derby_url, "DX_SRC", "SPLIT_COL")
    preds = pk_range_predicates("SPLIT_COL", mn, mx, 4, include_null_slice=True)
    assert len(preds) == 5 and preds[-1] == "SPLIT_COL IS NULL"
    df = jdbc_read_partitioned(spark, derby_url, "DX_SRC", preds)
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 100  # the 3 NULL split_col rows included
    assert df.filter("SPLIT_COL IS NULL").count() == 3
    # the NULL rows land in exactly the residual slice
    null_slice = jdbc_read_partitioned(spark, derby_url, "DX_SRC", [preds[-1]])
    assert null_slice.count() == 3


def test_compile_reader_executes_jdbc(spark, derby_url, src_table):
    """The job-spec jdbc reader path against a live database."""
    df = compile_reader(
        spark,
        {
            "name": "derbyreader",
            "parameter": {
                "jdbcUrl": derby_url,
                "table": "DX_SRC",
                "column": ["ID", "NAME"],
                "where": "ID <= 50",
                "splitPk": "ID",
                "numPartitions": 4,
                "lowerBound": 1,
                "upperBound": 51,
            },
        },
    )
    assert df.count() == 50
    assert [f.upper() for f in df.columns] == ["ID", "NAME"]
    assert df.rdd.getNumPartitions() == 4


def test_quantile_split_predicates(spark, derby_url, src_table):
    full = jdbc_read_partitioned(spark, derby_url, "DX_SRC", ["1=1"])
    preds = quantile_split_predicates(full, "ID", 4, include_null_slice=False)
    assert len(preds) == 4
    df = jdbc_read_partitioned(spark, derby_url, "DX_SRC", preds)
    assert df.count() == 100
    # balanced: no slice more than 2x the even share
    sizes = [
        jdbc_read_partitioned(spark, derby_url, "DX_SRC", [p]).count()
        for p in preds
    ]
    assert sum(sizes) == 100 and max(sizes) <= 50


def test_staged_upsert_roundtrip(spark, derby_url):
    """insert -> update(MERGE) -> verify final state; fenced by key."""
    jdbc_execute(
        spark,
        derby_url,
        ["CREATE TABLE DX_TGT (K INT NOT NULL PRIMARY KEY, V VARCHAR(32))"],
    )
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(1, 21)], ["K", "V"]
    )
    jdbc_upsert(
        base, derby_url, "DX_TGT", ["K", "V"], ["K"],
        write_mode="insert", dialect="derby",
    )
    assert jdbc_query(spark, derby_url, "SELECT COUNT(*) FROM DX_TGT") == [(20,)]

    # change batch: updates 1-10, inserts 21-25; duplicate events per key
    # resolved by dedup_latest before the staged merge
    events = spark.createDataFrame(
        [(i, f"old{i}", 1) for i in range(1, 11)]
        + [(i, f"new{i}", 2) for i in range(1, 11)]
        + [(i, f"new{i}", 1) for i in range(21, 26)],
        ["K", "V", "SEQ"],
    )
    latest = dedup_latest(events, ["K"], "SEQ").drop("SEQ")
    stmt = jdbc_upsert(
        latest, derby_url, "DX_TGT", ["K", "V"], ["K"],
        write_mode="update", dialect="derby",
    )
    assert "MERGE INTO DX_TGT" in stmt
    rows = dict(jdbc_query(spark, derby_url, "SELECT K, V FROM DX_TGT"))
    assert len(rows) == 25
    assert rows[5] == "new5" and rows[15] == "v15" and rows[23] == "new23"
    # staging table dropped
    stages = jdbc_query(
        spark, derby_url,
        "SELECT COUNT(*) FROM SYS.SYSTABLES WHERE TABLENAME LIKE 'DX_TGT_DX_STAGE%'",
    )
    assert stages == [(0,)]


def test_upsert_pre_post_sql(spark, derby_url):
    jdbc_execute(
        spark, derby_url,
        ["CREATE TABLE DX_TGT2 (K INT NOT NULL PRIMARY KEY, V VARCHAR(8))",
         "INSERT INTO DX_TGT2 VALUES (99, 'stale')"],
    )
    df = spark.createDataFrame([(1, "a")], ["K", "V"])
    jdbc_upsert(
        df, derby_url, "DX_TGT2", ["K", "V"], ["K"],
        write_mode="update", dialect="derby",
        pre_sql=["DELETE FROM DX_TGT2"],  # the classic truncate-first preSql
        post_sql=["INSERT INTO DX_TGT2 VALUES (100, 'post')"],
    )
    rows = dict(jdbc_query(spark, derby_url, "SELECT K, V FROM DX_TGT2"))
    assert rows == {1: "a", 100: "post"}


def test_pre_check_dry_run(spark, derby_url, src_table):
    ok = pre_check(
        spark, derby_url, table="DX_SRC", split_pk="SPLIT_COL",
        pre_sql=["DELETE FROM DX_SRC WHERE 1=0"],
    )
    assert ok["ok"] and all(c["ok"] for c in ok["checks"])
    # no data moved, nothing executed: source still intact
    assert jdbc_query(spark, derby_url, "SELECT COUNT(*) FROM DX_SRC") == [(100,)]

    bad = pre_check(spark, derby_url, table="NO_SUCH_TABLE")
    assert not bad["ok"]
    assert any(not c["ok"] and c["name"] == "query" for c in bad["checks"])


def test_merge_sql_shapes():
    m = merge_from_staging_sql("T", "S", ["K", "V"], "update", ["K"], "mysql")
    assert "ON DUPLICATE KEY UPDATE" in m
    m = merge_from_staging_sql("T", "S", ["K", "V"], "replace", ["K"], "mysql")
    assert m.startswith("REPLACE INTO")
    m = merge_from_staging_sql("T", "S", ["K", "V"], "update", ["K"], "postgresql")
    assert "ON CONFLICT (K) DO UPDATE SET V=EXCLUDED.V" in m
    m = merge_from_staging_sql("T", "S", ["K"], "update", ["K"], "postgresql")
    assert m.endswith("DO NOTHING")
    m = merge_from_staging_sql("T", "S", ["K", "V"], "insert", ["K"], "derby")
    assert m == "INSERT INTO T (K, V) SELECT K, V FROM S"


def test_full_jobspec_jdbc_to_jdbc(spark, derby_url, src_table):
    """A complete DataX-style job.json: jdbc reader -> transformer chain
    -> jdbc upsert writer, executed live on Derby via run_job (the
    compile_writer jdbc branch incl. preSql/postSql)."""
    from datax_spark.plans.job import run_job

    jdbc_execute(
        spark, derby_url,
        ["CREATE TABLE DX_JOB_TGT (ID INT NOT NULL PRIMARY KEY, "
         "NAME VARCHAR(40))"],
    )
    job = {
        "job": {
            "setting": {"speed": {"channel": 2}},
            "content": [{
                "reader": {
                    "name": "derbyreader",
                    "parameter": {
                        "jdbcUrl": derby_url,
                        "table": "DX_SRC",
                        "column": ["ID", "NAME"],
                        "where": "ID <= 30",
                    },
                },
                "writer": {
                    "name": "derbywriter",
                    "parameter": {
                        "jdbcUrl": derby_url,
                        "table": "DX_JOB_TGT",
                        "column": ["ID", "NAME"],
                        "keyColumns": ["ID"],
                        "writeMode": "update",
                        "dialect": "derby",
                        "preSql": ["DELETE FROM DX_JOB_TGT"],
                        "postSql": [
                            "INSERT INTO DX_JOB_TGT VALUES (999, 'post-marker')"
                        ],
                    },
                },
            }],
        }
    }
    stmt = run_job(spark, job)
    assert "MERGE INTO DX_JOB_TGT" in stmt
    rows = dict(jdbc_query(spark, derby_url, "SELECT ID, NAME FROM DX_JOB_TGT"))
    assert len(rows) == 31 and rows[999] == "post-marker"
    assert rows[7] == "name_7"

    # run again (idempotent upsert path: preSql truncates, merge reloads)
    run_job(spark, job)
    rows = dict(jdbc_query(spark, derby_url, "SELECT ID, NAME FROM DX_JOB_TGT"))
    assert len(rows) == 31

    # dry-run of the same spec validates both endpoints, moves nothing
    job["job"]["setting"]["dryRun"] = True
    report = run_job(spark, job)
    assert report["ok"], report
    assert any(c["name"] == "writer.jdbc" for c in report["checks"])


def test_jobspec_jdbc_insert_mode(spark, derby_url, src_table):
    from datax_spark.plans.job import run_job

    jdbc_execute(
        spark, derby_url,
        ["CREATE TABLE DX_JOB_INS (ID INT NOT NULL PRIMARY KEY, "
         "NAME VARCHAR(40))"],
    )
    job = {
        "job": {
            "content": [{
                "reader": {"name": "derbyreader", "parameter": {
                    "jdbcUrl": derby_url, "table": "DX_SRC",
                    "column": ["ID", "NAME"], "where": "ID <= 5"}},
                "writer": {"name": "derbywriter", "parameter": {
                    "jdbcUrl": derby_url, "table": "DX_JOB_INS",
                    "column": ["ID", "NAME"], "writeMode": "insert"}},
            }],
        }
    }
    run_job(spark, job)
    assert jdbc_query(
        spark, derby_url, "SELECT COUNT(*) FROM DX_JOB_INS") == [(5,)]


# ---------------------------------------------------------------------------
# canonical type-map (CommonRdbmsReader.java:241-350) on the LIVE path
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def typed_table(spark, derby_url):
    """Every Derby-expressible branch of the reference's type switch."""
    jdbc_execute(
        spark,
        derby_url,
        [
            "CREATE TABLE DX_TYPED ("
            "ID BIGINT NOT NULL PRIMARY KEY, "
            "C_SMALL SMALLINT, C_INT INT, "
            "C_DEC DECIMAL(10,2), C_BIGDEC DECIMAL(20,0), "
            "C_REAL REAL, C_DOUBLE DOUBLE, "
            "C_CHAR CHAR(8), C_VARCHAR VARCHAR(64), C_CLOB CLOB, "
            "C_BITS CHAR(4) FOR BIT DATA, C_BLOB BLOB, "
            "C_DATE DATE, C_TIME TIME, C_TS TIMESTAMP, "
            "C_BOOL BOOLEAN, C_YEARISH DATE)",
            "INSERT INTO DX_TYPED VALUES ("
            "1, 7, 42, 12.34, 18446744073709551615, "
            "1.5, 2.25, 'pad     ', 'hello', 'clob-text', "
            "X'DEADBEEF', CAST(X'00FF' AS BLOB), "
            "DATE('2021-07-04'), TIME('13:45:30'), "
            "TIMESTAMP('2021-07-04 13:45:30'), TRUE, DATE('1999-01-01'))",
        ],
    )
    return "DX_TYPED"


def test_canonical_cast_matches_reference_column_model(
    spark, derby_url, typed_table
):
    from datax_spark.sources.jdbc import canonical_cast

    raw = spark.read.jdbc(derby_url, typed_table, properties={})
    out = canonical_cast(raw, type_names={"C_YEARISH": "year"})
    types = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    # integer family -> long (LongColumn)
    assert types["C_SMALL"] == "bigint"
    assert types["C_INT"] == "bigint"
    assert types["ID"] == "bigint"
    # NUMERIC/DECIMAL + FLOAT/REAL -> double (DoubleColumn)
    assert types["C_DEC"] == "double"
    assert types["C_BIGDEC"] == "double"
    assert types["C_REAL"] == "double"
    assert types["C_DOUBLE"] == "double"
    # string family stays string, binary family stays binary
    assert types["C_CHAR"] == types["C_VARCHAR"] == types["C_CLOB"] == "string"
    assert types["C_BITS"] == types["C_BLOB"] == "binary"
    # temporal family as read (TIME arrives as timestamp from Spark)
    assert types["C_DATE"] == "date"
    assert types["C_TIME"].startswith("timestamp")
    assert types["C_TS"].startswith("timestamp")
    # BOOLEAN/bit(1) -> boolean; YEAR quirk -> long
    assert types["C_BOOL"] == "boolean"
    assert types["C_YEARISH"] == "bigint"

    r = out.first()
    assert r["C_SMALL"] == 7 and r["C_INT"] == 42
    assert r["C_DEC"] == 12.34
    assert r["C_BIGDEC"] == float(18446744073709551615)
    assert r["C_CHAR"].rstrip() == "pad" and r["C_CLOB"] == "clob-text"
    assert bytes(r["C_BITS"]) == b"\xde\xad\xbe\xef"
    assert bytes(r["C_BLOB"]) == b"\x00\xff"
    assert r["C_BOOL"] is True
    assert r["C_YEARISH"] == 1999  # mysql YEAR semantics: the year number


def test_canonical_cast_exact_decimals_and_unsupported(
    spark, derby_url, typed_table
):
    from datax_spark.sources.jdbc import UnsupportedJdbcType, canonical_cast

    raw = spark.read.jdbc(derby_url, typed_table, properties={})
    kept = canonical_cast(raw, exact_decimals=True)
    t = dict((f.name, f.dataType.simpleString()) for f in kept.schema.fields)
    assert t["C_BIGDEC"] == "decimal(20,0)"
    # exact path really is exact where double degrades
    assert int(kept.first()["C_BIGDEC"]) == 18446744073709551615
    # the reference's default arm: unsupported types refuse loudly
    bad = raw.withColumn("C_ARR", F.array(F.lit(1)))
    with pytest.raises(UnsupportedJdbcType, match="C_ARR"):
        canonical_cast(bad)


def test_canonical_cast_mysql_bit1_spec(spark):
    """MySQL quirks Derby can't produce, pinned at spec level: bit(1)
    arrives from the connector as BOOLEAN (Types.BIT -> BoolColumn,
    CommonRdbmsReader.java:314-319) and must stay boolean; bit(>1)
    arrives as VARBINARY and must stay bytes."""
    from datax_spark.sources.jdbc import canonical_cast

    df = spark.createDataFrame(
        [(True, bytearray(b"\x05"))], "B1 boolean, B8 binary"
    )
    out = canonical_cast(df)
    types = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert types == {"B1": "boolean", "B8": "binary"}
