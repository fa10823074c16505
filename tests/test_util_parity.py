"""Tests for parity utilities: retry, rate limit, shard expansion,
upsert SQL, connector option builders, pandas transforms."""

from __future__ import annotations

import time

import pytest

from datax_spark.operators.transforms import TransformSpec, apply_transform_chain
from datax_spark.operators.upsert_sql import jdbc_write_options, upsert_sql
from datax_spark.sources.connectors import (
    elasticsearch_write_options,
    hbase_catalog,
    mongodb_read_options,
)
from datax_spark.sources.expand import expand_shards, filter_by_regex
from datax_spark.util import RateLimiter, execute_with_retry


def test_retry_succeeds_after_failures():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise OSError("transient")
        return "ok"

    assert execute_with_retry(flaky, retry_times=3, sleep_sec=0.01) == "ok"
    assert len(calls) == 3


def test_retry_exhausts():
    with pytest.raises(ValueError):
        execute_with_retry(
            lambda: (_ for _ in ()).throw(ValueError("x")),
            retry_times=2,
            sleep_sec=0.01,
            retry_on=(ValueError,),
        )


def test_rate_limiter_throttles():
    rl = RateLimiter(per_sec=1000)
    t0 = time.monotonic()
    rl.admit(500)
    rl.admit(500)  # 1000 units -> needs >= 1.0s elapsed
    assert time.monotonic() - t0 >= 0.9


def test_expand_shards():
    assert expand_shards("t_[0-3]") == ["t_0", "t_1", "t_2", "t_3"]
    assert expand_shards("t_[08-11]suffix") == [
        "t_08suffix", "t_09suffix", "t_10suffix", "t_11suffix"
    ]
    assert expand_shards("plain") == ["plain"]
    # reference swaps reversed bounds rather than rejecting them
    assert expand_shards("t_[5-2]") == ["t_2", "t_3", "t_4", "t_5"]
    # padding follows the START bound's leading zero even when bound
    # lengths differ (TableExpandUtil: '[01-100]' -> '01'..'100')
    assert expand_shards("t_[01-03]")[:2] == ["t_01", "t_02"]
    assert expand_shards("t_[098-101]") == ["t_098", "t_099", "t_100", "t_101"]


def test_writer_connector_option_builders():
    from datax_spark.sources.connectors import (
        cassandra_write_options,
        mongodb_write_options,
        ocs_write_options,
        ots_read_options,
    )

    m = mongodb_write_options({
        "address": ["h1:27017", "h2:27017"], "dbName": "d",
        "collectionName": "c",
        "writeMode": {"isReplace": True, "replaceKey": "uid"},
    })
    assert m["operationType"] == "replace" and m["idFieldList"] == "uid"
    assert m["connection.uri"] == "h1:27017,h2:27017"

    c = cassandra_write_options({
        "host": "ch", "keyspace": "k", "table": "t", "batchSize": 64,
    })
    assert c["spark.cassandra.output.batch.size.rows"] == "64"

    o = ocs_write_options({
        "proxy": "p", "writeMode": "add", "indexes": [0, 1],
    })
    assert o["writeMode"] == "add" and o["indexes"] == "0,1"

    r = ots_read_options({
        "endpoint": "e", "instanceName": "i", "table": "t",
        "column": [{"name": "uid"}, {"name": "val"}],
        "range": {"begin": 0, "end": 100, "split": [50]},
    })
    assert r["predicates"] == ["uid >= 0 AND uid < 50",
                               "uid >= 50 AND uid < 100"]


def test_filter_by_regex_full_match():
    names = ["pt=20240101", "pt=20240102", "other"]
    assert filter_by_regex(names, r"pt=2024010[12]") == names[:2]
    assert filter_by_regex(names, None) == names


def test_upsert_sql_mysql():
    assert upsert_sql("t", ["a", "b"], "replace", dialect="mysql").startswith(
        "REPLACE INTO t (a, b)"
    )
    s = upsert_sql("t", ["a", "b"], "update", dialect="mysql")
    assert "ON DUPLICATE KEY UPDATE a=VALUES(a), b=VALUES(b)" in s
    assert upsert_sql("t", ["a"], "insert") == "INSERT INTO t (a) VALUES (?)"


def test_upsert_sql_merge_dialects():
    s = upsert_sql("t", ["k", "v"], "update", key_columns=["k"], dialect="db2")
    assert "MERGE INTO t AS T" in s and "WHEN MATCHED THEN UPDATE SET T.v = S.v" in s
    p = upsert_sql("t", ["k", "v"], "update", key_columns=["k"], dialect="postgresql")
    assert "ON CONFLICT (k) DO UPDATE SET v=EXCLUDED.v" in p
    with pytest.raises(ValueError):
        upsert_sql("t", ["k"], "update", dialect="db2")


def test_jdbc_write_options_defaults():
    o = jdbc_write_options({"jdbcUrl": "jdbc:x", "table": "t"})
    assert o["batchsize"] == "2048"  # DataX default batch size


def test_connector_builders():
    m = mongodb_read_options(
        {"address": "mongodb://h:27017", "dbName": "d", "collectionName": "c"}
    )
    assert m["database"] == "d" and "partitioner" in m
    e = elasticsearch_write_options(
        {"endpoint": "http://es:9200", "index": "idx",
         "column": [{"name": "pk", "type": "id"}], "actionType": "update"}
    )
    assert e["es.mapping.id"] == "pk" and e["es.write.operation"] == "upsert"
    h = hbase_catalog(
        {"table": "t", "column": [{"name": "rowkey", "type": "string"},
                                   {"name": "cf:q", "type": "string"}]}
    )
    assert h["columns"]["q"]["cf"] == "cf"


def test_hbase_read_spec_modes():
    from datax_spark.sources.connectors import hbase_read_spec

    base = {"table": "t", "column": [{"name": "rowkey"}, {"name": "cf:q"}]}
    assert hbase_read_spec(base)["mode"] == "normal"
    mv = hbase_read_spec({**base, "mode": "multiVersionFixedColumn",
                          "maxVersion": 3})
    assert mv["maxVersion"] == 3
    assert mv["scan"]["hbase.spark.query.maxVersions"] == 3
    # -1 = all versions, like scan.setMaxVersions()
    mv_all = hbase_read_spec({**base, "mode": "multiVersionFixedColumn",
                              "maxVersion": -1})
    assert mv_all["scan"]["hbase.spark.query.maxVersions"] == 2147483647
    with pytest.raises(ValueError, match="maxVersion"):
        hbase_read_spec({**base, "mode": "multiVersionFixedColumn"})
    with pytest.raises(ValueError, match="mode"):
        hbase_read_spec({**base, "mode": "multiVersionDynamicColumn"})


def test_ads_write_spec_modes():
    from datax_spark.sources.connectors import ads_write_spec

    base = {"url": "h:3306", "schema": "db", "table": "t"}
    load = ads_write_spec(base)  # default mode
    assert load["writeMode"] == "load" and load["strategy"] == "bulk_load"
    assert load["overwrite"] is True
    ins = ads_write_spec({**base, "writeMode": "insert", "batchSize": 64})
    assert ins["strategy"] == "append" and ins["batchSize"] == 64
    assert ins["jdbc"]["jdbcUrl"] == "jdbc:mysql://h:3306/db"
    stream = ads_write_spec({**base, "writeMode": "stream"})
    assert stream["strategy"] == "append"
    with pytest.raises(ValueError, match="writeMode"):
        ads_write_spec({**base, "writeMode": "upsert"})


def test_explode_cell_versions(spark):
    """Executed multiVersionFixedColumn explode: one row per cell
    version, 4-column layout (rowkey, column, timestamp, value) like
    MultiVersionTask.convertCellToLine, newest-first, capped at
    maxVersion — all inside the row, no shuffle."""
    from datax_spark.sources.connectors import explode_cell_versions

    df = spark.createDataFrame(
        [
            ("r1",
             [(100, "a1"), (300, "a3"), (200, "a2")],
             [(50, "b1")]),
            ("r2", [], [(10, "x"), (20, "y")]),
        ],
        "rowkey string, `cf:a` array<struct<ts:long,value:string>>, "
        "`cf:b` array<struct<ts:long,value:string>>",
    )
    out = explode_cell_versions(df, ["cf:a", "cf:b"], max_version=2)
    assert out.columns == ["rowkey", "column", "timestamp", "value"]
    rows = [(r["rowkey"], r["column"], r["timestamp"], r["value"])
            for r in out.collect()]
    # r1 cf:a keeps the 2 NEWEST versions in desc order; ts=100 dropped
    assert rows.count(("r1", "cf:a", 300, "a3")) == 1
    assert rows.count(("r1", "cf:a", 200, "a2")) == 1
    assert not any(r[0] == "r1" and r[1] == "cf:a" and r[2] == 100 for r in rows)
    assert ("r1", "cf:b", 50, "b1") in rows
    assert ("r2", "cf:b", 20, "y") in rows and ("r2", "cf:b", 10, "x") in rows
    assert len(rows) == 5
    # no shuffle: the plan is scan -> project/explode only
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # max_version=-1 keeps everything
    all_rows = explode_cell_versions(df, ["cf:a", "cf:b"], max_version=-1)
    assert all_rows.count() == 6


def test_pandas_transform_chain(spark):
    import datax_spark.operators.pandas_transforms  # noqa: F401  (registers)

    df = spark.createDataFrame(
        [("  a  b  ", "12.5"), ("x", "bad")], ["txt", "num"]
    )
    out = apply_transform_chain(
        df,
        [
            TransformSpec("py_norm_content", "txt"),
            TransformSpec("py_cast_safe", "num", {"output": "num_d"}),
        ],
    )
    rows = {r["txt"]: r for r in out.collect()}
    assert "a b" in rows
    assert rows["a b"]["num_d"] == 12.5
    assert rows["x"]["num_d"] is None  # dirty-able sentinel
