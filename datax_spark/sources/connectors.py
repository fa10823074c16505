"""Connector spec builders: DataX reader/writer configs -> Spark options.

No external systems exist in this sandbox, so these compile DataX-style
parameter blocks into the exact option dicts the corresponding Spark
connectors take (unit-tested at the option level; the JDBC one is also
exercised through plans/job.py). Each builder documents the split /
upsert semantics it carries over from the reference plugin.
"""

from __future__ import annotations

from typing import Any


def mongodb_read_options(param: dict[str, Any]) -> dict[str, str]:
    """mongodbreader analog (mongodbreader/.../MongoDBReader.java:92-123).

    DataX splits by _id ranges sampled with skip/limit
    (CollectionSplitUtil.java:92-154); the mongo-spark connector's
    partitioner does the same natively (SamplePartitioner on _id).
    """
    opts = {
        "connection.uri": param["address"]
        if isinstance(param["address"], str)
        else ",".join(param["address"]),
        "database": param["dbName"],
        "collection": param["collectionName"],
        "partitioner": "com.mongodb.spark.sql.connector.read.partitioner.SamplePartitioner",
    }
    if param.get("query"):
        opts["aggregation.pipeline"] = f'[{{"$match": {param["query"]}}}]'
    return opts


def cassandra_read_options(param: dict[str, Any]) -> dict[str, str]:
    """cassandrareader analog: token-range split is native to the
    spark-cassandra-connector (CassandraReaderHelper.java split logic)."""
    return {
        "spark.cassandra.connection.host": param["host"],
        "spark.cassandra.connection.port": str(param.get("port", 9042)),
        "keyspace": param["keyspace"],
        "table": param["table"],
    }


def elasticsearch_write_options(param: dict[str, Any]) -> dict[str, str]:
    """elasticsearchwriter analog (elasticsearchwriter/.../ESWriter.java).

    Bulk indexing with doc-id idempotence; DataX's alias cutover after
    load (ESWriter.java:204-208) is the snapshot-publish pattern our
    LakeTable manifest commit implements natively.
    """
    opts = {
        "es.nodes": param["endpoint"],
        "es.resource": param["index"],
        "es.batch.size.entries": str(param.get("batchSize", 1000)),
        "es.write.operation": "upsert" if param.get("actionType") == "update" else "index",
    }
    if param.get("column"):
        ids = [c["name"] for c in param["column"] if c.get("type") == "id"]
        if ids:
            opts["es.mapping.id"] = ids[0]
    return opts


def mongodb_write_options(param: dict[str, Any]) -> dict[str, str]:
    """mongodbwriter analog (mongodbwriter/.../MongoDBWriter.java:141-184).

    DataX writeMode.isReplace drives per-document ReplaceOneModel on the
    configured unique key; the mongo-spark connector expresses the same
    as operationType=replace keyed by idFieldList (insert = plain bulk
    insert).
    """
    opts = {
        "connection.uri": param["address"]
        if isinstance(param["address"], str)
        else ",".join(param["address"]),
        "database": param["dbName"],
        "collection": param["collectionName"],
        "maxBatchSize": str(param.get("batchSize", 1000)),
    }
    wm = param.get("writeMode", {})
    if isinstance(wm, dict) and wm.get("isReplace"):
        opts["operationType"] = "replace"
        opts["idFieldList"] = wm.get("replaceKey", "_id")
    else:
        opts["operationType"] = "insert"
    return opts


def cassandra_write_options(param: dict[str, Any]) -> dict[str, str]:
    """cassandrawriter analog (cassandrawriter/.../CassandraWriter.java):
    CQL INSERT is an upsert by primary key natively, so writeMode maps
    to connector defaults; consistency/batch knobs carry over."""
    return {
        "spark.cassandra.connection.host": param["host"],
        "spark.cassandra.connection.port": str(param.get("port", 9042)),
        "keyspace": param["keyspace"],
        "table": param["table"],
        "spark.cassandra.output.consistency.level": param.get(
            "consistancyLevel", param.get("consistencyLevel", "LOCAL_QUORUM")
        ),
        "spark.cassandra.output.batch.size.rows": str(
            param.get("batchSize", 1)
        ),
    }


def ocs_write_options(param: dict[str, Any]) -> dict[str, str]:
    """ocswriter analog (ocswriter/.../OcsWriter.java): memcached-protocol
    KV PUT of (joined-key -> joined-fields). No Spark OCS connector
    exists; the compiled spec targets a foreachPartition KV sink —
    key/value layout and expiry carried from the reference config."""
    return {
        "proxy": param["proxy"],
        "port": str(param.get("port", 11211)),
        "writeMode": param.get("writeMode", "set"),  # set|add|replace|append
        "writeFormat": param.get("writeFormat", "text"),
        "expireTime": str(param.get("expireTime", 0)),
        "indexes": ",".join(str(i) for i in param.get("indexes", [0])),
        "fieldDelimiter": param.get("fieldDelimiter", ""),
    }


def ots_read_options(param: dict[str, Any]) -> dict[str, Any]:
    """otsreader (batch range scan) analog (otsreader/.../OtsReader.java):
    DataX splits the primary-key range into even slices (range.begin/
    end + explicit split points). Compiled to a predicate list the
    generic partitioned-read path consumes — one Spark partition per pk
    slice, same shape as sources/jdbc.pk_range_predicates.
    """
    rng = param["range"]
    pk = param["column"][0]["name"] if param.get("column") else "pk"
    bounds = [rng["begin"]] + list(rng.get("split", [])) + [rng["end"]]
    predicates = [
        f"{pk} >= {lo} AND {pk} < {hi}" for lo, hi in zip(bounds, bounds[1:])
    ]
    return {
        "endpoint": param["endpoint"],
        "instance": param["instanceName"],
        "table": param["table"],
        "columns": [c["name"] for c in param.get("column", [])],
        "predicates": predicates,
    }


def ads_write_spec(param: dict[str, Any]) -> dict[str, Any]:
    """adswriter analog (adswriter/.../AdsWriter.java:64-89,185-226):
    three writeModes — ``load`` (default; stage to intermediate storage
    then a set-based bulk LOAD, offline tables only), ``insert`` /
    ``stream`` (direct row inserts through the MySQL protocol with a
    batch size). Compiled to this engine's two native sinks: load ->
    LakeTable.bulk_load-style staged parallel write + one commit;
    insert/stream -> the partitioned executor append (sources/jdbc
    insert path) with DataX's batch size carried over.
    """
    mode = (param.get("writeMode") or "load").lower()
    if mode not in ("load", "insert", "stream"):
        raise ValueError("writeMode must be 'load' or 'insert' or 'stream'")
    spec: dict[str, Any] = {
        "url": param["url"],
        "schema": param["schema"],
        "table": param["table"],
        "writeMode": mode,
    }
    if mode == "load":
        spec["strategy"] = "bulk_load"
        # LOAD overwrites the target partition/table (truncate semantics)
        spec["overwrite"] = bool(param.get("overWrite", True))
        spec["partition"] = param.get("partition")
    else:
        spec["strategy"] = "append"
        spec["batchSize"] = int(param.get("batchSize", 32))
        spec["jdbc"] = {
            "jdbcUrl": f"jdbc:mysql://{param['url']}/{param['schema']}",
            "table": param["table"],
            "writeMode": "insert",
        }
    return spec


def hbase_catalog(param: dict[str, Any]) -> dict[str, Any]:
    """hbase11xreader/-writer analog: build the shc/hbase-spark catalog
    from DataX's column list (rowkey template + cf:qualifier columns,
    hbase11xreader/.../Hbase11xHelper.java)."""
    columns = {}
    for c in param.get("column", []):
        name = c["name"]
        if name == "rowkey":
            columns["rowkey"] = {"cf": "rowkey", "col": "key", "type": c.get("type", "string")}
        else:
            cf, col = name.split(":", 1)
            columns[col] = {"cf": cf, "col": col, "type": c.get("type", "string")}
    return {
        "table": {"namespace": param.get("namespace", "default"),
                  "name": param["table"]},
        "rowkey": "key",
        "columns": columns,
    }


def hbase_read_spec(param: dict[str, Any]) -> dict[str, Any]:
    """hbase11xreader mode dispatch (Hbase11xReader.java + ModeType.java):
    ``normal`` -> one row per rowkey via the catalog; ``multiVersionFixedColumn``
    -> one row per CELL VERSION (explode_cell_versions applies the
    layout), requiring ``maxVersion`` exactly like the reference
    (Hbase11xHelper.java:462 validates it)."""
    mode = param.get("mode", "normal")
    if mode not in ("normal", "multiVersionFixedColumn"):
        raise ValueError(f"unknown hbase reader mode {mode!r}")
    spec: dict[str, Any] = {"mode": mode, "catalog": hbase_catalog(param)}
    if mode == "multiVersionFixedColumn":
        if "maxVersion" not in param:
            raise ValueError("multiVersionFixedColumn requires maxVersion")
        max_version = int(param["maxVersion"])
        if max_version == 0 or max_version < -1:
            raise ValueError("maxVersion must be -1 (all) or a positive count")
        spec["maxVersion"] = max_version
        # the scan must fetch every retained version for the explode
        spec["scan"] = {"hbase.spark.query.maxVersions": (
            2147483647 if max_version == -1 else max_version
        )}
    return spec


def explode_cell_versions(
    df,
    cell_cols: list[str],
    rowkey_col: str = "rowkey",
    max_version: int = -1,
):
    """multiVersionFixedColumn layout: one row per cell VERSION.

    Input: one row per rowkey where each ``cf:qualifier`` column is an
    ``array<struct<ts:long, value>>`` of its versions (the raw shape a
    cell-level scan yields). Output matches the reference's 4-column
    record (MultiVersionTask.java:71-90): (rowkey, column, timestamp,
    value), newest-first per cell, capped at ``max_version`` newest
    versions (-1 = all, like scan.setMaxVersions()).

    Scale shape: the version cap is applied INSIDE the row (sort_array
    desc + slice on the per-cell array) before a single explode — no
    window, no shuffle, so the transform is a pure narrow map at any
    table size.
    """
    from pyspark.sql import functions as F

    def tagger(col_name: str):
        # factory-bound name: a defaulted second lambda arg would be
        # interpreted as (element, index) by F.transform — the NOTES.md
        # transform-lambda arity trap
        def tag(s):
            return F.struct(
                F.lit(col_name).alias("column"),
                s["ts"].alias("timestamp"),
                s["value"].alias("value"),
            )

        return tag

    def per_cell(col_name: str):
        ver = F.sort_array(F.col(col_name), asc=False)  # struct sorts ts-first
        if max_version is not None and max_version > 0:
            ver = F.slice(ver, 1, max_version)
        return F.transform(ver, tagger(col_name))

    cells = F.flatten(F.array(*[per_cell(c) for c in cell_cols]))
    return (
        df.select(F.col(rowkey_col).alias("rowkey"), F.explode(cells).alias("_c"))
        .select("rowkey", "_c.column", "_c.timestamp", "_c.value")
    )
