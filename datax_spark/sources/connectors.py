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
