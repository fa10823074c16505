"""SparkSession factory with scale-appropriate defaults.

The reference sizes parallelism from a throughput budget
(core/.../job/JobContainer.java:416-486 ``adjustChannelNumber``); on Spark
the equivalent knobs are shuffle partitions, AQE, and Arrow batch size.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "datax-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    speculation: bool = False,
    hive: bool = False,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for the CDC apply path.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (all cores). AQE is
    on so skewed shuffles re-plan at runtime; Arrow is on for the pandas_udf
    escape hatch; session timezone is pinned to UTC so results are
    reproducible against the DuckDB oracle.

    ``speculation=True`` is the hung-task-monitor analog
    (core/.../taskgroup/TaskMonitor.java:31-93 marks tasks with no
    progress and fails them over): Spark re-launches straggler task
    attempts; safe here because all sinks are idempotent (immutable
    files + manifest CAS). Off by default in local mode — speculative
    copies on one box only add load.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        # Task-side output commit (v2): the serial driver-side rename loop
        # of v1 is pure serial time; our lake publishes via manifest CAS,
        # so v1's job-level atomicity adds nothing.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    )
    if speculation:
        builder = (
            builder.config("spark.speculation", "true")
            .config("spark.speculation.multiplier", "3")
            .config("spark.speculation.quantile", "0.9")
        )
    if hive:
        # Hive catalog (embedded per-process Derby metastore in a temp
        # dir so concurrent processes don't fight over ./metastore_db).
        # Needed only for Hive SerDe formats (hdfsreader's RCFile mode);
        # everything else runs on the in-memory catalog. Must be set at
        # FIRST session creation in the process — enableHiveSupport on
        # an existing plain session is a silent no-op.
        import tempfile

        meta = tempfile.mkdtemp(prefix="dx_metastore_")
        builder = (
            builder.enableHiveSupport()
            .config("spark.sql.warehouse.dir", os.path.join(meta, "warehouse"))
            .config(
                "spark.hadoop.javax.jdo.option.ConnectionURL",
                f"jdbc:derby:;databaseName={meta}/metastore_db;create=true",
            )
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
