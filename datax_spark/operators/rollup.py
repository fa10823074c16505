"""Incremental rollup maintenance: change feed -> downstream aggregate.

The engine doesn't just ingest a changelog — it EMITS one
(LakeTable.read_changes, the Delta CDF analog). This operator closes the
loop: a downstream per-group aggregate table (rows per group + content
bytes per group — the materialized-view shape every CDC consumer builds
first) is maintained INCREMENTALLY from that feed and kept exactly-once
by the same batch-id fence as any other sink. The refresh is literally a
CDC apply into another lake table: the engine composing with itself.

Reference analog: DataX jobs that fan one reader into aggregate sinks
(adswriter's load-then-aggregate pattern, adswriter/doc/adswriter.md);
re-expressed here as manifest-diff-driven incremental maintenance
instead of periodic full recomputes.

Scale shape (100 TB src, 1000 executors):
- the change feed reads ONLY buckets whose manifest file lists changed
  between the two versions — O(changed data), never O(table);
- the per-group delta is one groupBy over those changes (map-side
  combinable sums of +/-1 and +/-bytes);
- the agg-side read is BUCKET-PRUNED: the delta's distinct bucket ids
  (<= num_buckets rows, collected driver-side) select which agg buckets
  to read, and the join build side is the (small) delta;
- publication is a fenced merge_apply — a crashed refresh replays as a
  committed no-op, so the rollup can never double-count.

Bootstrap note: the first refresh diffs from src version 1 (empty), so
every manifest since creation must still exist; a vacuumed-away history
needs a full-scan bootstrap instead (bulk_load of the grouped scan).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datax_spark.lake.table import LakeTable, bucket_expr, snap_bucket_dtype
from datax_spark.operators.merge import DELETE_OP, MergeResult, merge_apply

_PLUS = ("insert", "update_postimage")


def rollup_schema():
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    return StructType(
        [
            StructField("repo", StringType()),
            StructField("n_paths", LongType()),
            StructField("total_bytes", LongType()),
        ]
    )


def create_rollup_table(
    spark, path: str, group_key: str = "repo", num_buckets: int = 16
) -> LakeTable:
    """The downstream aggregate table: one row per ``group_key``."""
    return LakeTable.create(
        spark,
        path,
        rollup_schema(),
        key_cols=[group_key],
        bucket_key=group_key,
        num_buckets=num_buckets,
    )


def refresh_rollup(
    src: LakeTable,
    agg: LakeTable,
    group_key: str = "repo",
    size_col: str = "content",
    stream_id: str = "rollup",
) -> MergeResult | None:
    """Advance ``agg`` to reflect ``src``'s current version. Idempotent:
    the processed src version IS the fence batch id, so re-running after
    a crash (or concurrently) commits at most once per src version.
    Returns None when there is nothing new.
    """
    last = agg.last_batch_id(stream_id)
    from_v = 1 if last is None else int(last)
    to_v = src.current_version()
    if to_v <= from_v:
        return None

    changes = src.read_changes(from_v, to_v)
    sign = F.when(F.col("_change_type").isin(*_PLUS), F.lit(1)).otherwise(
        F.lit(-1)
    )
    nbytes = F.octet_length(F.coalesce(F.col(size_col), F.lit(""))).cast("long")
    delta = (
        changes.groupBy(group_key)
        .agg(
            F.sum(sign).alias("_dn"),
            F.sum(sign * nbytes).alias("_dbytes"),
        )
        .filter((F.col("_dn") != 0) | (F.col("_dbytes") != 0))
        .persist()
    )
    try:
        agg_snap = agg.snapshot()
        props = agg_snap.properties
        # <= num_buckets rows: which agg buckets the delta can touch
        affected = sorted(
            int(r["b"])
            for r in delta.select(
                bucket_expr(
                    props["bucket_key"],
                    props["num_buckets"],
                    snap_bucket_dtype(agg_snap),
                ).alias("b")
            )
            .distinct()
            .collect()
        )
        if not affected:
            # still advance the fence (e.g. a compaction-only src commit)
            return merge_apply(
                agg,
                agg.spark.createDataFrame(
                    [],
                    "repo string, n_paths long, total_bytes long, "
                    "op string, seq long",
                ),
                batch_id=to_v,
                stream_id=stream_id,
            )
        old = agg.read(buckets=affected).select(
            F.col(group_key),
            F.col("n_paths").alias("_old_n"),
            F.col("total_bytes").alias("_old_b"),
        )
        joined = delta.join(old, on=group_key, how="left")
        n = F.coalesce(F.col("_old_n"), F.lit(0)) + F.col("_dn")
        b = F.coalesce(F.col("_old_b"), F.lit(0)) + F.col("_dbytes")
        op = F.when(n <= 0, F.lit(DELETE_OP)).when(
            F.col("_old_n").isNull(), F.lit("insert")
        ).otherwise(F.lit("update"))
        changelog = joined.select(
            F.col(group_key),
            n.cast("long").alias("n_paths"),
            b.cast("long").alias("total_bytes"),
            op.alias("op"),
            F.lit(to_v).cast("long").alias("seq"),
        )
        return merge_apply(agg, changelog, batch_id=to_v, stream_id=stream_id)
    finally:
        delta.unpersist()
