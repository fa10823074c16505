"""Latest-wins per-key dedup of change events.

DataX preserves per-task record order implicitly through its FIFO channel
(core/.../transport/channel/memory/MemoryChannel.java:22-146); under
Spark's order-free shuffle the same contract is restored explicitly: for
each key keep only the event with the highest ``seq`` (the reference's
``sequenceId`` total order, otsstreamreader/.../MultiVerModeRecordSender
.java:135-141).

Two physical strategies:

- ``dedup_latest`` (default): ``groupBy(keys).agg(max_by(struct(*), seq))``.
  max_by is a declarative aggregate, so Spark performs MAP-SIDE PARTIAL
  aggregation before the shuffle — a million updates to one hot key
  collapse to one row per map partition before any data moves. This is the
  scalable path for hot-key skew and needs no sort.
- ``dedup_latest_window`` : row_number() OVER (PARTITION BY keys ORDER BY
  seq DESC), optionally salted two-phase for pathological single-key skew.
  Kept for parity/testing (it is the formulation the north rule names).

At 10^10 events the agg form shuffles at most (distinct keys) rows and the
partial agg bounds any single reducer's input by the map partition count,
so no salting is required on this path; AQE handles residual imbalance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_KEYS = ["repo", "path", "commit"]


def dedup_latest(
    events: DataFrame,
    key_cols: list[str] | None = None,
    seq_col: str = "seq",
) -> DataFrame:
    """One row per key: the event with max ``seq`` (all columns preserved)."""
    keys = key_cols or DEFAULT_KEYS
    payload = [c for c in events.columns if c not in keys]
    latest = F.max_by(F.struct(*payload), F.col(seq_col)).alias("_latest")
    out = events.groupBy(*keys).agg(latest)
    return out.select(*keys, *[F.col(f"_latest.{c}").alias(c) for c in payload])


def dedup_latest_window(
    events: DataFrame,
    key_cols: list[str] | None = None,
    seq_col: str = "seq",
    salt_buckets: int = 0,
) -> DataFrame:
    """row_number-window formulation of latest-wins dedup.

    With ``salt_buckets > 0`` a two-phase salted reduction runs first:
    events are pre-reduced per (key, seq % salt_buckets) so a single
    pathologically hot key spreads over ``salt_buckets`` reducers before
    the final window — the generalization of DataX's x5 over-split of
    single tables (plugin-rdbms-util/.../ReaderSplitUtil.java:64-72).
    """
    keys = key_cols or DEFAULT_KEYS
    df = events
    if salt_buckets > 0:
        salt = F.pmod(F.col(seq_col), F.lit(salt_buckets)).alias("_salt")
        df = df.withColumn("_salt", salt)
        w1 = Window.partitionBy(*keys, "_salt").orderBy(F.col(seq_col).desc())
        df = (
            df.withColumn("_rn", F.row_number().over(w1))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_salt")
        )
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
