"""As-of (point-in-time) join: each probe row matches the latest version
row at-or-before its timestamp.

Spark has no ASOF JOIN operator (DuckDB/Pandas do); the naive
formulations both collapse at scale — a range-predicate join degenerates
to per-key row explosion (every probe joins every earlier version before
the max filter), and a correlated subquery isn't expressible. The
scalable shape is the UNION + WINDOW formulation:

    tag probes and versions, union them, ONE window over
    (key ORDER BY t, is_probe) carrying last(version_struct ignorenulls)
    forward, keep probe rows.

Cost: one hash exchange of probes+versions keyed by the join key and one
within-partition sort — no join node at all, no row explosion, map-side
column pruning intact. Hot keys cost what any per-key window costs;
versions-per-key is typically bounded (CDC history), probes spread.

The matched version arrives as a STRUCT (time + payload), so delete
tombstones and staleness bounds stay expressible: a CDC consumer keeps
``op`` in the payload and nulls matches where the latest version is a
delete (exactly what the driver query ``cdc_asof_join`` value-checks
against a from-scratch SQL replay); ``tolerance`` nulls matches older
than ``probe_t - tolerance`` (the training-data "feature freshness"
rule).

Reference tie-in: DataX moves snapshots; the as-of join is what makes an
event table + the change history (operators/scd2.py) reproduce any
feature AS OF any event time without storing per-event snapshots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_T = "_asof_t"
_IS_PROBE = "_asof_is_probe"
_VER = "_asof_ver"


def asof_join(
    probes: DataFrame,
    versions: DataFrame,
    key_cols: list[str],
    probe_time: str,
    version_time: str,
    payload_cols: list[str] | None = None,
    tolerance: int | float | None = None,
    prefix: str = "asof_",
    direction: str = "backward",
) -> DataFrame:
    """As-of join, backward by default.

    Returns every ``probes`` row plus ``<prefix><col>`` for each payload
    column of the latest ``versions`` row with
    ``version_time <= probe_time`` (ties: the version wins, i.e. a
    version stamped exactly at the probe time is visible to it), and
    ``<prefix>t`` = that version's time. No match (or a match older than
    ``tolerance``) leaves them NULL.

    ``direction='forward'`` flips the search: the EARLIEST version
    at-or-after the probe time (pandas merge_asof parity) — the same
    window over the reversed sort, still one exchange, no join node.
    ``tolerance`` then bounds how far ahead the match may be.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload_cols = list(
        payload_cols
        if payload_cols is not None
        else [c for c in versions.columns if c not in (*key_cols, version_time)]
    )
    probe_carry = [c for c in probes.columns if c not in key_cols]

    # Keep the NATIVE time type when both sides agree: a double cast
    # collapses longs above 2^53 (nanosecond epochs, composite binlog
    # seqs) onto equal values and the window order goes wrong. Only a
    # mixed-type pair pays the double coercion, explicitly.
    pt_type = probes.schema[probe_time].dataType
    vt_type = versions.schema[version_time].dataType
    if pt_type == vt_type:
        t_type = pt_type
    else:
        from pyspark.sql.types import (
            ByteType, IntegerType, LongType, ShortType,
        )

        integral = (ByteType, ShortType, IntegerType, LongType)
        # mixed INTEGRAL pair widens to long — exact for the full 64-bit
        # range (a double coercion collapses values above 2^53, e.g.
        # nanosecond epochs vs composite binlog seqs). Only a genuinely
        # mixed-family pair (int vs float/decimal/timestamp) still pays
        # the documented double coercion.
        if isinstance(pt_type, integral) and isinstance(vt_type, integral):
            t_type = "long"
        else:
            t_type = "double"

    ver_struct = F.struct(
        F.col(version_time).cast(t_type).alias("t"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    v = versions.select(
        *key_cols,
        F.col(version_time).cast(t_type).alias(_T),
        F.lit(0).alias(_IS_PROBE),
        ver_struct.alias(_VER),
        *[F.lit(None).cast(probes.schema[c].dataType).alias(c) for c in probe_carry],
    )
    p = probes.select(
        *key_cols,
        F.col(probe_time).cast(t_type).alias(_T),
        F.lit(1).alias(_IS_PROBE),
        F.lit(None).cast(v.schema[_VER].dataType).alias(_VER),
        *probe_carry,
    )
    # ORDER BY (t, is_probe) — backward ascending / forward descending;
    # version rows sort before probe rows at the same timestamp either
    # way, so an equal-time version is visible to the probe.
    t_order = F.col(_T).asc() if direction == "backward" else F.col(_T).desc()
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(t_order, F.col(_IS_PROBE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(_VER, ignorenulls=True).over(w)
    out = v.unionByName(p).withColumn(_VER, matched).filter(F.col(_IS_PROBE) == 1)
    if tolerance is not None:
        from pyspark.sql.types import DateType, TimestampType

        if isinstance(t_type, (TimestampType, DateType)):
            # seconds semantics for time types (epoch-cast before the
            # subtraction; tolerance magnitudes are small so the double
            # diff is exact here)
            gap = F.col(_T).cast("double") - F.col(_VER)["t"].cast("double")
        else:
            gap = F.col(_T) - F.col(_VER)["t"]
        if direction == "forward":
            gap = -gap
        out = out.withColumn(
            _VER,
            F.when(gap <= F.lit(tolerance), F.col(_VER)),
        )
    sel = (
        [F.col(k) for k in key_cols]
        + [F.col(c) for c in probe_carry]
        + [F.col(_VER)["t"].alias(f"{prefix}t")]
        + [F.col(_VER)[c].alias(f"{prefix}{c}") for c in payload_cols]
    )
    return out.select(*sel)
