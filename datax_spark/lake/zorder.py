"""Z-order (Morton) clustering for multi-dimensional file skipping.

``LakeTable.rewrite_clustered(sort_cols=["a", "b"])`` is a LEXICOGRAPHIC
sort: files get tight [min, max] bounds on ``a`` but the secondary
column still spans nearly the full range in every file, so manifest
file skipping (lake/stats.py) only helps one dimension. Interleaving
the bits of per-column ranks into one Morton code and sorting on THAT
gives every participating column bounds ~range^(1/k) per file — range
scans on ANY of the k dimensions prune (the Delta OPTIMIZE ZORDER
design, public Morton-order literature).

Everything is pure Column arithmetic (double rank -> bit interleave via
shift/mask), JVM-side whole-stage codegen: at 100 TB the z-value costs
one projection in the rewrite job, nothing at read time — the payoff is
entirely in the footer bounds the manifest records.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16 bits/dim keeps the interleaved code within a long for <= 4 dims and
# is far finer than file-count granularity ever needs.
DEFAULT_BITS = 16


def zorder_expr(
    cols: list[str], bounds: dict[str, tuple[float, float]],
    bits: int = DEFAULT_BITS,
) -> Column:
    """Morton code over ``cols`` given their global [min, max] bounds.

    Each column is rank-normalized to [0, 2^bits) with double
    arithmetic (fine at file granularity), NULLs rank 0; the ranks'
    bits interleave little-endian across columns. ``bits * len(cols)``
    must fit a long (<= 62).
    """
    n = len(cols)
    if n < 1:
        raise ValueError("zorder needs at least one column")
    if bits * n > 62:
        raise ValueError(f"{bits} bits x {n} cols overflows a long")
    scale = (1 << bits) - 1
    ranks: list[Column] = []
    for c in cols:
        mn, mx = bounds[c]
        span = float(mx) - float(mn)
        if span <= 0:
            ranks.append(F.lit(0).cast("long"))
            continue
        r = F.floor(
            (F.col(c).cast("double") - F.lit(float(mn))) * F.lit(scale / span)
        )
        r = F.least(F.lit(scale).cast("long"), F.greatest(F.lit(0).cast("long"), r))
        ranks.append(F.coalesce(r, F.lit(0).cast("long")))
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, r in enumerate(ranks):
            bit = F.shiftright(r, b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit.cast("long"), b * n + i)
    return z


def column_bounds(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """Global [min, max] per column as doubles — ONE narrow agg job,
    O(cols) driver rows."""
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"_mn_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"_mx_{c}"))
    row = df.agg(*aggs).first()
    out = {}
    for c in cols:
        mn, mx = row[f"_mn_{c}"], row[f"_mx_{c}"]
        out[c] = (
            float(mn) if mn is not None else 0.0,
            float(mx) if mx is not None else 0.0,
        )
    return out
