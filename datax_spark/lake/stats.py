"""Per-file column bounds for manifest-level scan pruning.

The Iceberg-manifest analog of what the reference achieves with WHERE
pushdown into generated scan SQL (plugin-rdbms-util/.../reader/util/
SingleTableSplitUtil.buildQuerySql:126-139): the manifest records each
data file's [min, max] per configured column, so a filtered scan can
drop whole files DRIVER-SIDE, before Spark ever plans the read. At
100-TB file counts this is the difference between "open every footer on
the cluster" and "read O(surviving files)": footer stats are harvested
ONCE at write time (pure parquet-metadata reads — no data scan) and
ride the snapshot, content-addressed and O(changed files) per commit.

Where it pays: CDC/append workloads cluster naturally — each commit's
files cover a narrow ``seq``/event-time range — so time- and
seq-range scans (incremental consumers, backfills, audits) touch only
the commits in range. Hash-bucketed columns gain nothing (each file
spans the full range); that's what bucket pruning on the bucket key is
for (LakeTable.scan does both).

Stats are an OPTIMIZATION ONLY: ``scan`` re-applies the full predicate
to the surviving rows, so a missing/unsupported stat can never change
results — it only loses pruning.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import SparkSession

# Columns whose parquet min/max are orderable in plain Python land here;
# anything else (timestamps, decimals, binary) is skipped per-file and
# simply never prunes. (Event time should be carried as epoch micros in
# a long column for stats purposes — FIXTURES.md's `seq` convention.)
_SUPPORTED = (int, float, str)

FILE_STATS_PARALLEL_THRESHOLD = 64  # footer reads above this go to executors

Filter = tuple[str, str, Any]  # (column, op, literal); op in = < <= > >= in
_OPS = ("=", "<", "<=", ">", ">=", "in")


def _footer_one(abs_path: str, cols: list[str]) -> dict[str, list]:
    """min/max per requested column from one parquet footer.

    Aggregates across row groups; a column missing stats in ANY row
    group (or of an unsupported type, or all-null throughout) is
    omitted — absence means "don't prune on this column for this file".
    """
    import pyarrow.parquet as pq

    md = pq.ParquetFile(abs_path).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    # "#rows": the file's exact row count, free from the same footer —
    # powers LakeTable.count(metadata_only=True) (Iceberg answers
    # count(*) from manifests the same way). '#' keeps it out of the
    # column namespace; file_survives never consults it.
    out: dict[str, list] = {"#rows": [md.num_rows, md.num_rows]}
    for c in cols:
        i = idx.get(c)
        if i is None:
            continue
        lo = hi = None
        ok = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(i).statistics
            if st is None or not st.has_min_max:
                # all-null row groups report no min/max: fine to skip
                # unless some other group has values we can't see — be
                # conservative only when num_values > 0 yet stats absent
                if st is not None and st.num_values == 0:
                    continue
                ok = False
                break
            mn, mx = st.min, st.max
            if not (isinstance(mn, _SUPPORTED) and isinstance(mx, _SUPPORTED)):
                ok = False
                break
            if isinstance(mn, bool) or isinstance(mx, bool):
                ok = False  # bools order fine but prune nothing useful
                break
            lo = mn if lo is None or mn < lo else lo
            hi = mx if hi is None or mx > hi else hi
        if ok and lo is not None:
            out[c] = [lo, hi]
    return out


def collect_footer_stats(
    spark: SparkSession,
    table_path: str,
    rel_files: list[str],
    cols: list[str],
) -> dict[str, dict[str, list]]:
    """rel file path -> {col: [min, max]} for every file, via footers.

    Small batches read on the driver (the files were just written, the
    footers are page-cache-warm); large batches fan the reads out as one
    Spark job over the file list so a 10k-file bulk load doesn't
    serialize footer I/O on the driver.
    """
    if not cols or not rel_files:
        return {}
    pairs = [(rel, os.path.join(table_path, rel)) for rel in rel_files]
    if len(pairs) <= FILE_STATS_PARALLEL_THRESHOLD:
        return {rel: _footer_one(ap, cols) for rel, ap in pairs}
    sc = spark.sparkContext
    n_slices = max(1, min(len(pairs) // 8, sc.defaultParallelism))
    got = (
        sc.parallelize(pairs, n_slices)
        .map(lambda p: (p[0], _footer_one(p[1], cols)))
        .collect()
    )
    return dict(got)


def _in_range(lo, hi, v) -> bool:
    try:
        return lo <= v <= hi
    except TypeError:
        return True  # incomparable literal: can't prune on it


def file_survives(stats: dict[str, list] | None, filters: list[Filter]) -> bool:
    """Can a file with these bounds contain a row matching ALL filters?

    Missing stats (no entry, unknown column, or cross-type comparison)
    keep the file — pruning must stay sound under schema evolution and
    type drift.
    """
    if not stats:
        return True
    for col, op, val in filters:
        bounds = stats.get(col)
        if bounds is None:
            continue
        lo, hi = bounds
        try:
            if op == "in":
                # batch point lookup: the file survives iff ANY listed
                # value could be present (non-null values only — IN
                # (NULL) matches nothing in SQL semantics)
                keep = any(
                    _in_range(lo, hi, v) for v in val if v is not None
                )
            elif op == "=":
                keep = lo <= val <= hi
            elif op == "<":
                keep = lo < val
            elif op == "<=":
                keep = lo <= val
            elif op == ">":
                keep = hi > val
            elif op == ">=":
                keep = hi >= val
            else:
                raise ValueError(f"unknown filter op {op!r}")
            if not keep:
                return False
        except TypeError:
            continue  # incomparable literal vs stored bounds: no pruning
    return True


def filters_to_expr(filters: list[Filter]):
    """The exact residual predicate — what makes pruning merely an
    optimization. Conjunction of all filters as a Column."""
    from pyspark.sql import functions as F

    expr = None
    for col, op, val in filters:
        c = F.col(col)
        if op == "in":
            vals = [v for v in val if v is not None]
            e = c.isin(vals) if vals else F.lit(False)
        elif op == "=":
            e = c == F.lit(val)
        elif op == "<":
            e = c < F.lit(val)
        elif op == "<=":
            e = c <= F.lit(val)
        elif op == ">":
            e = c > F.lit(val)
        elif op == ">=":
            e = c >= F.lit(val)
        else:
            raise ValueError(f"unknown filter op {op!r}")
        expr = e if expr is None else (expr & e)
    return expr


def validate_filters(filters: list[Filter]) -> None:
    for f in filters:
        if len(f) != 3 or f[1] not in _OPS:
            raise ValueError(
                f"filter must be (col, op, value) with op in {_OPS}: {f!r}"
            )
        if f[1] == "in" and not isinstance(f[2], (list, tuple, set)):
            raise ValueError(
                f"'in' filter value must be a list/tuple/set: {f!r}"
            )
