"""Sharded-table / partition-selection expansion.

DataX parity:
- ``TableExpandUtil.expandTableConf`` turns ``table_[0-99]`` into the
  concrete shard list (plugin-rdbms-util/.../util/TableExpandUtil.java:29-76);
- ``FilterUtil.filterByRegular`` selects partitions/paths by regex
  (common/.../util/FilterUtil.java:13-51).

On Spark a shard list becomes a multi-path ``load(*paths)`` (one scan,
native split planning) or a UNION ALL of per-shard reads; partition
regexes become partition-filter pushdown / ``pathGlobFilter``.
"""

from __future__ import annotations

import re

_RANGE = re.compile(r"\[(\d+)-(\d+)\]")


def expand_shards(pattern: str) -> list[str]:
    """``table_[0-99]`` -> ['table_0', ..., 'table_99'].

    Reference semantics (TableExpandUtil.java:44-64): zero-padding applies
    whenever the START bound has a leading zero (``[01-100]`` -> '01'..
    '100', padded to len('01')); reversed bounds are swapped, not
    rejected. No range -> [pattern].
    """
    m = _RANGE.search(pattern)
    if not m:
        return [pattern]
    lo_s, hi_s = m.group(1), m.group(2)
    lo, hi = int(lo_s), int(hi_s)
    if hi < lo:
        lo, hi = hi, lo
        lo_s, hi_s = hi_s, lo_s
    width = len(lo_s) if lo_s.startswith("0") and len(lo_s) > 1 else 0
    out = []
    for i in range(lo, hi + 1):
        num = str(i).zfill(width) if width else str(i)
        out.append(pattern[: m.start()] + num + pattern[m.end():])
    return out


def filter_by_regex(names: list[str], regex: str | None) -> list[str]:
    """Select names fully matching ``regex`` (FilterUtil semantics:
    Java ``matches()`` is a full match). None/empty regex -> all."""
    if not regex:
        return list(names)
    pat = re.compile(regex)
    return [n for n in names if pat.fullmatch(n)]


def union_shard_reads(spark, fmt: str, paths: list[str], **options):
    """One DataFrame over all shards: multi-path load (single scan node,
    so Catalyst plans splits/pruning across every shard at once)."""
    reader = spark.read.format(fmt)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(*paths)
