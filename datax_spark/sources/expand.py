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

    Zero-padding follows the literal bounds (``[00-99]`` pads to 2), the
    same rule as TableExpandUtil.java:44-64. No range -> [pattern].
    """
    m = _RANGE.search(pattern)
    if not m:
        return [pattern]
    lo_s, hi_s = m.group(1), m.group(2)
    lo, hi = int(lo_s), int(hi_s)
    if hi < lo:
        raise ValueError(f"bad shard range in {pattern!r}")
    width = len(lo_s) if len(lo_s) == len(hi_s) and lo_s.startswith("0") else 0
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
