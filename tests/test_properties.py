"""Property-based tests (hypothesis) for the pure-python split/SQL utils.

These are the DataX utilities with exact-partitioning contracts — the
kind of edge cases (remainders, reversed bounds, zero-padding, empty
column sets) example-based tests under-sample.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from datax_spark.functions.similarity import probe_centroids
from datax_spark.operators.upsert_sql import (
    merge_from_staging_sql,
    upsert_sql,
)
from datax_spark.sources.expand import expand_shards
from datax_spark.sources.jdbc import pk_range_predicates


def _matches(pred: str, value) -> bool:
    """Evaluate a 'PK >= a AND PK <= b' / 'PK IS NULL' predicate."""
    if pred == "PK IS NULL":
        return value is None
    if value is None:
        return False
    parts = pred.split(" AND ")
    for p in parts:
        _, op, bound = p.split(" ", 2)
        b = int(bound)
        if op == ">=" and not value >= b:
            return False
        if op == "<=" and not value <= b:
            return False
    return True


@settings(max_examples=200, deadline=None)
@given(
    lo=st.integers(-1000, 1000),
    span=st.integers(0, 500),
    n=st.integers(1, 40),
)
def test_pk_range_predicates_exactly_partition(lo, span, n):
    """Every integer in [lo, hi] matches EXACTLY ONE range predicate
    (no gaps, no overlaps — RangeSplitUtil's contract), NULL matches
    only the residual slice."""
    hi = lo + span
    preds = pk_range_predicates("PK", lo, hi, n, include_null_slice=True)
    assert preds[-1] == "PK IS NULL"
    ranges = preds[:-1]
    assert len(ranges) == max(1, min(n, span + 1))
    for v in range(lo, hi + 1):
        assert sum(_matches(p, v) for p in ranges) == 1
    # boundary exclusivity
    assert sum(_matches(p, lo - 1) for p in ranges) == 0
    assert sum(_matches(p, hi + 1) for p in ranges) == 0
    assert sum(_matches(p, None) for p in preds) == 1
    # slice sizes differ by at most 1 (even split with remainder spread)
    sizes = [sum(_matches(p, v) for v in range(lo, hi + 1)) for p in ranges]
    assert max(sizes) - min(sizes) <= 1


@settings(max_examples=200, deadline=None)
@given(
    a=st.integers(0, 300),
    b=st.integers(0, 300),
    pad=st.booleans(),
)
def test_expand_shards_count_and_uniqueness(a, b, pad):
    lo, hi = min(a, b), max(a, b)
    width = len(str(lo)) + (1 if pad and lo > 0 else 0)
    lo_s = str(lo).zfill(width) if pad else str(lo)
    out = expand_shards(f"t_[{lo_s if a <= b else str(hi)}-{str(hi) if a <= b else lo_s}]")
    assert len(out) == hi - lo + 1
    assert len(set(out)) == len(out)
    assert out[0].startswith("t_") and out[-1].endswith(str(hi))


@settings(max_examples=100, deadline=None)
@given(
    cols=st.lists(
        st.text(alphabet="abcdefg_", min_size=1, max_size=6),
        min_size=1, max_size=6, unique=True,
    ),
    nkeys=st.integers(1, 3),
    mode=st.sampled_from(["insert", "replace", "update"]),
    dialect=st.sampled_from(["mysql", "postgresql", "generic", "derby"]),
)
def test_upsert_sql_mentions_every_column(cols, nkeys, mode, dialect):
    keys = cols[: min(nkeys, len(cols))]
    if dialect == "derby":
        sql = merge_from_staging_sql("T", "S", cols, mode, keys, dialect)
    else:
        sql = upsert_sql("T", cols, mode, keys, dialect)
    for c in cols:
        assert c in sql
    if dialect == "postgresql" and mode != "insert" and set(cols) == set(keys):
        assert "DO NOTHING" in sql  # no non-key columns to SET


@settings(max_examples=100, deadline=None)
@given(
    dims=st.integers(2, 8),
    k=st.integers(2, 10),
    n_probes=st.integers(1, 12),
    seed=st.integers(0, 10_000),
)
def test_probe_centroids_orders_and_bounds(dims, k, n_probes, seed):
    import random

    rnd = random.Random(seed)
    cents = [[rnd.uniform(-1, 1) for _ in range(dims)] for _ in range(k)]
    q = [rnd.uniform(-1, 1) for _ in range(dims)]
    probes = probe_centroids(q, cents, n_probes)
    assert 1 <= len(probes) <= min(max(1, n_probes), k)
    assert len(set(probes)) == len(probes)
    assert all(0 <= p < k for p in probes)

    def d2(i):
        return sum((a - b) ** 2 for a, b in zip(q, cents[i]))

    # first probe is the true nearest centroid
    assert d2(probes[0]) == min(d2(i) for i in range(k))
    # probes are sorted by distance
    dists = [d2(p) for p in probes]
    assert dists == sorted(dists)


_file_lists = st.dictionaries(
    st.sampled_from([str(i) for i in range(6)]),   # bucket ids
    st.lists(st.integers(0, 50).map(lambda i: f"f{i}"), max_size=8,
             unique=True),
    max_size=6,
)


@given(prev=_file_lists, new=_file_lists)
@settings(max_examples=200, deadline=None)
def test_diff_lists_reconstructs_new_state(prev, new):
    """Branch rebase soundness: applying (replaced, appended) from
    _diff_lists onto `prev` must reconstruct `new` EXACTLY for every
    bucket — otherwise a rebase publish would corrupt main."""
    from datax_spark.lake.table import LakeTable

    repl, app = LakeTable._diff_lists(prev, new)
    state = {b: list(files) for b, files in prev.items()}
    for b, files in repl.items():
        if files:
            state[b] = list(files)
        else:
            state.pop(b, None)
    for b, files in app.items():
        state[b] = state.get(b, []) + list(files)
    want = {b: files for b, files in new.items() if files or b in prev}
    got = {b: files for b, files in state.items() if files or b in prev}
    # normalize empties: a bucket absent vs present-with-[] is the same
    assert {b: f for b, f in got.items() if f} == {
        b: f for b, f in new.items() if f
    }
    # appends never overlap replacements
    assert not (set(repl) & set(app))
