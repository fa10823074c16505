"""Seeded-random equivalence tests for the session's new operators.

Pure-Python oracles computed driver-side, so the check is independent of
Spark's own expression engine (the driver's DuckDB gate covers the SQL
side; this covers shapes SQL under-samples: random batch splits, random
probe/version interleavings, delete-heavy logs).
"""

import os
import random

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from datax_spark.operators.asof import asof_join
from datax_spark.operators.scd2 import create_scd2_table, scd2_apply


def _py_scd2(rows):
    """From-scratch SCD2 oracle in plain Python: lead(seq) per key."""
    by_key = {}
    for k, op, s, c in sorted(rows, key=lambda r: r[2]):
        by_key.setdefault(k, []).append((op, s, c))
    out = []
    for k, evs in by_key.items():
        for i, (op, s, c) in enumerate(evs):
            if op == "delete":
                continue
            nxt = evs[i + 1][1] if i + 1 < len(evs) else None
            out.append((k, c, s, nxt))
    return sorted(out)


def test_scd2_random_logs_random_splits(spark, tmp_path):
    rng = random.Random(42)
    for trial in range(3):
        n = 300
        rows = []
        for s in range(1, n + 1):
            k = f"k{rng.randrange(40)}"
            op = rng.choice(["insert", "update", "update", "delete"])
            rows.append((k, op, s, None if op == "delete" else f"v{s}"))
        # random ordered batch boundaries
        cuts = sorted(rng.sample(range(1, n), rng.randrange(1, 5))) + [n]
        t = create_scd2_table(
            spark,
            os.path.join(str(tmp_path), f"t{trial}"),
            StructType(
                [StructField("key", StringType()), StructField("content", StringType())]
            ),
            natural_key=["key"],
            bucket_key="key",
            num_buckets=4,
        )
        lo = 0
        for i, hi in enumerate(cuts):
            batch = [r for r in rows if lo < r[2] <= hi]
            scd2_apply(
                t,
                spark.createDataFrame(
                    batch, "key string, op string, seq long, content string"
                ),
                batch_id=i,
            )
            lo = hi
        got = sorted(
            tuple(r)
            for r in t.read()
            .select("key", "content", "_valid_from", "_valid_to")
            .collect()
        )
        assert got == _py_scd2(rows), f"trial {trial} cuts {cuts}"


def test_asof_random_vs_bruteforce(spark):
    rng = random.Random(7)
    versions = [
        (f"k{rng.randrange(20)}", rng.randrange(1000), f"v{i}")
        for i in range(400)
    ]
    # dedupe (key, t) collisions: keep the last occurrence, like a CDC
    # log where seq is unique per key
    seen = {}
    for k, t, v in versions:
        seen[(k, t)] = v
    versions = [(k, t, v) for (k, t), v in seen.items()]
    probes = [
        (f"k{rng.randrange(25)}", rng.randrange(1100), i) for i in range(600)
    ]
    p = spark.createDataFrame(probes, "key string, pt long, probe_id long")
    v = spark.createDataFrame(versions, "key string, vt long, val string")
    out = {
        r["probe_id"]: (r["asof_t"], r["asof_val"])
        for r in asof_join(p, v, ["key"], "pt", "vt").collect()
    }
    by_key = {}
    for k, t, val in versions:
        by_key.setdefault(k, []).append((t, val))
    for k in by_key:
        by_key[k].sort()
    for k, pt, pid in probes:
        cand = [(t, val) for t, val in by_key.get(k, []) if t <= pt]
        want = (cand[-1][0], cand[-1][1]) if cand else (None, None)
        assert out[pid] == want, (k, pt, pid)


def test_asof_both_directions_vs_pandas_merge_asof(spark):
    """Both as-of directions row-for-row against pandas merge_asof on
    randomized interleavings (the committed form of the verify drive
    the SURVEY evidence row cites)."""
    import pandas as pd

    from pyspark.sql import functions as F  # noqa: F401

    rng = random.Random(3)
    versions = sorted({(f"k{rng.randrange(30)}", rng.randrange(500)) for _ in range(300)})
    versions = [(k, t, f"v{k}:{t}") for k, t in versions]
    probes = [(f"k{rng.randrange(35)}", rng.randrange(550), i) for i in range(800)]
    p = spark.createDataFrame(probes, "key string, pt long, probe_id long")
    v = spark.createDataFrame(versions, "key string, vt long, val string")
    for direction in ("backward", "forward"):
        got = {
            r["probe_id"]: (r["asof_t"], r["asof_val"])
            for r in asof_join(p, v, ["key"], "pt", "vt", direction=direction).collect()
        }
        pdp = pd.DataFrame(probes, columns=["key", "pt", "probe_id"]).sort_values("pt")
        pdv = pd.DataFrame(versions, columns=["key", "vt", "val"]).sort_values("vt")
        m = pd.merge_asof(
            pdp, pdv, left_on="pt", right_on="vt", by="key", direction=direction
        )
        want = {
            int(r.probe_id): (
                (None if pd.isna(r.vt) else int(r.vt)),
                (None if pd.isna(r.vt) else r.val),
            )
            for r in m.itertuples()
        }
        assert got == want, direction


def _py_latest(events):
    """latest-wins state: {key: content} from (key, op, seq, content)."""
    best = {}
    for k, op, s, c in events:
        if k not in best or s > best[k][0]:
            best[k] = (s, op, c)
    return {k: c for k, (s, op, c) in best.items() if op != "delete"}


def _py_feed(prev_events, batch):
    """Per-commit change rows from a python replay: diff of the
    latest-wins states before/after the batch."""
    a = _py_latest(prev_events)
    b = _py_latest(prev_events + batch)
    out = []
    for k in set(a) | set(b):
        if k in a and k not in b:
            out.append((k, a[k], "delete"))
        elif k not in a and k in b:
            out.append((k, b[k], "insert"))
        elif a[k] != b[k]:
            out.append((k, a[k], "update_preimage"))
            out.append((k, b[k], "update_postimage"))
    return out


def test_change_feed_random_logs_vs_python_oracle(spark, tmp_path):
    """Seeded-random logs, random batch splits (tiny batches hit the
    restricted single-pass arm, big ones the unrestricted arm), random
    delete encodings, a mid-log compaction (rewrite-skip), checked
    against a from-scratch latest-wins python oracle — and the forced
    generic diff must agree row-for-row."""
    from datax_spark.lake.mor import MorTable
    from datax_spark.streaming.pipeline import PipelineConfig, apply_batch

    rng = random.Random(7)
    schema = StructType(
        [StructField("key", StringType()), StructField("content", StringType())]
    )
    for trial in range(3):
        enc = rng.choice(["inline", "eq"])
        n = 400
        rows = []
        for s in range(1, n + 1):
            k = f"k{rng.randrange(30)}"
            op = rng.choice(["insert", "update", "update", "delete"])
            rows.append((k, op, s, None if op == "delete" else f"v{s}"))
        cuts = sorted(rng.sample(range(50, n), rng.randrange(2, 5))) + [n]
        # one tiny trailing batch to force the restricted arm
        t = MorTable.create(
            spark, os.path.join(str(tmp_path), f"cf{trial}"), schema,
            key_cols=["key"], bucket_key="key", num_buckets=4,
        )
        compact_after = rng.randrange(len(cuts))
        versions = [t.current_version()]
        batches = []
        lo = 0
        for i, hi in enumerate(cuts):
            batch = [r for r in rows if lo < r[2] <= hi]
            batches.append(batch)
            apply_batch(
                t,
                spark.createDataFrame(
                    [(k, c, op, s) for k, op, s, c in batch],
                    "key string, content string, op string, seq long",
                ),
                i,
                PipelineConfig(delete_encoding=enc),
            )
            versions.append(t.current_version())
            if i == compact_after:
                t.compact()
            lo = hi

        def got_feed(a, b):
            return sorted(
                (r["key"], r["content"], r["_change_type"])
                for r in t.read_changes(versions[a], versions[b]).collect()
            )

        # full range + a random sub-range
        ranges = [(0, len(cuts))]
        if len(cuts) > 2:
            x = rng.randrange(len(cuts) - 1)
            ranges.append((x, rng.randrange(x + 1, len(cuts) + 1)))
        for a, b in ranges:
            want = sorted(
                ch
                for i in range(a, b)
                for ch in _py_feed(
                    [r for bt in batches[:i] for r in bt], batches[i]
                )
            )
            assert got_feed(a, b) == want, (trial, enc, a, b)
            orig = MorTable._appended_files
            MorTable._appended_files = lambda self, x, y: None
            try:
                assert got_feed(a, b) == want, ("generic", trial, enc, a, b)
            finally:
                MorTable._appended_files = orig
