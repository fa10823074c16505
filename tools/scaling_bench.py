"""Two-level scaling benchmark: the north-rule N vs 4N evidence.

Protocol (each level runs in a FRESH process so JVM state can't leak):

1. Generate one shared change log (8M events, 2 segments, 1M keys,
   partitions=64) — both levels read the identical input files.
2. For each parallelism level (local[2] = N, local[8] = 4N):
   a. warm the JVM/JIT with a small full apply into a throwaway table;
   b. apply the shared log into a fresh lake table with an identical
      plan (fixed shuffle.partitions=32 at both levels);
   c. repeat REPS times; keep the best (noise on this shared sandbox
      host is +/-10-15% — best-of filters slow outliers, and the same
      rule is applied to both levels).
3. A pure-CPU control job (chained sha256 over 20M generated rows) runs
   at both levels to measure the platform's own scaling ceiling
   (frequency scaling + memory bandwidth), for context.

Writes SCALING.json and prints a summary. Usage:

    python tools/scaling_bench.py            # full run (~8-12 min)
    python tools/scaling_bench.py --reps 1   # quicker
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_EVENTS = 8_000_000
CONTENT_LEN = 80
LEVELS = [2, 8]  # N and 4N cores

_GEN = """
import sys, os
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_DRIVER_MEM"] = "16g"
from datax_spark.config import get_spark
from datax_spark.sources.changelog import generate_changelog, write_segments
spark = get_spark("gen", master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
write_segments(generate_changelog(spark, n_events={n}, n_keys={n}//8,
    events_per_segment={n}//2, content_max_len={clen}, partitions=64), {log!r})
"""

_APPLY = """
import sys, os, time, tempfile, json
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_DRIVER_MEM"] = "16g"
from datax_spark.config import get_spark
from datax_spark.lake.table import LakeTable
from datax_spark.streaming.pipeline import PipelineConfig, apply_segments
from datax_spark.sources.changelog import generate_changelog, write_segments
from pyspark.sql.types import StructType, StructField, StringType
spark = get_spark("scal", master="local[{cores}]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
schema = StructType([StructField(c, StringType())
                     for c in ["repo","path","commit","lang","content"]])
root = tempfile.mkdtemp(prefix="scal_{cores}_")
wl = os.path.join(root, "wlog")
write_segments(generate_changelog(spark, n_events=400_000, n_keys=50_000,
    events_per_segment=200_000, content_max_len={clen}, partitions=32), wl)
wt = LakeTable.create(spark, os.path.join(root, "wlake"), schema,
                      ["repo","path","commit"], "repo", 32)
apply_segments(spark, wt, wl, config=PipelineConfig())
table = LakeTable.create(spark, os.path.join(root, "lake"), schema,
                         ["repo","path","commit"], "repo", 32)
t0 = time.monotonic()
apply_segments(spark, table, {log!r}, config=PipelineConfig())
print("RESULT " + json.dumps({{"sec": time.monotonic() - t0}}))
"""

_CONTROL = """
import sys, os, time, json
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_DRIVER_MEM"] = "16g"
from datax_spark.config import get_spark
from pyspark.sql import functions as F
spark = get_spark("ctl", master="local[{cores}]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
def job(n):
    df = spark.range(0, n, numPartitions=32)
    h = F.sha2(F.concat(F.lit("x"), F.col("id").cast("string")), 256)
    for _ in range(4):
        h = F.sha2(F.concat(h, F.col("id").cast("string")), 256)
    return df.select(h.alias("h")).agg(
        F.count(F.when(F.substring("h", 1, 1) == "a", 1))).first()[0]
job(1_000_000)
t0 = time.monotonic(); job(20_000_000)
print("RESULT " + json.dumps({{"sec": time.monotonic() - t0}}))
"""

# Shuffle control: a 20M-row unique-key groupBy pushes every row through a
# hash exchange with zero map-side reduction — measures the BOX's shuffle
# (memory-bandwidth) scaling ceiling, which is the binding resource for a
# dedup-shaped workload on a single host. On a real cluster N->4N
# executors multiply that bandwidth; on one box the cores share it.
_SHUFFLE_CONTROL = """
import sys, os, time, json
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_DRIVER_MEM"] = "16g"
from datax_spark.config import get_spark
from pyspark.sql import functions as F
spark = get_spark("sctl", master="local[{cores}]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
def job(n):
    df = spark.range(0, n, numPartitions=32).select(
        F.xxhash64("id").alias("k"),
        F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("p"))
    return df.groupBy("k").agg(F.max("p")).count()
job(1_000_000)
t0 = time.monotonic(); job(20_000_000)
print("RESULT " + json.dumps({{"sec": time.monotonic() - t0}}))
"""


def run_py(code: str) -> float:
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=900
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])["sec"]
    raise RuntimeError(f"no RESULT line:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--events", type=int, default=N_EVENTS)
    ap.add_argument("--out", default=os.path.join(REPO, "SCALING.json"))
    args = ap.parse_args()

    log = tempfile.mkdtemp(prefix="scaling_log_")
    print(f"generating shared log ({args.events:,} events) ...", flush=True)
    subprocess.run(
        [sys.executable, "-c",
         _GEN.format(repo=REPO, n=args.events, clen=CONTENT_LEN, log=log)],
        check=True, capture_output=True, text=True, timeout=900,
    )
    os.sync()

    # Interleave levels across reps so a slow host window (shared-VM
    # noisy neighbors swing runs +/-30-60%) can't bias one level only.
    times: dict[int, list[float]] = {c: [] for c in LEVELS}
    for rep in range(args.reps):
        for cores in LEVELS:
            t = run_py(_APPLY.format(repo=REPO, cores=cores, clen=CONTENT_LEN, log=log))
            times[cores].append(t)
            print(f"local[{cores}] rep{rep}: apply={t:.1f}s "
                  f"({args.events / t:,.0f} ev/s)", flush=True)
    results: dict[str, dict] = {}
    for cores in LEVELS:
        ctl_t = run_py(_CONTROL.format(repo=REPO, cores=cores))
        sctl_t = run_py(_SHUFFLE_CONTROL.format(repo=REPO, cores=cores))
        print(f"local[{cores}] control: cpu={ctl_t:.1f}s "
              f"shuffle={sctl_t:.1f}s", flush=True)
        best = min(times[cores])
        results[str(cores)] = {
            "apply_sec_best": round(best, 2),
            "apply_sec_all": [round(t, 2) for t in times[cores]],
            "events_per_sec": round(args.events / best),
            "control_sec": round(ctl_t, 2),
            "shuffle_control_sec": round(sctl_t, 2),
        }

    lo, hi = results[str(LEVELS[0])], results[str(LEVELS[1])]
    factor = LEVELS[1] / LEVELS[0]
    eff = (hi["events_per_sec"] / lo["events_per_sec"]) / factor
    ctl_eff = (lo["control_sec"] / hi["control_sec"]) / factor
    sctl_eff = (lo["shuffle_control_sec"] / hi["shuffle_control_sec"]) / factor
    summary = {
        "events": args.events,
        "levels": LEVELS,
        "results": results,
        "scaling_efficiency": round(eff, 3),
        "platform_ceiling_efficiency": round(ctl_eff, 3),
        "shuffle_ceiling_efficiency": round(sctl_eff, 3),
        "normalized_efficiency": round(eff / ctl_eff, 3) if ctl_eff else None,
        "normalized_to_shuffle_ceiling": (
            round(eff / sctl_eff, 3) if sctl_eff else None
        ),
        "protocol": (
            "same input files, identical plan (shuffle.partitions=32), "
            "fresh process + JIT warmup per level, best-of-reps; cpu "
            "control = chained sha256 (compute ceiling), shuffle control "
            "= 20M-row unique-key groupBy (shuffle-bandwidth ceiling)"
        ),
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=2, sort_keys=True)
    print(json.dumps(summary, sort_keys=True))


if __name__ == "__main__":
    main()
