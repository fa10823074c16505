"""Benchmark harness — prints ONE JSON line for the driver.

Measures, on local[$SPARK_GRAFT_CPUS] at $SPARK_GRAFT_SF_DIR:

1. the headline end-to-end CDC apply (deterministic generated changelog
   sized to the scale factor -> quarantine/dedup/fenced MERGE into a
   fresh lake table), reporting seconds and events/sec;
2. a representative set of the driver-contract queries (dedup families,
   ANN, text analysis, CDC dedup) timed individually.

Scaling evidence (N vs 4N cores, same input) lives in
tools/scaling_bench.py -> SCALING.md; this file is the per-round feedback
loop and must stay fast (~2-4 min).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Queries from __spark_entry__ worth timing (heavy / representative).
BENCH_QUERIES = [
    "cdc_latest_maxby",
    "cdc_apply_events",
    "cdc_lake_apply",
    "cdc_mor_apply",
    "cdc_eq_delete_apply",
    "cdc_patch_apply",
    "cdc_mor_patch_apply",
    "cdc_change_feed",
    "cdc_scan_prune",
    "cdc_scd2_apply",
    "cdc_overwrite_where",
    "cdc_asof_join",
    "cdc_delete_where",
    "cdc_update_where",
    "cdc_envelope_emit",
    "text_search",
    "text_search_sync",
    "text_lm_score",
    "text_search_bm25",
    "text_dup_scrub",
    "text_mixture",
    "text_quality_buckets",
    "text_shards",
    "text_quality_scalable",
    "text_recipe",
    "dedup_exact",
    "dedup_incremental",
    "dedup_corpus_quality",
    "dedup_lsh_pairs",
    "dedup_jaccard",
    "dedup_clusters",
    "dedup_corpus",
    "dedup_simhash",
    "dedup_embedding",
    "dedup_semantic",
    "cdc_sliding_counts",
    "cdc_snapshot_sync",
    "cdc_merge_into",
    "ann_topk",
    "ann_ivf_topk",
    "ann_ivf_multiprobe",
    "ann_ivf_trained",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "text_quality",
    "text_filter_pipeline",
    "text_langid",
    "text_repetition",
    "multimodal_decode",
    "multimodal_audio",
]


def sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def bench_cdc_apply(spark, sf: float) -> dict:
    from pyspark.sql.types import StringType, StructField, StructType

    from datax_spark.lake.table import LakeTable
    from datax_spark.sources.changelog import generate_changelog, write_segments
    from datax_spark.streaming.pipeline import PipelineConfig, apply_segments

    n_events = max(200_000, int(40_000_000 * sf))
    root = tempfile.mkdtemp(prefix="bench_cdc_")
    logdir = os.path.join(root, "log")
    os.makedirs(logdir)
    write_segments(
        generate_changelog(
            spark,
            n_events=n_events,
            n_keys=n_events // 8,
            events_per_segment=n_events // 2,
            content_max_len=80,
            partitions=2 * CPUS,
        ),
        logdir,
    )
    os.sync()
    schema = StructType(
        [StructField(c, StringType()) for c in
         ["repo", "path", "commit", "lang", "content"]]
    )
    # Warmup (JIT) on a small slice, then measure on a fresh table.
    wl = os.path.join(root, "wlog")
    write_segments(
        generate_changelog(
            spark, n_events=200_000, n_keys=25_000,
            events_per_segment=100_000, content_max_len=80,
            partitions=CPUS,
        ),
        wl,
    )
    wt = LakeTable.create(
        spark, os.path.join(root, "wlake"), schema,
        ["repo", "path", "commit"], "repo", 32,
    )
    apply_segments(spark, wt, wl, config=PipelineConfig())

    from datax_spark.lake.mor import MorTable

    # Best-of-N INTERLEAVED reps on fresh tables (same protocol as
    # tools/scaling_bench.py): this host's wall-clock swings ±15-60%
    # between sessions (NOTES.md), so a single timed apply is noise —
    # the r1->r2 headline "regression" was exactly that. Interleaving
    # COW/MOR within each rep keeps slow host phases from biasing one
    # path; best-of is the stable low-noise estimator for CPU-bound work.
    from datax_spark.operators.scd2 import apply_segments_scd2, create_scd2_table

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    cow_times: list[float] = []
    mor_times: list[float] = []
    eq_times: list[float] = []
    eqice_times: list[float] = []
    dvd_times: list[float] = []
    scd2_times: list[float] = []
    mor = eq = eqice = dvd = None
    for rep in range(reps):
        table = LakeTable.create(
            spark, os.path.join(root, f"lake{rep}"), schema,
            ["repo", "path", "commit"], "repo", 32,
        )
        t0 = time.monotonic()
        apply_segments(spark, table, logdir, config=PipelineConfig())
        cow_times.append(time.monotonic() - t0)

        mor = MorTable.create(
            spark, os.path.join(root, f"mor{rep}"), schema,
            ["repo", "path", "commit"], "repo", 32,
        )
        t0 = time.monotonic()
        apply_segments(spark, mor, logdir, config=PipelineConfig())
        mor_times.append(time.monotonic() - t0)

        # equality-delete encoding (Iceberg v2 delete files): deletes as
        # narrow key files instead of inline tombstone rows
        eq = MorTable.create(
            spark, os.path.join(root, f"eqmor{rep}"), schema,
            ["repo", "path", "commit"], "repo", 32,
        )
        t0 = time.monotonic()
        apply_segments(
            spark, eq, logdir, config=PipelineConfig(delete_encoding="eq")
        )
        eq_times.append(time.monotonic() - t0)

        # eq apply + CONTINUOUS Iceberg mirror (sync_iceberg on_commit
        # hook): the north-star loop — every batch lands as an Iceberg
        # snapshot with no compaction gate. The gap vs eq_apply_sec is
        # the mirror's total metadata+synth-delete overhead per run.
        from datax_spark.lake.iceberg import sync_iceberg

        eqice = MorTable.create(
            spark, os.path.join(root, f"eqice{rep}"), schema,
            ["repo", "path", "commit"], "repo", 32,
        )
        _t = eqice
        t0 = time.monotonic()
        apply_segments(
            spark, eqice, logdir,
            config=PipelineConfig(
                delete_encoding="eq",
                on_commit=[lambda m, _t=_t: sync_iceberg(_t)],
            ),
        )
        eqice_times.append(time.monotonic() - t0)

        # default (inline) apply + CONTINUOUS Delta mirror with deletion
        # vectors (sync_delta on_commit hook, no compaction gate): the
        # gap vs mor_apply_sec is the per-batch cost of the DV mask job
        # (changed buckets only, PLANS.md §15c) + log publish. The same
        # dead-rows job powers the Iceberg position-delete mirror, so
        # this one number covers both positional encodings.
        from datax_spark.lake.delta import sync_delta

        dvd = MorTable.create(
            spark, os.path.join(root, f"dvd{rep}"), schema,
            ["repo", "path", "commit"], "repo", 32,
        )
        _d = dvd
        t0 = time.monotonic()
        apply_segments(
            spark, dvd, logdir,
            config=PipelineConfig(
                on_commit=[lambda m, _d=_d: sync_delta(_d)],
            ),
        )
        dvd_times.append(time.monotonic() - t0)

        # SCD2 history mode over the same log: every event becomes an
        # interval (no dedup) — the write-amplified mode, interleaved in
        # the same rep protocol since round 4 (the r3 single-shot number
        # whipsawed with host noise like every other single-shot).
        scd2 = create_scd2_table(
            spark, os.path.join(root, f"scd2_{rep}"), schema,
            natural_key=["repo", "path", "commit"], bucket_key="repo",
            num_buckets=32,
        )
        t0 = time.monotonic()
        apply_segments_scd2(spark, scd2, logdir)
        scd2_times.append(time.monotonic() - t0)
    dt = min(cow_times)
    mor_dt = min(mor_times)
    eq_dt = min(eq_times)
    eqice_dt = min(eqice_times)
    dvd_dt = min(dvd_times)
    scd2_dt = min(scd2_times)
    # the mirror must actually have landed one Iceberg snapshot per batch
    from datax_spark.lake.delta import _current_delta_version
    from datax_spark.lake.iceberg import _load_metadata

    n_ice_snaps = len(_load_metadata(eqice.path)["snapshots"])
    # Resolved-read cost, pre- and post-compaction (the round-2 MOR read
    # path: base anti-joins broadcast delta keys, only deltas shuffle).
    t0 = time.monotonic()
    n_resolved = mor.read().count()
    mor_read_dt = time.monotonic() - t0
    mor.compact()
    t0 = time.monotonic()
    assert mor.read().count() == n_resolved
    mor_read_compacted_dt = time.monotonic() - t0
    t0 = time.monotonic()
    n_eq_resolved = eq.read().count()
    eq_read_dt = time.monotonic() - t0
    assert n_eq_resolved == n_resolved, (n_eq_resolved, n_resolved)
    return {
        "events": n_events,
        "apply_sec": round(dt, 2),
        "apply_sec_reps": [round(t, 2) for t in cow_times],
        "events_per_sec": round(n_events / dt),
        "mor_apply_sec": round(mor_dt, 2),
        "mor_apply_sec_reps": [round(t, 2) for t in mor_times],
        "mor_events_per_sec": round(n_events / mor_dt),
        "mor_read_sec": round(mor_read_dt, 2),
        "mor_read_postcompact_sec": round(mor_read_compacted_dt, 2),
        "eq_apply_sec": round(eq_dt, 2),
        "eq_apply_sec_reps": [round(t, 2) for t in eq_times],
        "eq_events_per_sec": round(n_events / eq_dt),
        "eq_read_sec": round(eq_read_dt, 2),
        "eqice_apply_sec": round(eqice_dt, 2),
        "eqice_apply_sec_reps": [round(t, 2) for t in eqice_times],
        "eqice_events_per_sec": round(n_events / eqice_dt),
        "eqice_snapshots": n_ice_snaps,
        "dvd_apply_sec": round(dvd_dt, 2),
        "dvd_apply_sec_reps": [round(t, 2) for t in dvd_times],
        "dvd_events_per_sec": round(n_events / dvd_dt),
        "dvd_delta_version": _current_delta_version(
            os.path.abspath(dvd.path)
        ),
        "scd2_apply_sec": round(scd2_dt, 2),
        "scd2_apply_sec_reps": [round(t, 2) for t in scd2_times],
        "scd2_events_per_sec": round(n_events / scd2_dt),
    }


def bench_ann_recall(spark, sf_dir: str) -> dict:
    """recall@10 vs brute force: trained IVF across the n_probes dial,
    sign-bucket at matched scanned fraction for contrast."""
    from datax_spark.functions.similarity import (
        brute_force_topk,
        ivf_topk,
        ivf_topk_trained,
        kmeans_fit,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).persist()
    cents = kmeans_fit(emb, k=8, iters=4)
    queries = [
        [float(x) for x in r["embedding"]]
        for r in emb.orderBy("vec_id").limit(5).collect()
    ]

    def recall(approx_df, exact_ids):
        got = {r["vec_id"] for r in approx_df.collect()}
        return len(got & exact_ids) / max(len(exact_ids), 1)

    out: dict = {}
    exacts = [
        {r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()}
        for q in queries
    ]
    for n_probes in (1, 2, 4):
        r = sum(
            recall(ivf_topk_trained(emb, q, cents, k=10, n_probes=n_probes), e)
            for q, e in zip(queries, exacts)
        ) / len(queries)
        out[f"trained_p{n_probes}"] = round(r, 3)
    r = sum(
        recall(ivf_topk(emb, q, k=10, n_bits=4, n_probes=4), e)
        for q, e in zip(queries, exacts)
    ) / len(queries)
    out["sign_bucket_p4of16"] = round(r, 3)
    emb.unpersist()
    return out


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    from datax_spark.config import get_spark

    import __spark_entry__ as E

    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=2 * CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    sf = sf_from_dir(SF_DIR)
    t_start = time.monotonic()

    cdc = bench_cdc_apply(spark, sf)

    # Per-query timings use the SAME interleaved best-of-reps protocol as
    # the headline applies (VERDICT r3 item 1: single-shot per-query
    # numbers whipsawed ±50% with host noise across driver rounds —
    # NOTES.md documents ±15-60% session swings). One warm pass (plan +
    # JIT), then N full passes over the whole list so a slow host phase
    # hits every query equally; best-of per query is the low-noise
    # estimator for CPU-bound work, and the raw reps are recorded.
    qs = E.queries()
    qreps = int(os.environ.get("SPARK_GRAFT_QUERY_REPS", "2"))
    for name in BENCH_QUERIES:
        qs[name](spark, SF_DIR).count()  # warm (plan + JIT)
    rep_times: dict[str, list[float]] = {n: [] for n in BENCH_QUERIES}
    for _rep in range(qreps):
        for name in BENCH_QUERIES:
            t0 = time.monotonic()
            qs[name](spark, SF_DIR).count()
            rep_times[name].append(round(time.monotonic() - t0, 3))
    times = {n: min(v) for n, v in rep_times.items()}

    recall = bench_ann_recall(spark, SF_DIR)

    total = round(time.monotonic() - t_start, 2)
    print(
        json.dumps(
            {
                "metric": "cdc_apply_sec",
                "value": cdc["apply_sec"],
                "unit": "sec",
                "total_sec": total,
                "queries": times,
                "queries_reps": rep_times,
                "sf": sf,
                "cdc": cdc,
                "ann_recall_at_10": recall,
                "cpus": CPUS,
            },
            sort_keys=True,
        )
    )


if __name__ == "__main__":
    main()
