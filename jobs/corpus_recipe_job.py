"""spark-submit entry for the end-to-end training-data recipe.

The operational twin of the `text_recipe` driver query: one CLI runs
exact dedup -> corpus bigram-LM quality scoring -> CCNet head/middle
keep (tail drops) -> optional token-budget domain mixture -> shard
export, and prints ONE JSON line of stage counts (machine-consumable,
like lake_maintenance_job).

    python jobs/corpus_recipe_job.py \
        --docs /data/documents.parquet --out /data/shards \
        --shard-tokens 100000 [--head 0.1 --middle 0.4] \
        [--budgets '{"web": 2000000, "code": 1000000}'] \
        [--text-col text --id-col doc_id --lang-col lang \
         --strata-col source] [--skip-dedup] [--skip-quality]

Every stage is the library operator the driver queries pin against
DuckDB oracles (functions/text.py); the CLI only composes them. At
100 TB each stage keeps its documented shape: dedup is one
digest-keyed shuffle, the LM fit is a vocab-bounded integer agg, the
bucket cut is one per-language sort, the mixture filter fuses into the
scan, and the shard placement is a distributed prefix sum + one
repartition(shard_id) write.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--docs", required=True, help="input parquet path/dir")
    p.add_argument("--out", required=True, help="shard output directory")
    p.add_argument("--shard-tokens", type=int, required=True)
    p.add_argument("--head", type=float, default=0.1)
    p.add_argument("--middle", type=float, default=0.4)
    p.add_argument("--budgets", default=None,
                   help="JSON {stratum: token_budget}; omit to skip mixing")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--lang-col", default="lang")
    p.add_argument("--strata-col", default="source")
    p.add_argument("--skip-dedup", action="store_true")
    p.add_argument("--skip-quality", action="store_true")
    p.add_argument("--dup-scrub", type=int, metavar="K", default=None,
                   help="also CUT duplicated substrings (Lee et al. "
                        "2022): k-gram length for the corpus-wide span "
                        "detection; runs after exact dedup")
    p.add_argument("--master", default=None,
                   help="override spark master (default: local[all cores])")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from pyspark.sql import functions as F

    from datax_spark.config import get_spark
    from datax_spark.functions.dedup import exact_dedup_reps
    from datax_spark.functions.text import (
        bigram_lm_fit,
        bigram_lm_scores,
        mixture_fit,
        mixture_sample,
        quality_buckets,
        write_shards,
    )

    spark = get_spark("corpus-recipe", master=args.master or "local[*]")
    docs = spark.read.parquet(args.docs)
    counts: dict[str, object] = {"docs_in": docs.count()}

    # Each materializing stage persists: the stage counts, the two fit
    # collects, and the shard write would otherwise re-execute the whole
    # upstream DAG (dedup window, scrub joins, LM-score joins) once per
    # action — ~6x the job at scale. Job-scoped caches; the process
    # exits after the write.
    if not args.skip_dedup:
        docs = exact_dedup_reps(
            docs, text_col=args.text_col, id_col=args.id_col
        ).persist()
        counts["reps"] = docs.count()

    if args.dup_scrub is not None:
        from datax_spark.functions.text import scrub_duplicate_spans

        scrubbed = scrub_duplicate_spans(
            docs, k=args.dup_scrub, text_col=args.text_col,
            id_col=args.id_col,
        )
        docs = (
            docs.drop(args.text_col)
            .join(
                scrubbed.select(
                    args.id_col,
                    F.col("clean_text").alias(args.text_col),
                    "dup_chars",
                ),
                args.id_col,
            )
        )
        docs = docs.persist()
        counts["scrubbed_chars"] = int(
            docs.agg(F.sum("dup_chars")).first()[0] or 0
        )
        docs = docs.drop("dup_chars")

    if not args.skip_quality:
        qb = quality_buckets(
            docs,
            bigram_lm_scores(
                docs, bigram_lm_fit(docs, text_col=args.text_col),
                text_col=args.text_col, id_col=args.id_col,
            ),
            head=args.head, middle=args.middle,
            lang_col=args.lang_col, id_col=args.id_col,
        )
        docs = docs.join(
            qb.filter(F.col("bucket") != "tail").select(args.id_col),
            args.id_col,
        ).persist()
        counts["kept"] = docs.count()

    if args.budgets:
        budgets = {k: int(v) for k, v in json.loads(args.budgets).items()}
        if not budgets:
            # an empty whitelist would silently drop the WHOLE corpus
            raise ValueError(
                "--budgets is an empty map: every domain would get ppm 0 "
                "and zero documents would ship; omit the flag to skip "
                "mixing, or list the domains to keep"
            )
        ppm = mixture_fit(
            docs, budgets, strata_col=args.strata_col,
            text_col=args.text_col,
        )
        docs = docs.join(
            mixture_sample(
                docs, ppm, strata_col=args.strata_col,
                text_col=args.text_col, id_col=args.id_col,
            ).select(args.id_col),
            args.id_col,
        ).persist()
        counts["mixture_ppm"] = ppm
        counts["mixed"] = docs.count()

    stats = write_shards(
        docs, args.out, args.shard_tokens,
        text_col=args.text_col, id_col=args.id_col,
    )
    counts["shards"] = len(stats)
    counts["docs_out"] = sum(s["docs"] for s in stats)
    counts["tokens_out"] = sum(s["tokens"] for s in stats)
    counts["shard_stats"] = stats[:16]
    print(json.dumps(counts, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
