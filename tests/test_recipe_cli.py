"""corpus_recipe_job CLI: the end-to-end recipe as one spark-submit
entry — stage counts in one JSON line, shards on disk, placement equal
to pack_shards' contract."""

import json
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"
    ),
)
import corpus_recipe_job  # noqa: E402

DOCS_PQ = "/root/testdata/sf0.001/documents.parquet"


def _run(capsys, *argv):
    rc = corpus_recipe_job.main(list(argv))
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert rc == 0, out
    return json.loads(out)


def test_recipe_cli_end_to_end(spark, tmp_path, capsys):
    out_dir = str(tmp_path / "shards")
    budgets = {"src0": 200, "src1": 400, "src2": 10**9,
               "src3": 150, "src4": 350, "src5": 10**9}
    res = _run(
        capsys,
        "--docs", DOCS_PQ, "--out", out_dir, "--shard-tokens", "1000",
        "--budgets", json.dumps(budgets),
    )
    # stage counts shrink monotonically through the funnel
    assert res["docs_in"] == 500
    assert res["reps"] <= res["docs_in"]
    assert 0 < res["kept"] <= res["reps"]
    assert 0 < res["mixed"] <= res["kept"]
    assert res["docs_out"] == res["mixed"]
    # whitelist: unlisted sources got ppm 0 implicitly (absent from map)
    assert set(res["mixture_ppm"]) == set(budgets)

    back = spark.read.parquet(out_dir)
    assert back.count() == res["docs_out"]
    # placement contract: every doc's start offset falls inside its
    # shard's token range (greedy-by-start)
    bad = back.filter(
        (F.col("start_tok") < F.col("shard_id") * 1000)
        | (F.col("start_tok") >= (F.col("shard_id") + 1) * 1000)
    ).count()
    assert bad == 0
    # directory-per-shard layout
    dirs = sorted(
        d for d in os.listdir(out_dir) if d.startswith("shard_id=")
    )
    assert len(dirs) == res["shards"] >= 1
    # token accounting: per-shard sums from the JSON tile the total
    assert sum(s["tokens"] for s in res["shard_stats"]) <= res["tokens_out"]
    total = back.agg(F.sum("n_tokens")).first()[0]
    assert total == res["tokens_out"]


def test_recipe_cli_skip_flags(spark, tmp_path, capsys):
    out_dir = str(tmp_path / "raw_shards")
    res = _run(
        capsys,
        "--docs", DOCS_PQ, "--out", out_dir, "--shard-tokens", "5000",
        "--skip-dedup", "--skip-quality",
    )
    # no dedup/quality/mixture: every input doc ships
    assert "reps" not in res and "kept" not in res and "mixed" not in res
    assert res["docs_out"] == res["docs_in"] == 500
    back = spark.read.parquet(out_dir)
    # the full corpus tiles gaplessly from offset 0
    starts = sorted(
        (r["start_tok"], r["n_tokens"]) for r in back.collect()
    )
    pos = 0
    for s, n in starts:
        assert s == pos
        pos += n
    assert pos == res["tokens_out"]


def test_recipe_cli_rejects_bad_budgets(tmp_path):
    with pytest.raises(ValueError):
        corpus_recipe_job.main([
            "--docs", DOCS_PQ, "--out", str(tmp_path / "x"),
            "--shard-tokens", "1000", "--budgets", '{"src0": -5}',
        ])


def test_recipe_cli_dup_scrub_stage(spark, tmp_path, capsys):
    out_dir = str(tmp_path / "scrubbed_shards")
    res = _run(
        capsys,
        "--docs", DOCS_PQ, "--out", out_dir, "--shard-tokens", "5000",
        "--dup-scrub", "30", "--skip-quality",
    )
    # the synthetic corpus HAS cross-doc duplicated 30-gram spans
    assert res["scrubbed_chars"] > 0
    # scrubbing shrinks the token stream vs the raw export
    raw = _run(
        capsys,
        "--docs", DOCS_PQ, "--out", str(tmp_path / "raw2"),
        "--shard-tokens", "5000", "--skip-quality",
    )
    assert res["tokens_out"] < raw["tokens_out"]
    assert res["docs_out"] == raw["docs_out"]  # scrub cuts chars, not docs


def test_recipe_cli_rejects_empty_budgets(tmp_path):
    """--budgets '{}' would give every domain ppm 0 and silently ship
    zero documents; the CLI must refuse instead."""
    with pytest.raises(ValueError, match="empty map"):
        corpus_recipe_job.main([
            "--docs", DOCS_PQ, "--out", str(tmp_path / "x"),
            "--shard-tokens", "1000", "--budgets", "{}",
        ])
