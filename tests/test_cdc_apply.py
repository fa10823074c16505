"""End-to-end CDC apply correctness vs the sequential replay oracle."""

import os

import pytest
from pyspark.sql import functions as F

from datax_spark.lake.table import CommitConflict, LakeTable
from datax_spark.operators.dedup import dedup_latest, dedup_latest_window
from datax_spark.oracle import replay_oracle_pandas, state_fingerprint
from datax_spark.quality.quarantine import split_dirty
from datax_spark.sources.changelog import generate_changelog, write_segments
from datax_spark.streaming.pipeline import PipelineConfig, apply_batch, apply_segments

N_EVENTS = 8000
N_KEYS = 900


@pytest.fixture(scope="module")
def log_df(spark):
    df = generate_changelog(
        spark, n_events=N_EVENTS, n_keys=N_KEYS, events_per_segment=2000
    ).persist()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def log_dir(log_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("changelog"))
    write_segments(log_df, d)
    return d


def make_table(spark, path, num_buckets=8):
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        [
            StructField("repo", StringType()),
            StructField("path", StringType()),
            StructField("commit", StringType()),
            StructField("lang", StringType()),
            StructField("content", StringType()),
        ]
    )
    return LakeTable.create(
        spark,
        path,
        schema,
        key_cols=["repo", "path", "commit"],
        bucket_key="repo",
        num_buckets=num_buckets,
    )


def oracle_state(log_df):
    return replay_oracle_pandas(log_df.toPandas())


def engine_state_pdf(table):
    return (
        table.read()
        .select("repo", "path", "commit", "lang", "content")
        .orderBy("repo", "path", "commit")
        .toPandas()
    )


def assert_state_equal(table, oracle_pdf):
    got = engine_state_pdf(table)
    want = oracle_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    assert len(got) == len(want), f"row count {len(got)} != oracle {len(want)}"
    assert state_fingerprint(got) == state_fingerprint(want)


def _checksum(df):
    return df.agg(
        F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)"))
    ).collect()[0][0]


def test_generator_deterministic(spark, log_df):
    df2 = generate_changelog(
        spark, n_events=N_EVENTS, n_keys=N_KEYS, events_per_segment=2000, partitions=3
    )
    assert _checksum(log_df) == _checksum(df2)  # identical under any partitioning


def test_dedup_agg_matches_window(spark, log_df):
    clean, _ = split_dirty(log_df)
    a = dedup_latest(clean).orderBy("repo", "path", "commit").toPandas()
    b = dedup_latest_window(clean).orderBy("repo", "path", "commit").toPandas()
    c = (
        dedup_latest_window(clean, salt_buckets=4)
        .orderBy("repo", "path", "commit")
        .toPandas()
    )
    assert a.equals(b)
    assert a.equals(c)


def test_single_batch_apply_matches_oracle(spark, log_df, tmp_path):
    table = make_table(spark, str(tmp_path / "t1"))
    apply_batch(table, log_df, batch_id=0)
    assert_state_equal(table, oracle_state(log_df))


def test_segmented_apply_matches_oracle(spark, log_df, log_dir, tmp_path):
    table = make_table(spark, str(tmp_path / "t2"))
    metrics = apply_segments(spark, table, log_dir)
    assert len(metrics) == 4
    assert all(m.applied for m in metrics)
    assert_state_equal(table, oracle_state(log_df))


def test_replay_is_idempotent(spark, log_df, log_dir, tmp_path):
    """Applying the same batches twice must not change the state (fencing)."""
    table = make_table(spark, str(tmp_path / "t3"))
    apply_segments(spark, table, log_dir)
    v1 = table.current_version()
    fp1 = state_fingerprint(engine_state_pdf(table))
    again = apply_segments(spark, table, log_dir, start_after_batch=-1)
    assert all(not m.applied for m in again)  # all fenced no-ops
    assert table.current_version() == v1
    assert state_fingerprint(engine_state_pdf(table)) == fp1


def test_resume_from_checkpointed_batch(spark, log_df, log_dir, tmp_path):
    """Kill after 2 segments; a fresh driver resumes from the fence."""
    table = make_table(spark, str(tmp_path / "t4"))
    segs = sorted(os.listdir(log_dir))
    for i, s in enumerate(segs[:2]):
        apply_batch(table, spark.read.parquet(os.path.join(log_dir, s)), batch_id=i)
    # new "driver": LakeTable reopened from disk, resumes after last fence
    table2 = LakeTable(spark, table.path)
    assert table2.last_batch_id("default") == 1
    metrics = apply_segments(spark, table2, log_dir)
    assert [m.batch_id for m in metrics] == [2, 3]
    assert_state_equal(table2, oracle_state(log_df))


def test_delete_then_reinsert_within_batch(spark, tmp_path):
    rows = [
        ("o/r", "a.py", "c1", "python", "v1", "insert", 1),
        ("o/r", "a.py", "c1", "python", None, "delete", 2),
        ("o/r", "a.py", "c1", "python", "v3", "insert", 3),
        ("o/r", "b.py", "c2", "python", "x1", "insert", 4),
        ("o/r", "b.py", "c2", "python", None, "delete", 5),
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string, op string, seq long"
    )
    table = make_table(spark, str(tmp_path / "t5"))
    apply_batch(table, df, batch_id=0)
    state = engine_state_pdf(table)
    assert len(state) == 1
    assert state.iloc[0]["content"] == "v3"


def test_apply_batch_is_two_actions(spark, log_df, tmp_path):
    """The batch budget PLANS.md §7 claims: ONE narrow stats collect
    (which also carries the quality counters — no Observation, no second
    scan over the batch) + ONE wide write. Streaming shares this exact
    code path, so this pins the per-micro-batch action count too. The
    broadcast-exchange build of the anti-join key side runs as its own
    Spark job by design (a subjob of the write, not an extra scan)."""
    table = make_table(spark, str(tmp_path / "tjobs"))
    sc = spark.sparkContext
    # AQE splits one query into a job per materialized shuffle stage, so
    # job count only maps to actions with it off for the measurement.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc.setJobGroup("apply-batch-job-count", "count jobs")
    try:
        apply_batch(table, log_df, batch_id=0)
    finally:
        sc.setJobGroup(None, None)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    st = sc.statusTracker()
    kinds = {"stats": 0, "write": 0, "broadcast": 0}
    for j in st.getJobIdsForGroup("apply-batch-job-count"):
        info = st.getJobInfo(j)
        names = " ".join(
            si.name
            for s in (list(info.stageIds) if info else [])
            if (si := st.getStageInfo(s))
        )
        if "parquet at" in names:
            kinds["write"] += 1
        elif "collect at" in names:
            kinds["stats"] += 1
        else:
            kinds["broadcast"] += 1
    assert kinds["stats"] == 1, f"expected 1 stats job, got {kinds}"
    assert kinds["write"] == 1, f"expected 1 write job, got {kinds}"
    assert kinds["broadcast"] <= 1, f"unexpected extra jobs: {kinds}"


def test_commit_conflict_detected(spark, tmp_path):
    table = make_table(spark, str(tmp_path / "t6"))
    base = table.current_version()
    table.commit_replace_buckets(base, "", [], stream_updates={"s": {"last_batch_id": 0}})
    # rebase=False keeps the strict optimistic-concurrency behavior
    with pytest.raises(CommitConflict):
        table.commit_replace_buckets(
            base, "", [], stream_updates={"s": {"last_batch_id": 1}},
            rebase=False,
        )
    # a replayed batch id can never rebase past the fence
    with pytest.raises(CommitConflict):
        table.commit_replace_buckets(
            base, "", [], stream_updates={"s": {"last_batch_id": 0}}
        )
    # a NEWER batch on untouched buckets rebases cleanly
    snap = table.commit_replace_buckets(
        base, "", [], stream_updates={"s": {"last_batch_id": 1}}
    )
    assert snap.version == table.current_version()
    assert table.last_batch_id("s") == 1


def test_schema_evolution_additive(spark, tmp_path):
    base_rows = [("o/r", "a.py", "c1", "python", "v1", "insert", 1)]
    df1 = spark.createDataFrame(
        base_rows,
        "repo string, path string, commit string, lang string, content string, op string, seq long",
    )
    evolved_rows = [
        ("o/r", "b.py", "c2", "python", "v2", "insert", 2, 1234),
        ("o/r", "a.py", "c1", "python", "v1b", "update", 3, 99),
    ]
    df2 = spark.createDataFrame(
        evolved_rows,
        "repo string, path string, commit string, lang string, content string, op string, seq long, size_bytes long",
    )
    table = make_table(spark, str(tmp_path / "t7"))
    apply_batch(table, df1, batch_id=0)
    apply_batch(table, df2, batch_id=1)
    state = table.read().orderBy("path").toPandas()
    assert "size_bytes" in state.columns
    assert state["size_bytes"].tolist() == [99, 1234]
    assert state["content"].tolist() == ["v1b", "v2"]
