"""Concurrent-writer commit rebase: two writers, apply-during-compact.

The engine-side analog of DataX taskgroup failover + odpswriter fencing
(core/.../taskgroup/TaskGroupContainer.java:162-241,
odpswriter/.../OdpsWriter.java:327-354): a commit whose base version was
superseded rebases automatically when the winner touched disjoint state
(append commits always; replace commits iff the replaced buckets are
untouched) and aborts with CommitConflict across a stream fence or an
overlapping replace.
"""

import threading

import pytest
from pyspark.sql import functions as F

from datax_spark.lake.mor import MorTable
from datax_spark.lake.table import CommitConflict, LakeTable
from datax_spark.oracle import state_fingerprint
from datax_spark.sources.changelog import generate_changelog
from datax_spark.streaming.pipeline import PipelineConfig, apply_batch

KEYS = ["repo", "path", "commit"]


def make_mor(spark, path, num_buckets=8):
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        [StructField(c, StringType()) for c in KEYS + ["lang", "content"]]
    )
    return MorTable.create(
        spark, path, schema, key_cols=KEYS, bucket_key="repo",
        num_buckets=num_buckets,
    )


def fingerprint(table) -> str:
    return state_fingerprint(
        table.read().select(*KEYS, "lang", "content").orderBy(*KEYS).toPandas()
    )


@pytest.fixture(scope="module")
def two_logs(spark):
    # distinct seeds -> disjoint key spaces (commit sha embeds the seed),
    # distinct seq ranges -> order-independent resolution
    a = generate_changelog(spark, n_events=4000, n_keys=500, seed=11,
                           events_per_segment=1000).persist()
    b = generate_changelog(spark, n_events=4000, n_keys=500, seed=22,
                           events_per_segment=1000)
    b = b.withColumn("seq", F.col("seq") + F.lit(1_000_000)).persist()
    yield a, b
    a.unpersist()
    b.unpersist()


def _apply_log(table, log, stream_id, n_segments=4):
    cfg = PipelineConfig(stream_id=stream_id)
    for i in range(n_segments):
        batch = log.filter(F.col("batch_file") == i)
        apply_batch(table, batch, batch_id=i, config=cfg)


def test_two_concurrent_streams_both_commit(spark, two_logs, tmp_path):
    """Two genuinely concurrent writer threads on different stream ids:
    both must commit (append rebase), and the final state must equal a
    serialized replay of the same two logs."""
    log_a, log_b = two_logs

    serial = make_mor(spark, str(tmp_path / "serial"))
    _apply_log(serial, log_a, "stream-a")
    _apply_log(serial, log_b, "stream-b")
    want = fingerprint(serial)

    conc = make_mor(spark, str(tmp_path / "conc"))
    errors: list[BaseException] = []

    def run(log, sid):
        try:
            _apply_log(conc, log, sid)
        except BaseException as e:  # noqa: BLE001 - surfaced below
            errors.append(e)

    threads = [
        threading.Thread(target=run, args=(log_a, "stream-a")),
        threading.Thread(target=run, args=(log_b, "stream-b")),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, f"concurrent writers raised: {errors}"
    assert conc.last_batch_id("stream-a") == 3
    assert conc.last_batch_id("stream-b") == 3
    assert fingerprint(conc) == want


def test_apply_during_compact(spark, two_logs, tmp_path):
    """A compaction racing live applies: both sides complete (the loser
    of each CAS rebases or re-runs) and no batch is lost or doubled."""
    log_a, log_b = two_logs

    serial = make_mor(spark, str(tmp_path / "serial2"))
    _apply_log(serial, log_a, "stream-a")
    _apply_log(serial, log_b, "stream-b")
    want = fingerprint(serial)

    table = make_mor(spark, str(tmp_path / "compacting"))
    _apply_log(table, log_a, "stream-a")  # seed deltas to fold
    errors: list[BaseException] = []
    done = threading.Event()

    def apply_side():
        try:
            _apply_log(table, log_b, "stream-b")
        except BaseException as e:  # noqa: BLE001
            errors.append(e)
        finally:
            done.set()

    def compact_side():
        try:
            while not done.is_set():
                try:
                    table.compact()
                except CommitConflict:
                    # retries exhausted under back-to-back applies: a
                    # legitimate outcome for a maintenance op — the next
                    # loop iteration IS the retry. State must stay
                    # intact either way (fingerprint assert below).
                    continue
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    threads = [
        threading.Thread(target=apply_side),
        threading.Thread(target=compact_side),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, f"apply-during-compact raised: {errors}"
    assert table.last_batch_id("stream-b") == 3
    assert fingerprint(table) == want
    # a final compact folds whatever the race left as deltas
    table.compact()
    assert not any(table.snapshot().deltas.values())
    assert fingerprint(table) == want


def test_replace_rebase_disjoint_buckets(spark, tmp_path):
    """Two replace commits from the SAME base on disjoint buckets: the
    loser rebases; both bucket sets land in the final snapshot."""
    table = make_mor(spark, str(tmp_path / "disjoint"), num_buckets=4)
    df = generate_changelog(spark, n_events=2000, n_keys=300, seed=7,
                            dirty_pct=0.0)
    apply_batch(table, df, batch_id=0)
    table.compact(max_files_per_bucket=0)  # force deltas -> base files
    base = table.current_version()
    snap = table.snapshot(base)
    buckets = sorted(int(b) for b in snap.buckets)
    assert len(buckets) >= 2
    b1, b2 = buckets[0], buckets[1]
    props = snap.properties

    def rewrite(bucket):
        df_b = table._read_files(
            table._abs_files(snap, [bucket], "base"), snap.schema
        )
        return table.write_bucket_data(
            df_b, props["num_buckets"], props["bucket_key"]
        )

    c1, c2 = rewrite(b1), rewrite(b2)
    s1 = table.commit_replace_buckets(base, c1, [b1])
    s2 = table.commit_replace_buckets(base, c2, [b2])  # rebases over s1
    assert s2.version == s1.version + 1
    assert s2.buckets[str(b1)] == s1.buckets[str(b1)]  # winner's files kept
    assert s2.buckets[str(b2)] != snap.buckets[str(b2)]
    # overlapping replace from the stale base must die
    with pytest.raises(CommitConflict):
        table.commit_replace_buckets(base, rewrite(b1), [b1])


def test_append_rebase_over_replace(spark, tmp_path):
    """An insert-only append whose base was superseded by a compaction
    rebases unconditionally (appends never read table content)."""
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        [StructField(c, StringType()) for c in KEYS + ["lang", "content"]]
    )
    table = LakeTable.create(
        spark, str(tmp_path / "append"), schema, key_cols=KEYS,
        bucket_key="repo", num_buckets=4,
    )
    df = generate_changelog(
        spark, n_events=1000, n_keys=200, seed=3, dirty_pct=0.0
    )
    apply_batch(table, df, batch_id=0)
    base = table.current_version()
    rows = spark.createDataFrame(
        [("zz/new", "n.py", "c9", "python", "fresh")],
        "repo string, path string, commit string, lang string, content string",
    )
    commit_rel = table.write_bucket_data(rows, 4, "repo")
    # supersede `base` with another committed batch, then force real
    # bucket rewrites via compact if anything fragmented
    df2 = generate_changelog(
        spark, n_events=500, n_keys=100, seed=4, dirty_pct=0.0
    ).withColumn("seq", F.col("seq") + F.lit(10_000))
    apply_batch(table, df2, batch_id=1)
    table.compact()
    assert table.current_version() > base
    snap = table.commit_append_buckets(
        base, commit_rel, stream_updates={"side": {"last_batch_id": 0}}
    )
    assert snap.version == table.current_version()
    got = table.read().filter(F.col("repo") == "zz/new").collect()
    assert len(got) == 1 and got[0]["content"] == "fresh"


def test_compact_cannot_fold_away_concurrent_delta(spark, tmp_path):
    """Deterministic replay of the race the threaded test caught: a
    compaction that resolved snapshot v must NOT commit once an apply
    appended a delta at v+1 to a bucket it is replacing — committing
    would silently drop that delta's rows. The replace commit must see
    the changed delta list and refuse to rebase."""
    table = make_mor(spark, str(tmp_path / "race"), num_buckets=2)
    df = generate_changelog(spark, n_events=500, n_keys=80, seed=5,
                            dirty_pct=0.0)
    apply_batch(table, df, batch_id=0)
    snap = table.snapshot()
    props = snap.properties
    buckets_with_deltas = sorted(int(b) for b in snap.deltas if snap.deltas[b])
    assert buckets_with_deltas
    # compaction's staged rewrite, resolved from snapshot v
    resolved = table._read_files(
        table._abs_files(snap, buckets_with_deltas, "base")
        + table._abs_files(snap, buckets_with_deltas, "delta"),
        snap.schema,
    )
    commit_rel = table.write_bucket_data(
        resolved, props["num_buckets"], props["bucket_key"]
    )
    # a concurrent apply lands first, adding deltas to the same buckets
    df2 = generate_changelog(spark, n_events=300, n_keys=80, seed=5,
                             dirty_pct=0.0)
    df2 = df2.withColumn("seq", F.col("seq") + F.lit(100_000))
    apply_batch(table, df2, batch_id=1)
    with pytest.raises(CommitConflict):
        table.commit_replace_buckets(
            snap.version, commit_rel, replaced_buckets=buckets_with_deltas
        )
    # and the public compact() retries against the NEW snapshot, so the
    # late delta survives into the compacted base
    want = fingerprint(table)
    table.compact(max_files_per_bucket=0)
    assert not any(table.snapshot().deltas.values())
    assert fingerprint(table) == want


def test_dml_during_stream_apply(spark, two_logs, tmp_path):
    """delete_where / update_where racing a live apply stream: every
    commit either lands (CAS rebase) or raises CommitConflict — never a
    silent loss — and the final state has no duplicate keys and no rows
    the DML + stream combination cannot explain."""
    a, _ = two_logs
    t = make_mor(spark, str(tmp_path / "dmlrace"))
    _apply_log(t, a, "a", n_segments=2)  # seed state

    errs: list[Exception] = []

    def apply_rest():
        try:
            cfg = PipelineConfig(stream_id="a")
            for i in range(2, 4):
                seg = a.filter(F.col("batch_file") == i)
                apply_batch(t, seg, i, cfg)
        except Exception as e:  # pragma: no cover - surfaced below
            errs.append(e)

    def dml():
        try:
            t.update_where(
                [("lang", "=", "python")], {"content": "upper(content)"}
            )
            t.delete_where([("lang", "=", "go")])
        except CommitConflict:
            pass  # legitimate loser outcome
        except Exception as e:  # pragma: no cover
            errs.append(e)

    th1 = threading.Thread(target=apply_rest)
    th2 = threading.Thread(target=dml)
    th1.start(); th2.start(); th1.join(); th2.join()
    assert not errs, errs
    out = t.read()
    # invariant 1: latest-wins left exactly one row per key
    assert out.count() == out.select(*KEYS).distinct().count()
    # invariant 2: the table still applies cleanly after the race
    more = a.filter(F.col("batch_file") == 3).withColumn(
        "seq", F.col("seq") + F.lit(10_000_000)
    )
    apply_batch(t, more, 4, PipelineConfig(stream_id="a"))
    out2 = t.read()
    assert out2.count() == out2.select(*KEYS).distinct().count()
