"""Incrementally-maintained inverted index (operators/posting_sync).

The posting index is a MorTable kept in sync with a document LakeTable
by replaying the doc table's row-level change feed into token
upserts/deletes. Reference analog: the full-load + incremental binlog
job pair users run to keep a search store fresh (e.g. mysqlreader ->
elasticsearchwriter full + increment jobs); here both are one operator
family with exactly-once refresh for free.

The invariant pinned throughout: after any sequence of doc commits and
refreshes, the index state EQUALS the from-scratch recompute
(distinct tokens of every live document) — incrementality must be
invisible in the answers.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from datax_spark.functions.text import tokens
from datax_spark.lake.table import LakeTable
from datax_spark.operators.posting_sync import (
    create_posting_index_table,
    posting_changes,
    refresh_posting_index,
    search_posting_index,
)
from datax_spark.streaming.pipeline import apply_batch

SCHEMA = StructType(
    [StructField("doc_id", StringType()), StructField("text", StringType())]
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, text string, op string, seq long"
    )


def _expected_postings(docs_table):
    """From-scratch recompute: (doc_id, token) for every live doc."""
    return sorted(
        (r["doc_id"], r["token"])
        for r in docs_table.read()
        .select(
            "doc_id",
            F.explode(F.array_distinct(tokens("text"))).alias("token"),
        )
        .collect()
    )


def _index_state(index):
    return sorted(
        (r["doc_id"], r["token"])
        for r in index.read().select("doc_id", "token").collect()
    )


def _make_pair(spark, tmp_path):
    docs = LakeTable.create(
        spark, str(tmp_path / "docs"), SCHEMA, key_cols=["doc_id"],
        bucket_key="doc_id", num_buckets=4,
    )
    index = create_posting_index_table(
        spark, str(tmp_path / "pidx"), docs, n_buckets=8
    )
    return docs, index


def test_index_tracks_docs_through_insert_update_delete(spark, tmp_path):
    docs, index = _make_pair(spark, tmp_path)

    apply_batch(docs, _events(spark, [
        ("d1", "alpha beta gamma", "insert", 1),
        ("d2", "beta delta", "insert", 2),
        ("d3", "epsilon", "insert", 3),
    ]), 0)
    assert refresh_posting_index(index, docs) is not None
    assert _index_state(index) == _expected_postings(docs)

    # update that drops some tokens and adds others; a delete; an insert
    apply_batch(docs, _events(spark, [
        ("d1", "alpha zeta", "update", 10),      # -beta -gamma +zeta
        ("d2", None, "delete", 11),              # all d2 tokens gone
        ("d4", "beta beta eta", "insert", 12),   # dup token collapses
    ]), 1)
    assert refresh_posting_index(index, docs) is not None
    got = _index_state(index)
    assert got == _expected_postings(docs)
    assert ("d1", "beta") not in got and ("d2", "beta") not in got
    assert ("d4", "beta") in got and got.count(("d4", "beta")) == 1

    # a refresh spanning MULTIPLE doc commits is one exact catch-up
    apply_batch(docs, _events(spark, [("d5", "theta", "insert", 20)]), 2)
    apply_batch(docs, _events(spark, [("d5", "iota", "update", 21)]), 3)
    assert refresh_posting_index(index, docs) is not None
    assert _index_state(index) == _expected_postings(docs)


def test_refresh_is_fenced_and_idempotent(spark, tmp_path):
    docs, index = _make_pair(spark, tmp_path)
    apply_batch(docs, _events(spark, [("d1", "alpha", "insert", 1)]), 0)
    m = refresh_posting_index(index, docs)
    assert m is not None
    before = _index_state(index)
    # no new doc commits -> no-op, no table commit
    v = index.current_version()
    assert refresh_posting_index(index, docs) is None
    assert index.current_version() == v and _index_state(index) == before
    # crash-replay analog: the fence IS the cursor, so a stale-cursor
    # re-apply of the same feed under the same batch id is fenced out
    from datax_spark.streaming.pipeline import PipelineConfig

    feed = docs.read_changes(1, docs.current_version())
    events = posting_changes(feed, ["doc_id"])
    res = apply_batch(
        index, events, batch_id=docs.current_version(),
        config=PipelineConfig(stream_id="posting_sync"),
    )
    assert res.applied is False
    assert _index_state(index) == before


def test_posting_changes_touch_only_changed_docs(spark, tmp_path):
    """Refresh cost is O(changed docs): the posting delta contains no
    event for an untouched document, and an update deletes EXACTLY the
    tokens the new text no longer contains."""
    docs, index = _make_pair(spark, tmp_path)
    apply_batch(docs, _events(spark, [
        ("d1", "alpha beta", "insert", 1),
        ("d2", "gamma", "insert", 2),
    ]), 0)
    refresh_posting_index(index, docs)
    v = docs.current_version()
    apply_batch(docs, _events(spark, [
        ("d1", "beta delta", "update", 10),
        ("d2", "gamma", "update", 11),  # no-op change: not in the feed
    ]), 1)
    feed = docs.read_changes(v, docs.current_version())
    delta = posting_changes(feed, ["doc_id"])
    rows = sorted(
        (r["doc_id"], r["token"], r["op"]) for r in delta.collect()
    )
    assert rows == [
        ("d1", "alpha", "delete"),   # only the token that went away
        ("d1", "beta", "update"),    # kept tokens re-upsert (idempotent)
        ("d1", "delta", "update"),
    ]


def test_update_to_null_text_drops_all_tokens(spark, tmp_path):
    docs, index = _make_pair(spark, tmp_path)
    apply_batch(docs, _events(spark, [("d1", "alpha beta", "insert", 1)]), 0)
    refresh_posting_index(index, docs)
    apply_batch(docs, _events(spark, [("d1", None, "update", 10)]), 1)
    refresh_posting_index(index, docs)
    assert _index_state(index) == []


def test_search_matches_recompute_and_prunes(spark, tmp_path):
    docs, index = _make_pair(spark, tmp_path)
    apply_batch(docs, _events(spark, [
        ("d1", "alpha beta gamma", "insert", 1),
        ("d2", "alpha beta", "insert", 2),
        ("d3", "alpha", "insert", 3),
        ("d4", "delta", "insert", 4),
    ]), 0)
    refresh_posting_index(index, docs)
    got = [
        (r["doc_id"], r["score"])
        for r in search_posting_index(
            index, ["alpha", "beta", "gamma"], k=3
        ).collect()
    ]
    assert got == [("d1", 3), ("d2", 2), ("d3", 1)]
    # the IN-list prunes token buckets at PLAN time: the scan's file set
    # is a strict subset of the table's
    snap = index.snapshot()
    total = len(set(snap.buckets) | set(snap.deltas))
    pruned = index.plan_scan([("token", "in", ["alpha"])])
    kept = len(pruned["buckets"])
    assert 0 < kept < total, (kept, total)


def test_search_stays_exact_after_compaction(spark, tmp_path):
    docs, index = _make_pair(spark, tmp_path)
    apply_batch(docs, _events(spark, [
        ("d1", "alpha beta", "insert", 1),
        ("d2", "alpha", "insert", 2),
    ]), 0)
    refresh_posting_index(index, docs)
    apply_batch(docs, _events(spark, [("d2", "beta", "update", 10)]), 1)
    refresh_posting_index(index, docs)
    index.compact()
    assert _index_state(index) == _expected_postings(docs)
    got = [
        (r["doc_id"], r["score"])
        for r in search_posting_index(index, ["alpha", "beta"], k=5).collect()
    ]
    assert got == [("d1", 2), ("d2", 1)]


def test_index_follows_a_live_stream_via_on_commit(spark, tmp_path):
    """The search index as a CDC CONSUMER of a live stream: an on_commit
    hook refreshes the posting index after every committed micro-batch,
    so search stays fresh while the tail runs — and the final index
    equals the from-scratch recompute."""
    from datax_spark.sources.changelog import generate_changelog, write_segments
    from datax_spark.streaming.pipeline import PipelineConfig, tail_and_apply
    from pyspark.sql.types import LongType

    log_dir = str(tmp_path / "log")
    log = generate_changelog(
        spark, n_events=3000, n_keys=400, events_per_segment=1000
    )
    write_segments(log, log_dir)

    event_schema = StructType([
        StructField("repo", StringType()), StructField("path", StringType()),
        StructField("commit", StringType()), StructField("lang", StringType()),
        StructField("content", StringType()), StructField("op", StringType()),
        StructField("seq", LongType()),
    ])
    docs = LakeTable.create(
        spark, str(tmp_path / "docs"),
        StructType([f for f in event_schema.fields if f.name not in ("op", "seq")]),
        key_cols=["repo", "path", "commit"], bucket_key="repo", num_buckets=4,
    )
    index = create_posting_index_table(
        spark, str(tmp_path / "pidx"), docs, n_buckets=8
    )
    refreshed = []

    def refresh_hook(metrics):
        m = refresh_posting_index(index, docs, text_col="content")
        refreshed.append((metrics.batch_id, m is not None))

    # timeout_sec must cover the FULL drain (3 micro-batches, each with
    # an index refresh = a lake commit + change-feed replay): the
    # default 120 s ran out under full-suite load and query.stop()
    # interrupted the last refresh mid-write — which the lake protocol
    # treats as a crash (staged files never publish, index stays at its
    # previous version), but this test asserts complete sync.
    tail_and_apply(
        spark, docs.path, log_dir, checkpoint_dir=str(tmp_path / "ckpt"),
        schema=event_schema,
        config=PipelineConfig(
            quarantine_dir=str(tmp_path / "quar"), on_commit=[refresh_hook]
        ),
        max_files_per_trigger=1,
        timeout_sec=600.0,
    )
    assert len(refreshed) >= 2 and all(did for _, did in refreshed)
    got = sorted(
        (r["repo"], r["path"], r["commit"], r["token"])
        for r in index.read().collect()
    )
    want = sorted(
        (r["repo"], r["path"], r["commit"], r["token"])
        for r in docs.read()
        .select(
            "repo", "path", "commit",
            F.explode(F.array_distinct(tokens("content"))).alias("token"),
        )
        .collect()
    )
    assert got == want and len(got) > 0
    # stream is drained: one more refresh is a fenced no-op
    assert refresh_posting_index(index, docs, text_col="content") is None
