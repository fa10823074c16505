"""Live OTS change-stream tail (sources/ots_stream.py): the
otsstreamreader state machine — shard lineage, iterator paging,
checkpoint resume — as a PySpark Python Data Source, applied through
the same fenced lake sink as every other changelog source. The fixture
is test_ots_live's wire server with the stream actions."""

from __future__ import annotations

import threading
from http.server import ThreadingHTTPServer

import pytest

from datax_spark.sources.ots_live import OtsClient
from datax_spark.sources.ots_stream import (
    OtsStreamReader,
    order_shards,
    sequence_info,
    tail_ots_stream_and_apply,
)
from test_ots_live import ACCESS_ID, ACCESS_KEY, _Handler, _Store

SCHEMA = ("repo string, path string, commit string, lang string, "
          "content string, op string, seq long, ts timestamp")


@pytest.fixture()
def otsd():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.store = _Store()
    _Handler.store = srv.store
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


def _client(srv):
    host, port = srv.server_address
    return OtsClient(f"http://{host}:{port}", ACCESS_ID, ACCESS_KEY, "inst")


def _endpoint(srv):
    host, port = srv.server_address
    return f"http://{host}:{port}"


def _seed_stream(store, n_keys=30, versions=3):
    """Deterministic change history: key j lives on shard s{j%3} (a real
    stream shards by pk range — one key never straddles shards); s1 is
    s0's child; every key gets `versions` events with increasing ts, and
    keys j%5==0 end with a DELETE."""
    store.create_stream("data", [("s0", None), ("s1", "s0"), ("s2", None)])
    expected = {}
    t = 1_000_000
    for v in range(versions):
        for j in range(n_keys):
            shard = f"s{j % 3}"
            pk = [("repo", f"r{j}"), ("path", "p"), ("commit", f"c{j}")]
            last = v == versions - 1
            if last and j % 5 == 0:
                store.stream_put(shard, pk, [], action="DELETE", ts=t)
                expected.pop((f"r{j}", "p", f"c{j}"), None)
            else:
                attrs = [("lang", "py"), ("content", f"v{v}-{j}")]
                store.stream_put(
                    shard, pk, attrs,
                    action="PUT" if v == 0 else "UPDATE", ts=t,
                )
                expected[(f"r{j}", "p", f"c{j}")] = f"v{v}-{j}"
            t += 1000
    return expected


def test_order_shards_parents_first():
    order = order_shards([("c", "a"), ("a", None), ("d", "b"),
                          ("b", "a"), ("e", "missing")])
    assert order.index("a") < order.index("c")
    assert order.index("a") < order.index("b") < order.index("d")
    assert set(order) == {"a", "b", "c", "d", "e"}


def test_stream_client_actions_and_pagination(otsd):
    store = otsd.store
    store.create_stream("data", [("s0", None)])
    for i in range(7):
        store.stream_put("s0", [("repo", f"r{i}")], [("content", str(i))],
                         ts=i)
    cl = _client(otsd)
    sid = cl.list_stream("data")
    assert sid == "stream_data"
    assert cl.describe_stream(sid) == [("s0", None)]
    it = cl.get_shard_iterator(sid, "s0")
    recs, nxt = cl.get_stream_records(it, limit=3)
    assert len(recs) == 3 and nxt is not None
    recs2, nxt2 = cl.get_stream_records(nxt, limit=100)
    assert len(recs2) == 4
    # live shard caught up: same token comes back, zero records
    recs3, nxt3 = cl.get_stream_records(nxt2, limit=100)
    assert recs3 == [] and nxt3 == nxt2
    # closed shard fully drained: no next iterator
    store.closed.add("s0")
    recs4, nxt4 = cl.get_stream_records(nxt2, limit=100)
    assert recs4 == [] and nxt4 is None
    a, pk, attrs, (ts, idx, epoch) = recs[1]
    assert a == "PUT" and pk == [("repo", "r1")]
    assert attrs == [("content", "1")] and (ts, idx) == (1, 1)
    assert sequence_info(epoch, ts, idx, "s0") == (
        f"{0:010d}_{1:020d}_{1:010d}_s0")


def test_simple_reader_modes_and_null_fill(otsd):
    store = otsd.store
    store.create_stream("data", [("s0", None)])
    store.stream_put("s0", [("repo", "r1")],
                     [("content", "x")], action="PUT", ts=10)
    store.stream_put("s0", [("repo", "r1")], [], action="DELETE", ts=20)
    opts = {"endpoint": _endpoint(otsd), "accessid": ACCESS_ID,
            "accesskey": ACCESS_KEY, "instancename": "inst",
            "datatable": "data"}
    r = OtsStreamReader(["repo", "lang", "content", "op", "seq"], dict(opts))
    rows, off = r.read(r.initialOffset())
    rows = list(rows)
    # null fill for the never-written 'lang' column
    # (SingleVerAndUpOnlyModeRecordSender.java:80 null arm)
    assert rows[0] == ("r1", None, "x", "insert", 10 * (1 << 20))
    assert rows[1][3] == "delete"
    assert off == {"s0": "s0|2"}
    # single-version-and-update-only mode drops the delete arm
    r2 = OtsStreamReader(["repo", "op"], dict(
        opts, mode="single_version_and_update_only"))
    rows2, _ = r2.read(r2.initialOffset())
    assert [t[1] for t in rows2] == ["insert"]
    # resumed read from the returned offset sees nothing new
    rows3, off3 = r.read(off)
    assert list(rows3) == [] and off3 == off


def test_tail_ots_stream_applies_and_resumes(spark, otsd, tmp_path):
    from pyspark.sql.types import StructType

    from datax_spark.lake.table import LakeTable

    store = otsd.store
    expected = _seed_stream(store, n_keys=30, versions=3)
    payload: StructType = spark.createDataFrame(
        [], "repo string, path string, commit string, lang string, "
            "content string").schema
    table = LakeTable.create(
        spark, str(tmp_path / "tbl"), payload,
        key_cols=["repo", "path", "commit"], bucket_key="repo",
        num_buckets=4)

    tail_ots_stream_and_apply(
        spark, str(tmp_path / "tbl"), _endpoint(otsd), ACCESS_ID,
        ACCESS_KEY, "inst", "data", SCHEMA,
        checkpoint_dir=str(tmp_path / "ckpt"), timeout_sec=120,
        max_records_per_shard=40,  # force multiple micro-batches
    )
    got = {(r.repo, r.path, r.commit): r.content
           for r in table.read().collect()}
    assert got == expected
    iter_calls_after_run1 = store.get_iterator_calls
    assert iter_calls_after_run1 == 3  # one per shard, first contact only

    # late events + a restart from the SAME checkpoint: the persisted
    # per-shard iterators resume mid-stream (CheckpointTimeTracker
    # analog) — GetShardIterator is never called again
    t = 9_000_000
    for j in (1, 2, 7):
        pk = [("repo", f"r{j}"), ("path", "p"), ("commit", f"c{j}")]
        store.stream_put(f"s{j % 3}", pk,
                         [("lang", "py"), ("content", f"late-{j}")],
                         action="UPDATE", ts=t)
        expected[(f"r{j}", "p", f"c{j}")] = f"late-{j}"
        t += 1000
    tail_ots_stream_and_apply(
        spark, str(tmp_path / "tbl"), _endpoint(otsd), ACCESS_ID,
        ACCESS_KEY, "inst", "data", SCHEMA,
        checkpoint_dir=str(tmp_path / "ckpt"), timeout_sec=120,
        max_records_per_shard=40,
    )
    got2 = {(r.repo, r.path, r.commit): r.content
            for r in table.read().collect()}
    assert got2 == expected
    assert store.get_iterator_calls == iter_calls_after_run1
