"""Resume a lost checkpoint from the table itself — file-changelog leg.

The Kafka tail already records its consumed end-offset map inside each
applied batch's fence entry (``sources/kafka_live.py``), so a lost
Structured Streaming checkpoint resumes from the table's own commits.
This module gives the FILE changelog tail (``tail_and_apply``) the same
story. The reference's analog is otsstreamreader's bespoke checkpoint
table (otsstreamreader/.../core/CheckpointTimeTracker.java:236-256) —
source position persisted next to the data it produced — re-expressed
as keys inside the lake table's own atomic commit (the Delta ``txn``
idempotent-writer pattern).

A file source's "offset" is the set of consumed files. Recording the
whole set per batch would bloat every manifest, so the recorded claim
is two integers that exploit the changelog's delivery order
(``write_segments`` stamps strictly increasing mtimes across segments
AND across each segment's part files; the file source with
``latestFirst=false`` consumes in mtime order):

    ``{"max_seg": M, "seen": C}``
    = "every segment below M is fully applied, and C part files of
       segment M are applied"

because a file of segment M arriving proves every earlier-mtime file —
i.e. all of segments < M — was delivered first. At resume time the
claim resolves against a live listing of ``seg=M``: the completed
segment is M when C covers all of M's files, else M-1, and the resumed
tail reads only segments beyond it. Under-counting is SAFE — the resume
re-reads a whole ordered suffix of the log, and replaying an ordered
suffix is idempotent under the seq replay-order contract (same reason
the batch fence can reject replays wholesale). Over-counting cannot
happen within one stream id: counts are seeded from the SAME stream's
persisted entry only (a resumed ``<sid>@v<version>`` stream re-reads
its max segment from scratch and so re-counts it from zero), and a
fence-rejected replay batch never writes its (over-counted) claim.

Zero extra Spark actions: the batch's file list comes from the
checkpoint's own source log (``sources/0/<logOffset>``), written
durably by the engine BEFORE foreachBatch runs — one O(files) driver
read per batch, exactly like the Kafka leg reads ``offsets/<id>``.
"""

from __future__ import annotations

import json
import os
import re
from collections import Counter

_SEG_RE = re.compile(r"[/\\]seg=(\d+)[/\\]")


def changelog_batch_files(checkpoint_dir: str, batch_id: int) -> list[str] | None:
    """The file paths the file source added in micro-batch ``batch_id``,
    read from the checkpoint (``offsets/<id>`` -> logOffset K ->
    ``sources/0/K`` or the ``K.compact`` rollup, entries filtered to
    batchId == K). Fails open (None) — position recording is a recovery
    optimization, never a reason to fail an apply."""
    try:
        with open(os.path.join(checkpoint_dir, "offsets", str(batch_id))) as f:
            lines = [ln for ln in f.read().splitlines() if ln.strip()]
        log_offset = json.loads(lines[-1])["logOffset"]
        src = os.path.join(checkpoint_dir, "sources", "0")
        path = os.path.join(src, str(log_offset))
        if not os.path.exists(path):
            path = os.path.join(src, f"{log_offset}.compact")
        with open(path) as f:
            entries = [
                json.loads(ln) for ln in f.read().splitlines()
                if ln.strip().startswith("{")
            ]
        return [
            e["path"] for e in entries if e.get("batchId") == log_offset
        ]
    except (OSError, ValueError, KeyError, IndexError, TypeError):
        return None


def advance_claim(prev: dict | None, files: list[str]) -> dict | None:
    """Fold one batch's file list into the stream's position claim.
    ``prev`` must be the SAME stream's persisted claim (see module
    docstring for why cross-stream seeding over-counts)."""
    segs = Counter(
        int(m.group(1)) for p in files for m in [_SEG_RE.search(p)] if m
    )
    if not segs:
        return prev
    bmax = max(segs)
    if prev is not None and prev["max_seg"] >= bmax:
        if prev["max_seg"] > bmax:  # late straggler below the claim line:
            return prev  # impossible under mtime order; keep the claim
        return {"max_seg": bmax, "seen": prev["seen"] + segs[bmax]}
    return {"max_seg": bmax, "seen": segs[bmax]}


def stream_claim(table, stream_id: str) -> dict | None:
    """The persisted position claim of ONE stream id (batch-recording
    seed — must not mix streams)."""
    entry = (table.snapshot().properties.get("streams") or {}).get(stream_id)
    return (entry or {}).get("changelog_pos")


def best_claim(table) -> dict | None:
    """The strongest position claim across ALL of the table's stream
    entries (resume reads these: each entry is an independent sound
    claim, the lexicographically largest one wins)."""
    best: dict | None = None
    for entry in (table.snapshot().properties.get("streams") or {}).values():
        pos = (entry or {}).get("changelog_pos")
        if pos and (
            best is None
            or (pos["max_seg"], pos["seen"]) > (best["max_seg"], best["seen"])
        ):
            best = pos
    return best


def _seg_files(log_dir: str, seg: int) -> int:
    try:
        return sum(
            1 for f in os.listdir(os.path.join(log_dir, f"seg={seg}"))
            if not f.startswith((".", "_"))
        )
    except OSError:
        return 0


def completed_segment(log_dir: str, claim: dict | None) -> int:
    """Resolve a claim to the highest FULLY-applied segment id (-1 when
    nothing is known — resume then reads the whole log, which the batch
    fence and seq dedup make merely wasteful, never wrong)."""
    if claim is None:
        return -1
    m = claim["max_seg"]
    return m if claim["seen"] >= max(1, _seg_files(log_dir, m)) else m - 1


def remaining_segments_glob(log_dir: str, completed: int) -> str | None:
    """A path (glob) covering only segments beyond ``completed``; None
    when the log has nothing newer (the caller skips the tail). The
    brace list is fixed at call time — the resume arm is a catch-up
    drain (availableNow); segments written AFTER it starts are picked up
    by the next call, exactly like any bounded tail."""
    try:
        segs = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(log_dir)
            if d.startswith("seg=") and d.split("=", 1)[1].isdigit()
        )
    except OSError:
        return None
    todo = [s for s in segs if s > completed]
    if not todo:
        return None
    if len(todo) == len(segs):
        return log_dir + "/seg=*"
    if len(todo) == 1:
        return log_dir + f"/seg={todo[0]}"
    return log_dir + "/seg={" + ",".join(str(s) for s in todo) + "}"
