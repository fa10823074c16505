"""Exact duplicate-substring detection (functions/text.duplicate_spans).

The contract pinned here: the Spark result EQUALS a brute-force Python
reference (count every k-gram, mark duplicated positions, merge
overlapping-or-touching [pos, pos+k) intervals per doc) on corpora with
cross-doc shares, within-doc repeats, unicode text, and short docs.
"""

from __future__ import annotations

from collections import Counter

from datax_spark.functions.text import duplicate_spans


def _ref(texts: dict[str, str], k: int, min_count: int = 2):
    counts: Counter[str] = Counter()
    for t in texts.values():
        for i in range(len(t) - k + 1):
            counts[t[i : i + k]] += 1
    out = []
    for did, t in sorted(texts.items()):
        marks = [
            i for i in range(len(t) - k + 1)
            if counts[t[i : i + k]] >= min_count
        ]
        spans: list[list[int]] = []
        for i in marks:
            if spans and i <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], i + k)
            else:
                spans.append([i, i + k])
        out += [(did, s, e) for s, e in spans]
    return sorted(out)


def _run(spark, texts: dict[str, str], k: int, **kw):
    df = spark.createDataFrame(
        sorted(texts.items()), "doc_id string, text string"
    )
    return sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_spans(df, k=k, **kw).collect()
    )


def test_cross_doc_share_yields_exact_maximal_span(spark):
    shared = "the quick brown fox jumps over the lazy dog"
    texts = {
        "d1": f"unique prefix one {shared} unique suffix alpha",
        "d2": f"completely different start {shared} and tail",
        "d3": "no duplicated content here at all whatsoever xyz",
    }
    got = _run(spark, texts, k=12)
    assert got == _ref(texts, 12)
    # d3 contributes nothing; d1/d2 spans cover the shared sentence
    assert not any(d == "d3" for d, _, _ in got)
    for did in ("d1", "d2"):
        s, e = next((s, e) for d, s, e in got if d == did)
        assert shared in texts[did][s:e]


def test_within_doc_repeat_and_touching_windows_merge(spark):
    texts = {
        "r1": "abcdefghij" * 3 + "tail",   # self-repeat: one merged span
        "r2": "zz abcdefghij zz",          # shares the unit with r1
    }
    got = _run(spark, texts, k=10)
    assert got == _ref(texts, 10)
    # r1's three repeats merge into ONE maximal span covering all 30 chars
    r1 = [(s, e) for d, s, e in got if d == "r1"]
    assert r1 == [(0, 30)]


def test_no_duplicates_and_short_docs_are_empty(spark):
    texts = {"a": "every doc entirely unique 123", "b": "nothing shared qq",
             "c": "tiny"}
    assert _run(spark, texts, k=15) == []


def test_spans_are_maximal_and_disjoint(spark):
    base = "SHAREDBLOCKONE........SHAREDBLOCKTWO"
    texts = {
        "x": f"aa {base} bb",
        "y": f"cc SHAREDBLOCKONE dd SHAREDBLOCKTWO ee",
    }
    got = _run(spark, texts, k=14)
    assert got == _ref(texts, 14)
    by_doc: dict[str, list[tuple[int, int]]] = {}
    for d, s, e in got:
        by_doc.setdefault(d, []).append((s, e))
    for spans in by_doc.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 > e1, "spans must be disjoint and non-touching"
        assert all(e - s >= 14 for s, e in spans)


def test_unicode_offsets_are_character_based(spark):
    shared = "日本語のテキストが重複しています完全に"
    texts = {"u1": f"前置き {shared} 後書き", "u2": f"別の文 {shared} 終"}
    got = _run(spark, texts, k=8)
    assert got == _ref(texts, 8)
    s, e = next((s, e) for d, s, e in got if d == "u1")
    assert shared in texts["u1"][s:e]


def test_min_count_three_requires_third_occurrence(spark):
    texts = {
        "a": "the repeated phrase here once",
        "b": "and the repeated phrase here twice",
        "c": "plus the repeated phrase here third",
    }
    pair_only = _run(spark, texts, k=20, min_count=3)
    assert pair_only == _ref(texts, 20, min_count=3)
    # the phrase occurs 3x, so it must survive min_count=3
    assert len(pair_only) == 3


def test_stride_spans_are_contained_in_exact_spans(spark):
    texts = {
        "s1": "padpadpad THE LONG SHARED RUN OF TEXT HERE padpad",
        "s2": "qq THE LONG SHARED RUN OF TEXT HERE zzzzzz",
    }
    exact = _run(spark, texts, k=10)
    strided = _run(spark, texts, k=10, stride=2)
    assert exact == _ref(texts, 10)
    for d, s, e in strided:
        assert any(
            d2 == d and s >= s2 and e <= e2 for d2, s2, e2 in exact
        ), "stride>1 spans must be a subset cover of the exact spans"


# ------------------------------------------------ scrub (the cut transform)
def _ref_scrub(texts: dict[str, str], k: int, min_count: int = 2):
    spans_by_doc: dict[str, list[tuple[int, int]]] = {}
    for d, s, e in _ref(texts, k, min_count):
        spans_by_doc.setdefault(d, []).append((s, e))
    out = []
    for did, t in sorted(texts.items()):
        cur, kept, cut = 0, [], 0
        for s, e in sorted(spans_by_doc.get(did, [])):
            kept.append(t[cur:s])
            cut += e - s
            cur = e
        kept.append(t[cur:])
        import math
        ratio = math.floor(cut / max(len(t), 1) * 1e6 + 0.5) / 1e6
        out.append((did, "".join(kept), cut, ratio))
    return out


def test_scrub_cuts_exactly_the_spans(spark):
    from datax_spark.functions.text import scrub_duplicate_spans

    shared = "the quick brown fox jumps over the lazy dog"
    texts = {
        "d1": f"keepme {shared} andme",
        "d2": f"other {shared} tail",
        "d3": "entirely unique text with no duplication at all",
    }
    df = spark.createDataFrame(
        sorted(texts.items()), "doc_id string, text string"
    )
    got = sorted(
        (r["doc_id"], r["clean_text"], r["dup_chars"], r["dup_ratio"])
        for r in scrub_duplicate_spans(df, k=12).collect()
    )
    assert got == _ref_scrub(texts, 12)
    by = {d: (c, n) for d, c, n, _ in got}
    # the untouched doc passes through whole with zero cut
    assert by["d3"] == (texts["d3"], 0)
    # scrubbed docs no longer contain the shared sentence
    assert shared not in by["d1"][0] and shared not in by["d2"][0]


def test_scrub_whole_doc_duplicate_empties_it(spark):
    from datax_spark.functions.text import scrub_duplicate_spans

    texts = {"a": "identical-document-text!", "b": "identical-document-text!"}
    df = spark.createDataFrame(
        sorted(texts.items()), "doc_id string, text string"
    )
    got = sorted(
        (r["doc_id"], r["clean_text"], r["dup_chars"], r["dup_ratio"])
        for r in scrub_duplicate_spans(df, k=24).collect()
    )
    assert got == _ref_scrub(texts, 24)
    assert all(c == "" and r == 1.0 for _, c, _, r in got)


def test_scrub_multiple_spans_keep_the_gaps(spark):
    from datax_spark.functions.text import scrub_duplicate_spans

    texts = {
        "x": "AABLOCKONEDUPLICATED middle kept BLOCKTWODUPLICATED zz",
        "y": "qq BLOCKONEDUPLICATED other BLOCKTWODUPLICATED",
    }
    df = spark.createDataFrame(
        sorted(texts.items()), "doc_id string, text string"
    )
    got = sorted(
        (r["doc_id"], r["clean_text"], r["dup_chars"], r["dup_ratio"])
        for r in scrub_duplicate_spans(df, k=16).collect()
    )
    assert got == _ref_scrub(texts, 16)
    x_clean = next(c for d, c, _, _ in got if d == "x")
    assert "middle kept" in x_clean
