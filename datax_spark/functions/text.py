"""Text-analysis operators for large-scale training-data pipelines.

Everything here is a pure Column expression over built-in
``pyspark.sql.functions`` — JVM-side, whole-stage codegen, zero Python in
the hot path — so a 100 TB `documents` scan stays a single vectorized
parquet-scan + project stage with full column pruning.

Design constraint: every function must be reproducible by an ANSI-SQL
oracle (DuckDB), so hashing uses md5 (not xxhash64, which DuckDB lacks)
and tokenization is a plain character-class regex.

DataX parity: the reference's only text ops are the transformer chain
(SURVEY.md §2.3); this module is the "beyond the reference" surface a
training-data pipeline needs (lang-ID, quality, tokens, fingerprints).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"
# GPT2-ish pre-tokenizer classes: letter runs, single digits, punct runs.
BPE_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]+"

# Marker stopwords per language for the n-gram/stopword lang-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    # Latin-script marker stopwords (ASCII only — the token regex is
    # [a-z0-9]+, so accented markers would never match). Dict order is
    # the tie-break priority; the first five predate round 4.
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "que", "y", "en"),
    "it": ("il", "di", "che", "la", "per"),
    "pt": ("uma", "para", "com", "mais", "ele"),
    "nl": ("het", "een", "niet", "aan", "ook"),
    "sv": ("och", "att", "det", "som", "inte"),
    "pl": ("nie", "jest", "sie", "czy", "jak"),
    "id": ("yang", "dan", "untuk", "dengan", "ini"),
}
STOPWORDS = LANG_MARKERS["en"]

# Non-Latin scripts: a language wins outright when its script's
# characters exceed SCRIPT_MIN_RATIO of the non-whitespace characters —
# marker stopwords can't see these languages at all (the token regex is
# ASCII). Order matters: Japanese text mixes kana + Han, so kana must
# test BEFORE Han or ja classifies as zh. (codepoint lo, hi) pairs keep
# the Spark and DuckDB regex classes literally identical.
SCRIPT_RANGES: dict[str, tuple[int, int]] = {
    "ja": (0x3040, 0x30FF),  # hiragana + katakana
    "ko": (0xAC00, 0xD7AF),  # hangul syllables
    "zh": (0x4E00, 0x9FFF),  # CJK unified (after ja/ko)
    "ru": (0x0400, 0x04FF),  # cyrillic
    "ar": (0x0600, 0x06FF),  # arabic
    "he": (0x0590, 0x05FF),  # hebrew
    "el": (0x0370, 0x03FF),  # greek
    "hi": (0x0900, 0x097F),  # devanagari
    "th": (0x0E00, 0x0E7F),  # thai
}
SCRIPT_MIN_RATIO = 0.3


def script_class(lang: str) -> str:
    """The regex character class for a script language — literal
    endpoint characters, valid verbatim in Java regex AND RE2/DuckDB."""
    lo, hi = SCRIPT_RANGES[lang]
    return f"[{chr(lo)}-{chr(hi)}]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def round6(col: Column) -> Column:
    """Engine-portable 6-dp rounding: floor(x*1e6 + 0.5)/1e6.

    F.round / DuckDB round() disagree on half-way doubles (different
    tie-breaking on the decimal expansion); this formula is plain IEEE
    double arithmetic, so identical input bits give identical output in
    every engine — required for oracle value-hash equality.
    """
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


def h32(col: Column | str, seed: str) -> Column:
    """Deterministic 32-bit hash both Spark and DuckDB can compute.

    ``int(md5(seed || '|' || s)[:8], 16)`` — the seed gives a cheap hash
    *family* for MinHash. md5 runs JVM-side (codegen); conv() parses hex.
    """
    hexs = F.substring(F.md5(F.concat(F.lit(seed + "|"), _c(col))), 1, 8)
    return F.conv(hexs, 16, 10).cast("long")


def tokens(col: Column | str) -> Column:
    """Lower-cased alnum tokens: regexp_extract_all('[a-z0-9]+')."""
    return F.regexp_extract_all(F.lower(_c(col)), F.lit(TOKEN_RE), 0)


def token_count_ws(col: Column | str) -> Column:
    """Whitespace token count; empty/blank string counts 0."""
    t = F.trim(_c(col))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def token_count_bpe(col: Column | str) -> Column:
    """BPE-ish pre-token count (letter runs / digits / punct runs)."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(BPE_RE), 0))


def normalize_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting: lower, collapse ws, trim."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def fingerprint(col: Column | str) -> Column:
    """64-bit-ish document fingerprint: first 16 hex of sha256(normalized)."""
    return F.substring(F.sha2(normalize_text(col), 256), 1, 16)


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> (empty when < n tokens).

    Built from sequence+transform+slice so it stays one codegen stage; the
    guard avoids sequence(0, negative) producing a descending range.
    """
    t = tokens(col)
    sz = F.size(t)
    grams = F.transform(
        F.sequence(F.lit(1), sz - F.lit(n - 1)),
        lambda i: F.concat_ws(" ", F.slice(t, i, n)),
    )
    return F.when(sz >= n, grams).otherwise(F.array().cast("array<string>"))


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Marker-stopword hit count per language (with multiplicity)."""
    t = tokens(col)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(t, lambda x: F.array_contains(arr, x)))
    return out


def _marker_alternation() -> tuple[str, dict[str, list[int]]]:
    """One combined marker regex + marker -> language-index map.

    The alternation matches exactly the tokens the ``[a-z0-9]+``
    tokenizer would emit (lookarounds pin a maximal alnum run), so
    counting its matches equals counting marker-equal tokens. A marker
    shared by several languages ("la" fr+it) maps to ALL of them.
    """
    langs = list(LANG_MARKERS)
    marker_langs: dict[str, list[int]] = {}
    for i, lang in enumerate(langs):
        for m in LANG_MARKERS[lang]:
            marker_langs.setdefault(m, []).append(i)
    alt = "|".join(sorted(marker_langs, key=len, reverse=True))
    return f"(?<![a-z0-9])(?:{alt})(?![a-z0-9])", marker_langs


def lang_predict(col: Column | str) -> Column:
    """Language prediction, three arms (round 4 widened it from 5 Latin
    languages with an 'en' bias to 19 languages + an explicit unknown):

    1. script vote: a non-Latin script covering > SCRIPT_MIN_RATIO of
       the non-whitespace characters wins outright (first match in
       SCRIPT_RANGES order — kana before Han so Japanese beats zh);
    2. marker argmax over LANG_MARKERS, ties to the earlier language;
    3. ``unknown`` when no script dominates and ZERO markers hit
       (previously such docs silently classified 'en').

    SINGLE-PASS shape (round 5, VERDICT r4 item 6): instead of 10
    marker-filter passes over ``tokens()`` plus 9 per-script
    ``regexp_extract_all`` counts, the text is scanned by exactly TWO
    regexes — one combined marker alternation and one union character
    class over all script ranges — and the per-language counts fold out
    of the (small) hit arrays with ``aggregate``/``transform``, each hit
    array referenced ONCE (the CollapseProject re-inline trap, NOTES.md).
    Pure Column expressions throughout; the DuckDB oracle reproduces all
    three arms (__spark_entry__._langid_sql) and is UNCHANGED — the
    rewrite is plan-shape only, the counts are provably identical.
    """
    c = _c(col)
    langs = list(LANG_MARKERS)
    alt_re, marker_langs = _marker_alternation()
    # marker arm: one regex pass -> hit tokens -> language indexes
    # (flattened, multiplicity preserved) -> per-language count fold
    lang_map = F.map_from_arrays(
        F.array(*[F.lit(m) for m in marker_langs]),
        F.array(
            *[
                F.array(*[F.lit(i) for i in ids])
                for ids in marker_langs.values()
            ]
        ),
    )
    hits = F.regexp_extract_all(F.lower(c), F.lit(alt_re), 0)
    hit_langs = F.flatten(
        F.transform(hits, lambda x: F.element_at(lang_map, x))
    )
    zero = F.array_repeat(F.lit(0), len(langs))
    counts = F.aggregate(
        hit_langs,
        zero,
        lambda acc, i: F.transform(
            acc, lambda cv, j: cv + F.when(i == j, 1).otherwise(0)
        ),
    )
    lang_arr = F.array(*[F.lit(lg) for lg in langs])
    best = F.array_max(
        F.transform(
            counts,
            lambda s, j: F.struct(
                s.alias("s"),
                (-j).alias("o"),
                F.element_at(lang_arr, (j + 1).cast("int")).alias("l"),
            ),
        )
    )
    marker = F.when(best["s"] == 0, F.lit("unknown")).otherwise(best["l"])
    # script arm: one union-class regex pass -> per-script count fold ->
    # first script (declaration order) whose ratio clears the bar
    script_langs = list(SCRIPT_RANGES)
    union_class = "[" + "".join(
        f"{chr(lo)}-{chr(hi)}" for lo, hi in SCRIPT_RANGES.values()
    ) + "]"
    chars = F.regexp_extract_all(c, F.lit(union_class), 0)
    szero = F.array_repeat(F.lit(0), len(script_langs))

    def _class_of(x: Column) -> Column:
        out = F.lit(-1)
        for i in reversed(range(len(script_langs))):
            lo, hi = SCRIPT_RANGES[script_langs[i]]
            out = F.when(
                (x >= F.lit(chr(lo))) & (x <= F.lit(chr(hi))), F.lit(i)
            ).otherwise(out)
        return out

    scounts = F.aggregate(
        F.transform(chars, _class_of),
        szero,
        lambda acc, i: F.transform(
            acc, lambda cv, j: cv + F.when(i == j, 1).otherwise(0)
        ),
    )
    nws = F.greatest(
        F.length(F.regexp_replace(c, r"\s", "")), F.lit(1)
    ).cast("double")
    winner = F.get(
        F.filter(
            F.transform(
                scounts,
                lambda cnt, j: F.struct(
                    cnt.alias("cnt"), j.alias("j")
                ),
            ),
            lambda s: s["cnt"].cast("double") / nws
            > F.lit(SCRIPT_MIN_RATIO),
        ),
        0,
    )
    script_arr = F.array(*[F.lit(lg) for lg in script_langs])
    # The isNotNull guard is LOAD-BEARING: ANSI element_at over a
    # literal array reports non-nullable, so a bare
    # element_at(script_arr, NULL_index) makes Catalyst eliminate the
    # coalesce below AND mis-declare the column's nullability (garbage
    # values at runtime). when() without otherwise restores nullability.
    script = F.when(
        winner.isNotNull(),
        F.element_at(script_arr, (winner["j"] + 1).cast("int")),
    )
    return F.coalesce(script, marker)


def quality_metrics(col: Column | str) -> dict[str, Column]:
    """Length / alpha-ratio / stopword-ratio style quality features.

    All ratios are double, rounded to 6 dp so the oracle compares stably.
    """
    c = _c(col)
    n_chars = F.length(c)
    alpha = F.length(F.regexp_replace(c, "[^a-zA-Z]", ""))
    t = tokens(c)
    n_tokens = F.size(t)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_hits = F.size(F.filter(t, lambda x: F.array_contains(stop_arr, x)))
    alpha_ratio = round6(alpha / F.greatest(n_chars, F.lit(1)).cast("double"))
    stop_ratio = round6(
        stop_hits / F.greatest(n_tokens, F.lit(1)).cast("double")
    )
    mean_tok = round6(
        F.aggregate(
            t, F.lit(0.0), lambda acc, x: acc + F.length(x).cast("double")
        )
        / F.greatest(n_tokens, F.lit(1)).cast("double")
    )
    quality = round6(
        F.lit(0.4) * alpha_ratio
        + F.lit(0.3) * F.least(n_tokens.cast("double") / F.lit(50.0), F.lit(1.0))
        + F.lit(0.3) * stop_ratio
    )
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "alpha_ratio": alpha_ratio,
        "stopword_ratio": stop_ratio,
        "mean_token_len": mean_tok,
        "quality": quality,
    }


def rare_token_stats(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    rare_max_count: int = 2,
):
    """Corpus-frequency quality filter (the CCNet statistical-LM filter
    family, integer-exact instead of float-LM so the DuckDB oracle can
    reproduce it bit-for-bit): per document, the fraction of its tokens
    whose GLOBAL corpus count is <= ``rare_max_count``. Noisy/garbled
    text is dominated by corpus-rare tokens; boilerplate sits near 0.

    Returns (id_col, n_tokens, n_rare, rare_ratio). Physical shape:
    explode -> one global token-count aggregation (map-side partial) ->
    token-key join back (Spark picks broadcast when the vocab is small,
    shuffle otherwise — both sides are token-count rows, never the
    corpus) -> per-doc aggregation. Everything is integer arithmetic
    until the final ratio, so the result is order-independent under any
    partitioning (float sums over shuffled rows would not be).
    """
    from pyspark.sql import functions as F

    tok = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("_tok")
    )
    vocab = tok.groupBy("_tok").agg(F.count(F.lit(1)).alias("_cnt"))
    joined = tok.join(vocab, "_tok")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum((F.col("_cnt") <= rare_max_count).cast("long")).alias(
                "n_rare"
            ),
        )
        .select(
            id_col,
            "n_tokens",
            "n_rare",
            round6(F.col("n_rare") / F.col("n_tokens")).alias("rare_ratio"),
        )
    )


def build_postings(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Inverted-index posting rows: one (token, doc_id) per DISTINCT token
    per document.

    Row-per-posting, not array-per-token: at corpus scale a hot token's
    doc list is millions of entries — as rows it spreads across
    partitions and aggregates with map-side partials; as one array it is
    a driver-killing skew cell. Persist bucketed/partitioned by ``token``
    so term lookups prune at plan time.
    """
    from pyspark.sql import functions as F

    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokens(text_col))).alias("token"),
    )


def search_postings(postings, terms: list[str], k: int = 20):
    """Top-k docs by number of matched query terms (boolean OR ranking).

    The term filter hits the posting store's partition/bucket pruning (a
    |terms|-sized IN list), so the scan is O(matched postings), never
    O(corpus); the groupBy aggregates counts with map-side partials.
    Deterministic order: (score DESC, doc_id ASC) is total, so LIMIT k is
    stable across engines — the DuckDB oracle reproduces it exactly.
    """
    from pyspark.sql import functions as F

    return (
        postings.filter(F.col("token").isin(list(terms)))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def search_postings_tf(docs, terms: list[str], k: int = 20,
                       text_col: str = "text", id_col: str = "doc_id"):
    """Top-k docs by total query-term OCCURRENCES (term-frequency
    ranking — the integer-exact cousin of ``search_postings``'s
    distinct-term score; floats never enter, so any SQL engine ranks
    identically). Same shape: term filter inside the scan's codegen
    stage, map-side-partial count, TakeOrderedAndProject top-k."""
    from pyspark.sql import functions as F

    tok = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("token")
    )
    return (
        tok.filter(F.col("token").isin(list(terms)))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


POSTING_BUCKETS = 64


def write_posting_index(docs, path: str, n_buckets: int = POSTING_BUCKETS,
                        text_col: str = "text", id_col: str = "doc_id") -> None:
    """Persist the inverted index partitioned by token hash-bucket.

    Serving layout for ``posting_index_search``: posting rows land under
    ``tbucket=<pmod(xxhash64(token), n_buckets)>`` partitions, so a term
    query reads only its terms' partitions — Spark's PartitionFilters
    prune the rest at PLAN time (asserted in tests), the same layout
    discipline as the IVF serving index (functions/similarity.py).
    """
    import json
    import os

    from pyspark.sql import functions as F

    (
        build_postings(docs, text_col, id_col)
        .withColumn(
            "tbucket", F.pmod(F.xxhash64(F.col("token")), F.lit(n_buckets)).cast("int")
        )
        .repartition("tbucket")
        .write.partitionBy("tbucket")
        .parquet(path)
    )
    # The bucket count is part of the index's identity: searching with a
    # different modulus silently filters to nonexistent partitions and
    # loses postings. Persist it; the underscore name keeps Spark's
    # parquet reader away (same convention as the IVF index meta).
    with open(os.path.join(path, "_pidx_meta.json"), "w") as f:
        json.dump({"n_buckets": int(n_buckets)}, f)


def posting_index_search(spark, path: str, terms: list[str], k: int = 20,
                         n_buckets: int | None = None):
    """Top-k docs by matched-term count against a persisted posting
    index. The tbucket equality-list filter prunes partitions at plan
    time (O(|terms|) partitions read, never the corpus); the residual
    token IN filter inside those partitions keeps exactness.

    ``n_buckets`` is read from the index's own ``_pidx_meta.json`` —
    passing a mismatching value raises rather than silently dropping
    postings whose bucket doesn't exist under the other modulus."""
    import json
    import os

    from pyspark.sql import functions as F

    with open(os.path.join(path, "_pidx_meta.json")) as f:
        stored = int(json.load(f)["n_buckets"])
    if n_buckets is not None and n_buckets != stored:
        raise ValueError(
            f"index at {path} was written with n_buckets={stored}, "
            f"got {n_buckets}"
        )
    n_buckets = stored
    buckets = sorted(
        {
            int(r["b"])
            for r in spark.createDataFrame([(t,) for t in terms], "token string")
            .select(F.pmod(F.xxhash64("token"), F.lit(n_buckets)).cast("int").alias("b"))
            .collect()
        }
    )
    postings = spark.read.parquet(path)
    return (
        postings.filter(F.col("tbucket").isin(buckets))
        .filter(F.col("token").isin(list(terms)))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def repetition_metrics(
    docs: "DataFrame", text_col: str = "text", id_col: str = "doc_id"
) -> "DataFrame":
    """Gopher-style repetition / format filters (Rae et al. 2021 §A1.1,
    the public repetition-removal rules every large-corpus pipeline
    applies): per document —

    - ``n_lines``: non-blank line count;
    - ``dup_line_ratio``: fraction of non-blank (trimmed) lines that are
      duplicates of an earlier line — boilerplate/navigation pages score
      high;
    - ``bullet_ratio`` / ``ellipsis_ratio``: lines starting with a
      bullet glyph / ending with an ellipsis — list-like and truncated
      content;
    - ``top_2gram_ratio``: occurrences of the most frequent word 2-gram
      over all 2-gram occurrences — the classic repeated-phrase signal.

    Physical shape: the line metrics are pure Column expressions fused
    into the scan; the 2-gram mode is the ONLY shuffle — explode to
    (doc, gram) rows, count, per-doc max/sum — the same
    O(total tokens) + map-side-combine shape as the rare-token filter,
    never an array-mode computation per row (which would re-inline the
    gram expression quadratically — the CollapseProject trap). All
    ratios round6 for oracle value equality.
    """
    c = F.col(text_col)
    nbt = F.transform(
        F.filter(F.split(c, "\n"), lambda x: F.length(F.trim(x)) > 0),
        lambda x: F.trim(x),
    )
    n_lines = F.size(nbt)
    safe = F.greatest(n_lines, F.lit(1)).cast("double")
    dup_line_ratio = F.when(n_lines == 0, F.lit(0.0)).otherwise(
        round6(
            F.lit(1.0)
            - F.size(F.array_distinct(nbt)).cast("double") / n_lines.cast("double")
        )
    )
    bullet_ratio = round6(
        F.size(F.filter(nbt, lambda x: x.rlike("^[-*•]"))).cast("double") / safe
    )
    ellipsis_ratio = round6(
        F.size(
            F.filter(nbt, lambda x: x.endswith("...") | x.endswith("…"))
        ).cast("double")
        / safe
    )
    base = docs.select(
        F.col(id_col).alias(id_col),
        n_lines.cast("long").alias("n_lines"),
        dup_line_ratio.alias("dup_line_ratio"),
        bullet_ratio.alias("bullet_ratio"),
        ellipsis_ratio.alias("ellipsis_ratio"),
        shingles(c, 2).alias("_g"),
    )
    gm = (
        base.select(id_col, F.explode("_g").alias("gram"))
        .groupBy(id_col, "gram")
        .count()
        .groupBy(id_col)
        .agg(
            (F.max("count").cast("double") / F.sum("count")).alias("_tg")
        )
    )
    return base.join(gm, on=id_col, how="left").select(
        id_col,
        "n_lines",
        "dup_line_ratio",
        "bullet_ratio",
        "ellipsis_ratio",
        round6(F.coalesce(F.col("_tg"), F.lit(0.0))).alias("top_2gram_ratio"),
    )


def bm25_corpus_stats(docs, terms: list[str], text_col: str = "text") -> dict:
    """The corpus statistics BM25 needs — doc count N, total token count
    (for avgdl), per-term document frequency — in ONE map-only Spark
    action with partial aggregation (the token arrays never shuffle; the
    agg output is a single row). Integers only, so any engine computing
    them over the same tokenization agrees exactly.

    The ``explode(array(tokens))`` is a Generate barrier: the regex
    tokenizer evaluates ONCE per row even though ``len(terms) + 1``
    downstream expressions reference the array (the CollapseProject
    re-inline trap, NOTES.md / PLANS.md §4).
    """
    arr = docs.select(F.explode(F.array(tokens(text_col))).alias("_toks"))
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("_toks")).alias("total_tokens"),
    ]
    for i, t in enumerate(terms):
        aggs.append(
            F.sum(F.array_contains("_toks", t).cast("long")).alias(f"df_{i}")
        )
    row = arr.agg(*aggs).collect()[0]
    if not row["n_docs"] or not row["total_tokens"]:
        raise ValueError("bm25 over an empty (or token-free) corpus")
    return {
        "n_docs": int(row["n_docs"]),
        "total_tokens": int(row["total_tokens"]),
        "df": [int(row[f"df_{i}"]) for i in range(len(terms))],
    }


def bm25_weights(
    stats: dict, k1: float = 1.2, b: float = 0.75
) -> tuple[list[float], float, float]:
    """Driver-side floats BM25 embeds as literals: per-term weight
    ``w_t = idf_t * (k1 + 1)`` with the Lucene/Robertson+ idf
    ``ln(1 + (N - df + 0.5) / (df + 0.5))`` (always positive), plus the
    length-normalization constants ``C1 = k1*(1-b)`` and
    ``C2 = k1*b/avgdl``.

    Computing ``ln`` HERE — not engine-side — is the same
    fit-is-DATA move as the trained-IVF oracle: libm ``log`` is only
    1-ulp-accurate and differs between the JVM and DuckDB, but once the
    weights are literals the engine-side arithmetic is pure ``+ * /`` on
    doubles, correctly rounded per IEEE 754 in both engines, so scores
    come out bit-identical and the oracle can hash-compare them.
    """
    import math

    n, total = stats["n_docs"], stats["total_tokens"]
    avgdl = total / n
    ws = [
        math.log(1.0 + (n - df + 0.5) / (df + 0.5)) * (k1 + 1.0)
        for df in stats["df"]
    ]
    return ws, k1 * (1.0 - b), k1 * b / avgdl


def search_postings_bm25(
    docs,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Top-k docs by BM25 (Robertson et al.; the Lucene practical
    formulation) — the float-scored ranking the integer-exact
    ``search_postings_tf`` deferred since round 3:

        score(d) = sum_t  w_t * tf_t / (tf_t + C1 + C2 * dl)

    Two Spark actions total: the one-row stats pass
    (``bm25_corpus_stats``) and the ranking query. Ranking shape: the
    term IN filter cuts the exploded token stream to matched postings
    only (same pruning discipline as the posting index), per-term tf by
    conditional aggregation (integer, order-independent under any
    partitioning — a float SUM over shuffled rows would not be), and
    ``dl = size(tokens)`` fused into a narrow second scan that joins the
    (small) matched-doc side. The scalar score expression mirrors the
    DuckDB oracle's parse tree exactly (left-associative term sum,
    ``(w*tf)/((tf+C1)+(C2*dl))``), so the doubles are bit-identical;
    output is round6 for the hashed comparison, ordering uses the raw
    double with doc_id tiebreak.
    """
    terms = list(terms)
    if len(set(terms)) != len(terms) or not terms:
        raise ValueError("bm25 terms must be non-empty and distinct")
    stats = bm25_corpus_stats(docs, terms, text_col)
    ws, c1, c2 = bm25_weights(stats, k1, b)
    tok = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("token")
    )
    tfs = (
        tok.filter(F.col("token").isin(terms))
        .groupBy("doc_id")
        .agg(
            *[
                F.sum((F.col("token") == F.lit(t)).cast("long")).alias(f"tf_{i}")
                for i, t in enumerate(terms)
            ]
        )
    )
    dls = docs.select(
        F.col(id_col).alias("doc_id"), F.size(tokens(text_col)).alias("dl")
    )
    j = tfs.join(dls, "doc_id")
    dl_d = F.col("dl").cast("double")
    score = None
    for i, w in enumerate(ws):
        tf_d = F.col(f"tf_{i}").cast("double")
        term = F.lit(w) * tf_d / (tf_d + F.lit(c1) + F.lit(c2) * dl_d)
        score = term if score is None else score + term
    return (
        j.select("doc_id", score.alias("_s"))
        .orderBy(F.desc("_s"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", round6(F.col("_s")).alias("score"))
    )


# PII patterns shared by the Spark exprs and the DuckDB oracle: RE2- and
# Java-regex-compatible (no lookaround/backrefs; \b is ASCII in both).
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_IPV4_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
PII_DIGITRUN_RE = "\\b[0-9]{9,}\\b"


def pii_metrics(docs, text_col: str = "text", id_col: str = "doc_id"):
    """PII scrub pass — the public pre-training hygiene step (CCNet /
    Dolma / RefinedWeb all document it): count and redact emails, IPv4
    literals, and long digit runs (phone/account-number class). Returns
    (id, n_emails, n_ips, n_digitruns, redacted_h) where ``redacted_h``
    fingerprints the text AFTER replacing matches with <EMAIL>/<IP>/
    <NUM> — downstream dedup/fingerprints run on the scrubbed form.

    Pure Column expressions fused into the scan (regexp_extract_all +
    chained regexp_replace, JVM codegen; zero Python, zero shuffle).
    Redaction order matters and is part of the contract: emails first
    (an email can contain digits), then IPs (dotted digits would also
    match the digit-run class once dots were gone — they can't, but the
    fixed order keeps both engines literally identical), then digit
    runs. DuckDB reproduces with the same patterns + the 'g' flag
    (its regexp_replace is first-match-only by default — a silent
    half-redaction bug if forgotten)."""
    c = _c(text_col)
    n_emails = F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL_RE), 0))
    n_ips = F.size(F.regexp_extract_all(c, F.lit(PII_IPV4_RE), 0))
    n_runs = F.size(F.regexp_extract_all(c, F.lit(PII_DIGITRUN_RE), 0))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>"),
            PII_IPV4_RE, "<IP>",
        ),
        PII_DIGITRUN_RE, "<NUM>",
    )
    return docs.select(
        F.col(id_col),
        n_emails.cast("long").alias("n_emails"),
        n_ips.cast("long").alias("n_ips"),
        n_runs.cast("long").alias("n_digitruns"),
        h32(redacted, "pii").alias("redacted_h"),
    )


def pack_chunks(
    docs,
    chunk_tokens: int = 64,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Sequence packing for LLM training: split each document's token
    stream into fixed-budget chunks with overlap (stride =
    ``chunk_tokens - overlap``), the standard long-document windowing
    every pre-training pipeline applies before batching. Returns one
    row per chunk: (id, chunk_idx 1-based, chunk_start 1-based token
    offset, chunk_len, chunk_h fingerprint of the chunk's tokens).

    Physical shape: tokens -> start-offset sequence -> ONE explode; the
    per-chunk slice/hash are Column HOFs computed post-explode on bound
    attributes (the Generate barrier keeps the tokenizer evaluated once
    per row — the CollapseProject trap again). Token-free documents
    emit no chunks (sequence(1,0) is empty in both engines). O(total
    tokens x chunk/stride) work, no shuffle, no Python."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    tok = docs.select(
        F.col(id_col),
        F.explode(F.array(tokens(text_col))).alias("_toks"),
    )
    # sequence(1, 0, +step) THROWS in Spark while DuckDB's
    # generate_series returns empty — guard token-free docs explicitly
    starts = F.when(
        F.size("_toks") >= 1,
        F.sequence(F.lit(1), F.size("_toks"), F.lit(stride)),
    ).otherwise(F.expr("array()").cast("array<int>"))
    exploded = tok.select(
        F.col(id_col), F.col("_toks"), F.explode(starts).alias("chunk_start")
    )
    sl = F.slice(F.col("_toks"), F.col("chunk_start"), chunk_tokens)
    return exploded.select(
        F.col(id_col),
        ((F.col("chunk_start") - 1) / F.lit(stride) + 1)
        .cast("long")
        .alias("chunk_idx"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.size(sl).cast("long").alias("chunk_len"),
        h32(F.concat_ws(" ", sl), "chunk").alias("chunk_h"),
    )


def stratified_sample(
    docs,
    fractions: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    seed: str = "samp",
):
    """Deterministic stratified sampling — the corpus-mixing step
    (up/down-weighting per language/source/quality stratum) every
    pre-training data recipe applies. A row survives iff
    ``h32(seed|id) % 1e6 < fraction(stratum) * 1e6``: pure Column
    arithmetic on an md5 hash, so (a) the sample is REPRODUCIBLE — the
    same row set on every run, engine, and partitioning (Spark's
    df.sample is neither: it is partition-order-dependent), (b) any SQL
    engine verifies it exactly, and (c) it composes with incremental
    pipelines — a re-run over an extended corpus keeps every previously
    sampled row (per-row independence), unlike reservoir methods.

    ``fractions`` maps stratum value -> keep fraction in [0, 1];
    unlisted strata keep ``default_fraction``. Fractions are quantized
    to 1e-6 (the hash bucket width) — the contract is exact-threshold,
    not approximate-rate. No shuffle: the filter fuses into the scan.
    """
    for k, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0,1], got {f}")
    bucket = F.pmod(h32(F.col(id_col).cast("string"), seed), F.lit(1000000))
    thr = F.lit(int(default_fraction * 1000000))
    for k, f in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == F.lit(k),
                     F.lit(int(f * 1000000))).otherwise(thr)
    return docs.filter(bucket < thr)


def decontaminate(
    docs,
    bench_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
):
    """Benchmark decontamination — the n-gram-overlap check every
    pre-training pipeline runs before a corpus ships (flag any document
    sharing a word n-gram with the eval/benchmark set, so test data
    can't leak into training). ``bench_pred`` selects the benchmark
    rows; a doc is contaminated when one of its n-grams appears in a
    benchmark document OTHER than itself (benchmark members don't
    self-flag).

    Returns (id_col, n_grams, n_hits, contaminated) with integer-exact
    columns: n_grams = the doc's DISTINCT n-gram count, n_hits = how
    many of those appear in the benchmark set. Production pipelines use
    8-13-gram windows; the fixture corpus is short-doc synthetic so
    tests/oracles run n=3 — the physical shape is n-independent.

    Physical shape for 100 TB: grams are DEDUPED per doc before any
    join (explode -> distinct, the big shrink), the benchmark side is
    tiny by construction (eval sets, not the corpus) so Spark broadcasts
    it, and the corpus side never shuffles on anything wider than
    (doc_id, gram). Integer counts only — order-independent under any
    partitioning.
    """
    from pyspark.sql import functions as F

    grams = docs.select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("_gram")
    ).distinct()
    bench = (
        docs.filter(bench_pred)
        .select(F.col(id_col).alias("_bid"),
                F.explode(shingles(text_col, n)).alias("_gram"))
        .distinct()
    )
    hits = (
        grams.join(F.broadcast(bench), "_gram")
        .filter(F.col(id_col) != F.col("_bid"))
        .select(id_col, "_gram")
        .distinct()
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    per_doc = grams.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"))
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).cast("long")
            .alias("contaminated"),
        )
    )


# ------------------------------------------------------------ bigram LM
# CCNet-style language-model quality scoring (Wenzek et al. 2020 use a
# 5-gram KenLM; a corpus-trained add-alpha bigram model is the honest
# sandbox-scale analog). The FIT IS DATA (the BM25/trained-IVF
# contract): counts are integer aggregations both engines reproduce
# exactly, the single transcendental (log) runs ONCE driver-side over
# those integers, and the resulting per-bigram log-probs re-enter both
# engines as literal values — engine-side math is then pure IEEE +,/
# over identical bits in an identical order, so the DuckDB oracle
# hashes bit-identically.

LM_ALPHA = 0.5  # add-alpha smoothing
LM_MAX_TABLE = 200_000  # collect guard: fit table is vocab-bounded (V^2)


def _lm_logp_table(
    pairs: list[tuple[str, str, int]], vocab_size: int, alpha: float
) -> tuple[list[tuple[str, str, float]], float]:
    """(w1, w2, count) -> (w1, w2, logp) + the OOV default, all driver
    math. P(w2|w1) = (B + a) / (C(w1) + a*V) with C = sum_w2 B(w1, w2).
    Deterministic: inputs are exact integers, one math.log per row."""
    import math

    ctx: dict[str, int] = {}
    for w1, _w2, c in pairs:
        ctx[w1] = ctx.get(w1, 0) + c
    table = [
        (w1, w2, math.log((c + alpha) / (ctx[w1] + alpha * vocab_size)))
        for w1, w2, c in sorted(pairs)
    ]
    return table, math.log(1.0 / vocab_size)


def bigram_lm_fit(
    docs: DataFrame, text_col: str = "text", alpha: float = LM_ALPHA
) -> tuple[list[tuple[str, str, float]], float]:
    """Fit the bigram LM over a corpus IN SPARK: two integer
    aggregations (bigram counts, vocab size), collected driver-side
    (bounded by distinct-bigram count <= V^2 — guarded), then one
    math.log per distinct bigram. ``bigram_lm_fit_local`` reproduces
    this bit-for-bit from the same parquet (pinned in
    tests/test_lm_score.py), which is what lets the DuckDB oracle embed
    the identical literals."""
    tok = docs.select(tokens(text_col).alias("l"))
    bg = (
        tok.filter(F.size("l") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(l) - 1), "
                    "i -> named_struct('w1', l[i-1], 'w2', l[i]))"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
    )
    rows = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c")).collect()
    if len(rows) > LM_MAX_TABLE:
        raise ValueError(
            f"bigram table {len(rows)} exceeds {LM_MAX_TABLE}; the fit "
            "collect is only safe on bounded vocabularies — prune the "
            "vocab (e.g. top-K tokens) before fitting"
        )
    vocab = (
        tok.select(F.explode("l").alias("w")).agg(
            F.countDistinct("w").alias("v")
        ).first()["v"]
    )
    pairs = [(r["w1"], r["w2"], r["c"]) for r in rows]
    return _lm_logp_table(pairs, int(vocab), alpha)


def bigram_lm_fit_local(
    docs_path: str,
    text_col: str = "text",
    alpha: float = LM_ALPHA,
    rel_sql: str | None = None,
) -> tuple[list[tuple[str, str, float]], float]:
    """The engine-neutral local twin of ``bigram_lm_fit`` (DuckDB
    counts + the same driver math) — MUST stay bit-identical; the
    oracle generator embeds its output as SQL literals. ``rel_sql``
    replaces the default ``read_parquet(docs_path)`` relation (a
    parenthesized subquery) so composed oracles can fit over an
    intermediate corpus (e.g. the deduped reps in text_recipe)."""
    import duckdb

    rel = rel_sql or f"read_parquet('{docs_path}')"
    con = duckdb.connect()
    try:
        rows = con.sql(
            f"""
            -- bigrams pair WITHIN each row's token list (list_transform
            -- over positions), exactly like the Spark fit's array
            -- transform — structurally immune to the self-join pairing
            -- hazards this query used to have: the original
            -- row_number() OVER () rid differed between the two
            -- evaluations of a twice-referenced CTE downstream of a
            -- join (bigrams paired ACROSS documents, fit flapped per
            -- process), and a doc_id rid would fan out on duplicate
            -- ids. No join, no rid, no uniqueness requirement.
            WITH tok AS (
              SELECT regexp_extract_all(lower({text_col}),
                     '{TOKEN_RE}') AS l
              FROM {rel}),
            bg AS (
              SELECT unnest(list_transform(range(2, len(l) + 1),
                     i -> struct_pack(w1 := l[i-1], w2 := l[i]))) AS b
              FROM tok)
            SELECT b.w1 AS w1, b.w2 AS w2, count(*)::BIGINT AS c
            FROM bg GROUP BY 1, 2
            """
        ).fetchall()
        vocab = con.sql(
            f"""
            SELECT count(DISTINCT w) FROM (
              SELECT unnest(regexp_extract_all(lower({text_col}),
                            '{TOKEN_RE}')) AS w
              FROM {rel})
            """
        ).fetchone()[0]
    finally:
        con.close()
    return _lm_logp_table(
        [(w1, w2, int(c)) for w1, w2, c in rows], int(vocab), alpha
    )


def bigram_lm_scores(
    docs: DataFrame,
    fit: tuple[list[tuple[str, str, float]], float],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean bigram log-probability under a fitted LM —
    (id, n_bigrams, lm_score round6; NULL for docs under 2 tokens).

    Exactness contract: the per-doc sum is an explicitly ORDERED left
    fold (sort_array by position, then F.aggregate) — never a float SUM
    over rows, whose accumulation order is partition-dependent. The
    DuckDB oracle folds ``list(logp ORDER BY pos)`` with list_reduce:
    same literals, same order, same IEEE adds, identical bits.

    Scale shape: the fit table is vocab-bounded and broadcast; bigram
    expansion is a scan-fused projection (transform over the token
    array, no self-join); the only shuffle is the per-doc groupBy.
    """
    spark = docs.sparkSession
    table, oov = fit
    lt = spark.createDataFrame(table, "w1 string, w2 string, logp double")
    bg = (
        docs.select(id_col, tokens(text_col).alias("l"))
        .filter(F.size("l") >= 2)
        .select(
            id_col,
            F.explode(
                F.expr(
                    "transform(sequence(1, size(l) - 1), "
                    "i -> named_struct('pos', i, 'w1', l[i-1], 'w2', l[i]))"
                )
            ).alias("b"),
        )
        .select(id_col, "b.pos", "b.w1", "b.w2")
    )
    joined = bg.join(F.broadcast(lt), ["w1", "w2"], "left").select(
        id_col, "pos", F.coalesce("logp", F.lit(oov)).alias("logp")
    )
    agg = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "logp"))),
                lambda x: x["logp"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("s"),
    )
    return (
        docs.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            round6(F.col("s") / F.col("n_bigrams")).alias("lm_score"),
        )
    )


# ------------------------------------------------- exact substring dedup
def duplicate_spans(
    docs,
    k: int = 30,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    stride: int = 1,
):
    """Exact duplicate-substring detection — the substring-dedup pass of
    Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better"), whose suffix-array step is re-expressed here as
    distributed k-gram occurrence counting: every character position
    starts a k-gram; any gram occurring >= ``min_count`` times anywhere
    in the corpus (including within one document) marks its span
    [pos, pos+k) duplicated; per document, overlapping-or-touching
    marked spans merge into MAXIMAL intervals. For a duplicate of
    length L >= k this yields exactly the byte range the suffix-array
    method cuts (every window inside it is duplicated, so the merged
    interval covers it end to end); no span shorter than k is ever
    flagged.

    Returns (id_col, span_start, span_end) — 0-based character offsets,
    end-exclusive, one row per maximal duplicated span, integer-exact
    and order-independent (DuckDB-reproducible).

    Physical shape for 100 TB: the gram explode is O(total chars /
    stride) rows but stays a scan-fused Generate (zero Python); the
    occurrence count is ONE hash aggregation on the gram with map-side
    partials, and the join back is gram-keyed equi (AQE handles the
    skewed hot grams — the very duplicates being hunted, which a
    window-over-gram formulation would funnel into single sorted
    partitions). The interval merge is one doc-keyed sort whose two
    window frames share the exchange, and the closing groupBy reuses
    that partitioning (hashpartitioning(doc_id) satisfies the
    (doc_id, gid) clustering — no fourth shuffle). At production scale
    key the count on xxhash64(gram) instead of the raw 30-char string
    (identical answers modulo 2^-64 collisions); the raw gram is kept
    here so the DuckDB oracle is literally the same grouping.
    ``stride > 1`` trades recall for an exact 1/stride cost cut (only
    grams at stride offsets are counted); stride=1 is the exact setting.

    DataX parity: none — this is "beyond the reference" training-data
    surface (module docstring); the reference's nearest concept is the
    transformer chain's dx_filter (SURVEY.md §2.3).
    """
    from pyspark.sql import Window

    if k < 1 or stride < 1 or min_count < 2:
        raise ValueError("k >= 1, stride >= 1, min_count >= 2 required")
    t = _c(text_col)
    last = F.floor((F.length(t) - k) / stride).cast("int")
    positions = F.when(F.length(t) >= k, F.sequence(F.lit(0), last)).otherwise(
        F.array().cast("array<int>")
    )
    grams = docs.select(
        F.col(id_col), t.alias("_t"), F.explode(positions).alias("_i")
    ).select(
        id_col,
        (F.col("_i") * stride).cast("long").alias("pos"),
        F.expr(f"substring(_t, _i * {stride} + 1, {k})").alias("_gram"),
    )
    dup = (
        grams.groupBy("_gram")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_count)
        .select("_gram")
    )
    hits = grams.join(dup, "_gram").select(id_col, "pos")
    wd = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + k).over(
        wd.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = hits.select(id_col, "pos", prev_end.alias("_pe"))
    gid = F.sum(
        F.when(F.col("_pe").isNull() | (F.col("pos") > F.col("_pe")), 1)
        .otherwise(0)
    ).over(wd.rowsBetween(Window.unboundedPreceding, 0))
    return (
        marked.select(id_col, "pos", gid.alias("_gid"))
        .groupBy(id_col, "_gid")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k).alias("span_end"),
        )
        .select(id_col, "span_start", "span_end")
    )


def scrub_duplicate_spans(
    docs,
    k: int = 30,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
):
    """Cut the ``duplicate_spans`` intervals OUT of the text — the
    "remove duplicated substrings" training-data transform of Lee et
    al. 2022 (their best-performing dedup treatment): every document
    keeps only the characters outside its maximal duplicated spans.

    Returns (id_col, clean_text, dup_chars, dup_ratio): the scrubbed
    text, how many characters were cut, and the cut fraction —
    round6-rounded so the ratio is engine-portable; docs with no
    duplicated spans pass through whole with dup_chars = 0.

    Physical shape: spans per doc are FEW (merged maximal intervals),
    so the reconstruction is relational, not string-functional — each
    span's KEPT predecessor gap [prev_end, start) becomes a row via one
    lag() window over the span set (tiny: one row per span), the final
    tail gap [max_end, len) rides the same per-doc aggregate, and
    clean_text is an ordered concat of substrings — all Column
    expressions over the doc's own text, zero Python. Adds one
    doc-keyed shuffle of the SPANS (not the corpus) plus the join back
    to the docs; a doc with no spans never enters the window.
    """
    from pyspark.sql import Window

    spans = duplicate_spans(
        docs, k=k, text_col=text_col, id_col=id_col, min_count=min_count
    )
    wd = Window.partitionBy(id_col).orderBy("span_start")
    gaps = spans.select(
        id_col,
        F.coalesce(
            F.lag("span_end").over(wd), F.lit(0).cast("long")
        ).alias("_gs"),
        F.col("span_start").alias("_ge"),
    )
    per_doc = spans.groupBy(id_col).agg(
        F.max("span_end").alias("_tail_start"),
        F.sum(F.col("span_end") - F.col("span_start")).alias("dup_chars"),
    )
    t = _c(text_col)
    joined = (
        docs.select(id_col, t.alias("_t"))
        .join(per_doc, id_col, "left")
        .join(
            gaps.groupBy(id_col).agg(
                F.sort_array(
                    F.collect_list(F.struct("_gs", "_ge"))
                ).alias("_gaps")
            ),
            id_col,
            "left",
        )
    )
    kept_mid = F.array_join(
        F.transform(
            F.coalesce(
                F.col("_gaps"),
                F.array().cast("array<struct<_gs:bigint,_ge:bigint>>"),
            ),
            lambda g: F.expr("_t").substr(
                (g["_gs"] + 1).cast("int"), (g["_ge"] - g["_gs"]).cast("int")
            ),
        ),
        "",
    )
    tail = F.when(
        F.col("_tail_start").isNotNull(),
        F.expr("_t").substr(
            (F.col("_tail_start") + 1).cast("int"),
            (F.length("_t") - F.col("_tail_start")).cast("int"),
        ),
    ).otherwise(F.col("_t"))
    dup_chars = F.coalesce("dup_chars", F.lit(0)).cast("long")
    return joined.select(
        id_col,
        F.concat(kept_mid, tail).alias("clean_text"),
        dup_chars.alias("dup_chars"),
        round6(
            dup_chars.cast("double")
            / F.greatest(F.length("_t"), F.lit(1)).cast("double")
        ).alias("dup_ratio"),
    )


# ------------------------------------------- token-budget corpus mixing
# The data-mixture construction step of a pre-training pipeline: given a
# per-domain TOKEN budget (the recipe's mixture weights times the total
# token target), derive per-domain keep thresholds and sample the corpus
# down to them. The fit-is-DATA contract again: the per-domain token
# totals are ONE integer aggregation both engines reproduce exactly, the
# threshold math is integer floor division driver-side, and the
# resulting ppm literals re-enter both engines in the same
# hash-threshold filter stratified_sample uses — so the SURVIVING ROW
# SET is exact (budgets are hit in expectation; the contract is the row
# set, not the token count).

MIX_PPM = 1_000_000


def _mixture_ppm(
    totals: dict[str, int], budgets: dict[str, int]
) -> dict[str, int]:
    """budget tokens / total tokens -> keep threshold in ppm, integer
    floor math only (engine-neutral by construction). Domains at or
    over budget keep everything; domains absent from ``budgets`` are
    dropped (ppm 0) — the mixture is a whitelist."""
    out: dict[str, int] = {}
    for s, budget in sorted(budgets.items()):
        if budget < 0:
            raise ValueError(f"budget for {s!r} must be >= 0")
        # `or 0`: a stratum whose every text is NULL sums to NULL in
        # both engines — treat it as 0 tokens (vacuously keep-all),
        # not a driver TypeError.
        t = int(totals.get(s, 0) or 0)
        out[s] = MIX_PPM if budget >= t else budget * MIX_PPM // t
    return out


def mixture_fit(
    docs: DataFrame,
    budgets: dict[str, int],
    strata_col: str = "source",
    text_col: str = "text",
) -> dict[str, int]:
    """Per-domain token totals IN SPARK (one integer agg, map-side
    partials, O(domains) collect) -> keep thresholds in ppm."""
    rows = (
        docs.groupBy(strata_col)
        .agg(F.sum(F.size(tokens(text_col))).alias("t"))
        .collect()
    )
    return _mixture_ppm({r[strata_col]: r["t"] for r in rows}, budgets)


def mixture_fit_local(
    docs_path: str,
    budgets: dict[str, int],
    strata_col: str = "source",
    text_col: str = "text",
    rel_sql: str | None = None,
) -> dict[str, int]:
    """Engine-neutral local twin of ``mixture_fit`` (DuckDB counts +
    the same integer driver math) — MUST stay bit-identical; the oracle
    generator embeds its output as ppm literals. ``rel_sql`` replaces
    the default ``read_parquet(docs_path)`` relation for composed
    oracles fitting over an intermediate corpus."""
    import duckdb

    rel = rel_sql or f"read_parquet('{docs_path}')"
    con = duckdb.connect()
    try:
        rows = con.sql(
            f"""
            SELECT {strata_col},
                   sum(len(regexp_extract_all(lower({text_col}),
                           '{TOKEN_RE}')))::BIGINT
            FROM {rel} GROUP BY 1
            """
        ).fetchall()
    finally:
        con.close()
    return _mixture_ppm(
        {s: int(t) if t is not None else 0 for s, t in rows}, budgets
    )


def mixture_sample(
    docs: DataFrame,
    ppm: dict[str, int],
    strata_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Apply a fitted mixture: keep a row iff
    ``h32(seed|id) % 1e6 < ppm[stratum]`` (unlisted strata drop).
    Same reproducibility properties as stratified_sample — exact row
    set on every engine/partitioning, per-row independent so re-runs
    over a grown corpus keep prior picks. Returns the kept rows with
    their token counts (the budget-accounting column). The filter and
    tokenizer fuse into the scan; no shuffle."""
    bucket = F.pmod(h32(F.col(id_col).cast("string"), seed), F.lit(MIX_PPM))
    thr = F.lit(0)
    for k, p in sorted(ppm.items()):
        if not 0 <= p <= MIX_PPM:
            raise ValueError(f"ppm for {k!r} out of range: {p}")
        thr = F.when(F.col(strata_col) == F.lit(k), F.lit(p)).otherwise(thr)
    return docs.filter(bucket < thr).select(
        id_col,
        strata_col,
        F.size(tokens(text_col)).cast("long").alias("n_tokens"),
    )


# ------------------------------------------ quality-quantile bucketing
def quality_buckets(
    docs: DataFrame,
    scores: DataFrame,
    head: float = 0.1,
    middle: float = 0.4,
    lang_col: str = "lang",
    score_col: str = "lm_score",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet's perplexity bucketing (Wenzek et al. 2020): per language,
    rank documents by quality score and cut head / middle / tail at the
    ``head`` and ``head+middle`` quantiles (CCNet trains on the head,
    keeps the middle, drops the tail). ``scores`` is any (id, score)
    frame — bigram_lm_scores output in the flagship query.

    Exactness: the rank is row_number over (score DESC NULLS LAST, id)
    per language — a deterministic total order — and the quantile cuts
    are INTEGER comparisons (rank * 1e6 <= n * head_ppm), so any SQL
    engine reproduces the exact bucket assignment; no float quantile
    estimation is involved.

    Scale shape: one shuffle on lang_col for the per-language sort —
    the honest shape of CCNet's own per-language ranking. A dominant
    language (en at ~40% of a 100 TB crawl) makes that partition the
    straggler; production would switch to the two-pass sampled-
    threshold variant (compute per-lang score cutoffs from a sample,
    then filter scan-side — same output modulo boundary ties) or run
    per-shard like CCNet itself. The exact-rank form is the
    oracle-checkable contract."""
    from pyspark.sql import Window

    if not (0 <= head <= 1 and 0 <= middle <= 1 and head + middle <= 1):
        raise ValueError("require 0 <= head, middle, head+middle <= 1")
    # round, not int(): 0.3 * 1e6 = 299999.99..., truncation would cut
    # every such quantile one ppm short of the documented fraction.
    h_ppm = round(head * MIX_PPM)
    m_ppm = round((head + middle) * MIX_PPM)
    j = docs.select(id_col, lang_col).join(scores, id_col)
    w = Window.partitionBy(lang_col).orderBy(
        F.col(score_col).desc_nulls_last(), F.col(id_col)
    )
    # row_number() is INT; rn * 1e6 overflows int32 at rank 2148 (ANSI
    # mode throws, non-ANSI silently misbuckets) — widen BEFORE the
    # multiply. count() is already long.
    rn = F.row_number().over(w).cast("long")
    n = F.count(F.lit(1)).over(Window.partitionBy(lang_col))
    bucket = (
        F.when(rn * MIX_PPM <= n * h_ppm, F.lit("head"))
        .when(rn * MIX_PPM <= n * m_ppm, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return j.select(
        id_col,
        lang_col,
        F.col(score_col),
        rn.cast("long").alias("lang_rank"),
        bucket.alias("bucket"),
    )


# --------------------------------------------- deterministic sharding
def pack_shards(
    docs: DataFrame,
    shard_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_order_buckets: int = 64,
    seed: str = "shard",
) -> DataFrame:
    """Deterministic corpus shard export — the final step of a training
    pipeline: place every document at a global token offset in a
    pseudo-random but REPRODUCIBLE order (hash of the id), and assign
    it to the fixed-token-budget shard containing its start offset
    (shard = start_tok div shard_tokens; a doc may straddle its
    shard's end — greedy-by-start, the WebDataset convention).

    Exactness: order key = (h32(id) % 1e6, id) — unique, engine-neutral
    — and every number is integer arithmetic, so DuckDB reproduces the
    exact (start_tok, shard_id) per row with one window cumsum.

    Physical shape for 100 TB (the reason this is not "one window over
    ORDER BY hash", which collapses to a single sorted partition): a
    DISTRIBUTED PREFIX SUM. The hash key is uniform, so its range
    splits into ``n_order_buckets`` contiguous, balanced buckets; pass
    1 aggregates per-bucket token totals (O(buckets) collect), the
    driver exclusive-prefix-sums them, pass 2 runs the cumsum window
    WITHIN each bucket (balanced parallel sorts) and adds the bucket's
    offset. Same two-pass shape as split_ntile's exact ranks."""
    if shard_tokens <= 0 or n_order_buckets <= 0:
        raise ValueError("shard_tokens and n_order_buckets must be > 0")
    from pyspark.sql import Window

    hm = F.pmod(h32(F.col(id_col).cast("string"), seed), F.lit(MIX_PPM))
    base = docs.select(
        F.col(id_col),
        hm.alias("_hm"),
        F.size(tokens(text_col)).cast("long").alias("n_tokens"),
    ).withColumn(
        "_ob",
        (F.col("_hm") * F.lit(n_order_buckets) / F.lit(MIX_PPM)).cast("int"),
    )
    totals = {
        r["_ob"]: r["t"]
        for r in base.groupBy("_ob")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    off, acc = {}, 0
    for b in range(n_order_buckets):
        off[b] = acc
        acc += int(totals.get(b, 0))
    offset_map = F.create_map(
        *[F.lit(x) for kv in sorted(off.items()) for x in kv]
    )
    w = Window.partitionBy("_ob").orderBy("_hm", id_col)
    start = (
        offset_map[F.col("_ob")] + F.sum("n_tokens").over(w)
        - F.col("n_tokens")
    )
    # shard = start_tok div shard_tokens in INTEGER arithmetic — a
    # double `/` would hit the 2^53 precision collapse at real corpus
    # token offsets (the repo-wide long->double trap).
    return base.select(
        id_col,
        F.col("n_tokens"),
        start.cast("long").alias("start_tok"),
    ).withColumn(
        "shard_id", F.expr(f"start_tok div {int(shard_tokens)}")
    )


def write_shards(
    docs: DataFrame,
    path: str,
    shard_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_order_buckets: int = 64,
    seed: str = "shard",
) -> list[dict]:
    """Materialize the packed corpus: one parquet directory per shard
    (``shard_id=K/``), each row carrying its global token offset — the
    layout a training job consumes shard-by-shard. Returns per-shard
    stats (shard_id, docs, tokens), O(shards) driver rows.

    Scale shape: pack_shards' distributed prefix sum assigns, then ONE
    repartition(shard_id) clusters each shard's rows so partitionBy
    emits one file per shard per task instead of a file per
    (task, shard) pair — the small-files guard. Shard token sums are
    bounded by budget + the one straddling doc (greedy-by-start)."""
    sh = pack_shards(
        docs, shard_tokens, text_col=text_col, id_col=id_col,
        n_order_buckets=n_order_buckets, seed=seed,
    )
    out = docs.join(sh, id_col).select(
        "shard_id", "start_tok", "n_tokens", *docs.columns
    )
    (
        out.repartition(F.col("shard_id"))
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )
    # Stats from the WRITTEN files, not the lineage: re-aggregating
    # `out` would re-execute the whole upstream DAG (join + prefix-sum
    # windows) a second time, and a non-deterministic upstream could
    # make the report disagree with what actually shipped.
    stats = (
        out.sparkSession.read.parquet(path)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_tokens").alias("tokens"),
        )
        .orderBy("shard_id")
        .collect()
    )
    return [
        {"shard_id": r["shard_id"], "docs": r["docs"], "tokens": r["tokens"]}
        for r in stats
    ]


def quality_buckets_threshold(
    docs: DataFrame,
    scores: DataFrame,
    head: float = 0.1,
    middle: float = 0.4,
    lang_col: str = "lang",
    score_col: str = "lm_score",
    id_col: str = "doc_id",
    n_hist_buckets: int = 1024,
) -> DataFrame:
    """The 100-TB form of ``quality_buckets`` — EXACTLY the same bucket
    assignment (equality pytest-pinned, ties and NULLs included), but
    no per-language sort of the corpus. A dominant language (en at ~40%
    of a crawl) makes the window form's sort partition the straggler;
    this form computes each language's head/middle cutoffs as a
    distributed ORDER STATISTIC and assigns buckets with a scan-side
    comparison against broadcast cutoff literals:

    1. per-language counts + score range — one small aggregation;
    2. histogram pass: non-null scores bucketize by value (equal scores
       can never split across buckets), counts per (lang, bucket) —
       one aggregation, O(langs x n_hist_buckets) driver rows;
    3. the driver prefix-sums each language's histogram to locate the
       bucket containing cutoff rank k = n*ppm div 1e6 (the window
       form's exact head/middle sizes);
    4. targeted second pass: ONLY the cutoff buckets' rows (~n/B per
       language, or that language's NULL-score rows when k lands past
       the non-null region) get an exact (score DESC, id) rank to
       produce the cutoff PAIR (score_k, id_k) — the pair makes the
       boundary exact under ties;
    5. assignment = one scan-fused comparison per row against its
       language's two cutoff pairs, compiled as a per-language literal
       when-chain (switch to a broadcast join at thousands of
       languages).

    Degenerate case: a language whose every score is equal collapses to
    one histogram bucket, so pass 4 ranks that whole language — the
    window form's cost, correctness unchanged. Returns (id, lang,
    score, bucket) — no lang_rank column: materializing every row's
    rank is exactly the global sort this form exists to avoid."""
    from pyspark.sql import Window

    if not (0 <= head <= 1 and 0 <= middle <= 1 and head + middle <= 1):
        raise ValueError("require 0 <= head, middle, head+middle <= 1")
    if n_hist_buckets < 1:
        raise ValueError("n_hist_buckets must be >= 1")
    h_ppm = round(head * MIX_PPM)
    m_ppm = round((head + middle) * MIX_PPM)
    j = docs.select(id_col, lang_col).join(scores, id_col)

    def _is_lang(lang) -> Column:
        # NULL is a language group of its own (matching the window
        # form's partitionBy, where NULLs group together); == never
        # matches NULL, so spell the comparison null-safely.
        if lang is None:
            return F.col(lang_col).isNull()
        return F.col(lang_col) == F.lit(lang)

    # The driver passes (stats, histogram, two cutoff-rank collects) all
    # re-derive j; cache it for their duration, then drop the cache so
    # the RETURNED assignment plan stays the scan-fused single pass.
    j = j.persist()

    # pass 1: per-language counts + non-null score range
    stats = {
        r["lang"]: r
        for r in j.groupBy(F.col(lang_col).alias("lang"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(score_col).alias("n_scored"),
            F.min(score_col).alias("smin"),
            F.max(score_col).alias("smax"),
        )
        .collect()
    }

    # pass 2: histogram of non-null scores by VALUE (desc order: bucket
    # 0 holds the highest scores). Equal scores share a bucket by
    # construction, so a tie never straddles the cutoff bucket.
    def bucket_expr(smin: float, smax: float):
        if smax == smin:
            return F.lit(0)
        b = F.floor(
            (F.lit(smax) - F.col(score_col))
            * F.lit(float(n_hist_buckets))
            / (F.lit(smax) - F.lit(smin))
        ).cast("int")
        return F.least(b, F.lit(n_hist_buckets - 1))

    bexpr = F.lit(None).cast("int")
    for lang, r in stats.items():
        if r["n_scored"]:
            bexpr = F.when(
                _is_lang(lang),
                bucket_expr(float(r["smin"]), float(r["smax"])),
            ).otherwise(bexpr)
    hist: dict[tuple[str, int], int] = {
        (r["lang"], r["b"]): r["c"]
        for r in j.filter(F.col(score_col).isNotNull())
        .select(F.col(lang_col).alias("lang"), bexpr.alias("b"))
        .groupBy("lang", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }

    # pass 3 (driver): locate each (lang, k) cutoff — either a histogram
    # bucket + the rank offset within it, or the NULL region.
    need: list[tuple[str, str, int, int | None, int]] = []
    trivial: dict[tuple[str, str], str] = {}
    for lang, r in stats.items():
        n, n_scored = r["n"], r["n_scored"]
        for lvl, ppm in (("h", h_ppm), ("m", m_ppm)):
            k = n * ppm // MIX_PPM
            if k == 0:
                trivial[(lang, lvl)] = "none"
            elif k >= n:
                trivial[(lang, lvl)] = "all"
            elif k > n_scored:
                # cutoff falls among NULL-score rows (ordered by id)
                need.append((lang, lvl, k - n_scored, None, 0))
            else:
                cum = 0
                for b in range(n_hist_buckets):
                    c = hist.get((lang, b), 0)
                    if cum + c >= k:
                        need.append((lang, lvl, k - cum, b, 1))
                        break
                    cum += c

    # pass 4: exact rank ONLY inside the cutoff buckets / NULL regions
    cutoffs: dict[tuple[str, str], tuple[float | None, object]] = {}
    if need:
        langs_b = [(lang, b) for lang, _, _, b, scored in need if scored]
        langs_null = [lang for lang, _, _, b, scored in need if not scored]
        # compare against the MATERIALIZED _b column, never re-inline
        # the per-language bexpr when-chain (the CollapseProject
        # expression-blowup edge, NOTES.md)
        pred = F.lit(False)
        for lang, b in langs_b:
            pred = pred | (_is_lang(lang) & (F.col("_b") == F.lit(b)))
        rows = []
        if langs_b:
            w = Window.partitionBy(lang_col, "_b").orderBy(
                F.col(score_col).desc(), F.col(id_col)
            )
            want_r = F.lit(False)
            for lang, _lvl, rk, b, scored in need:
                if scored:
                    want_r = want_r | (
                        _is_lang(lang)
                        & (F.col("_b") == F.lit(b))
                        & (F.col("_r") == F.lit(rk))
                    )
            rows += (
                j.filter(F.col(score_col).isNotNull())
                .withColumn("_b", bexpr)
                .filter(pred)
                .withColumn("_r", F.row_number().over(w))
                .filter(want_r)  # collect ONLY the cutoff rows
                .select(lang_col, "_b", "_r", score_col, id_col)
                .collect()
            )
        nrows = []
        if langs_null:
            wn = Window.partitionBy(lang_col).orderBy(id_col)
            want_n = F.lit(False)
            for lang, _lvl, rk, b, scored in need:
                if not scored:
                    want_n = want_n | (
                        _is_lang(lang) & (F.col("_r") == F.lit(rk))
                    )
            null_lang_pred = F.lit(False)
            for lang in langs_null:
                null_lang_pred = null_lang_pred | _is_lang(lang)
            nrows = (
                j.filter(F.col(score_col).isNull() & null_lang_pred)
                .withColumn("_r", F.row_number().over(wn))
                .filter(want_n)
                .select(lang_col, "_r", id_col)
                .collect()
            )
        by_scored = {
            (r[lang_col], r["_b"], r["_r"]): (r[score_col], r[id_col])
            for r in rows
        }
        by_null = {(r[lang_col], r["_r"]): r[id_col] for r in nrows}
        for lang, lvl, rk, b, scored in need:
            if scored:
                cutoffs[(lang, lvl)] = by_scored[(lang, b, rk)]
            else:
                cutoffs[(lang, lvl)] = (None, by_null[(lang, rk)])

    # pass 5: broadcast cutoff literals, one scan-fused comparison/row.
    # rank <= k  <=>  (score, id) <= cutoff pair in (DESC NULLS LAST,
    # ASC) order; NULL-region cutoffs admit every scored row.
    def within(lvl: str, lang: str) -> Column:
        t = trivial.get((lang, lvl))
        if t == "none":
            return F.lit(False)
        if t == "all":
            return F.lit(True)
        s_k, id_k = cutoffs[(lang, lvl)]
        sc, i = F.col(score_col), F.col(id_col)
        if s_k is None:
            return sc.isNotNull() | (sc.isNull() & (i <= F.lit(id_k)))
        return sc.isNotNull() & (
            (sc > F.lit(float(s_k)))
            | ((sc == F.lit(float(s_k))) & (i <= F.lit(id_k)))
        )

    j.unpersist()  # the returned plan recomputes the join scan-fused
    in_h = F.lit(False)
    in_m = F.lit(False)
    for lang in stats:
        is_l = _is_lang(lang)
        in_h = F.when(is_l, within("h", lang)).otherwise(in_h)
        in_m = F.when(is_l, within("m", lang)).otherwise(in_m)
    bucket = (
        F.when(in_h, F.lit("head"))
        .when(in_m, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return j.select(
        id_col, lang_col, F.col(score_col), bucket.alias("bucket")
    )


def c4_clean(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    min_kept_lines: int = 3,
):
    """C4 line-level cleaning (Raffel et al. 2020 §2.2 — the published
    heuristics every web-corpus pipeline starts from):

    line KEEP rules (applied to each '\\n'-separated, trimmed line):
      - ends with a terminal punctuation mark ([.!?]);
      - has at least ``min_words`` whitespace words;
      - does not mention 'javascript' (case-insensitive).
    page DROP rules (whole document):
      - raw text contains '{' (code) or 'lorem ipsum' (placeholder);
      - fewer than ``min_kept_lines`` lines survive.

    Output: kept docs as (id_col, clean_text = surviving lines re-joined
    by '\\n', n_lines, n_kept). Omitted C4 rules, by design: the
    bad-words list (external resource) and the three-sentence-span dedup
    (duplicate_spans/scrub_duplicate_spans cover it corpus-wide, which
    is strictly stronger than C4's within-page version).

    Physical shape: pure Column HOFs fused into the scan — zero
    shuffle, zero UDFs, same class as pack_chunks. DuckDB reproduces
    every rule exactly (string_split/list_filter/array_to_string), so
    the query carries a full value oracle.
    """
    lines = F.split(_c(text_col), "\n")

    def _keep(line: Column) -> Column:
        lt = F.trim(line)
        words = F.size(F.filter(F.split(lt, " "), lambda w: w != F.lit("")))
        return (
            lt.rlike("[.!?]$")
            & (words >= F.lit(min_words))
            & (F.instr(F.lower(lt), "javascript") == F.lit(0))
        )

    kept = F.filter(lines, _keep)
    raw = _c(text_col)
    page_ok = (
        (F.instr(raw, "{") == F.lit(0))
        & (F.instr(F.lower(raw), "lorem ipsum") == F.lit(0))
        & (F.size(kept) >= F.lit(min_kept_lines))
    )
    return (
        df.withColumn("_kept", kept)
        .filter(page_ok)
        .select(
            F.col(id_col),
            F.array_join(F.col("_kept"), "\n").alias("clean_text"),
            F.size(lines).alias("n_lines"),
            F.size(F.col("_kept")).alias("n_kept"),
        )
    )
