"""Text-analysis functions for large-scale training-data pipelines:
token counting, normalization, fingerprinting, quality scoring,
language-ID heuristics. Pure Catalyst expressions (whole-stage
codegen; no Python), each with an exact ANSI-SQL twin used by the
DuckDB oracle (__spark_entry__.oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# deliberately small, frozen stopword sets so Spark and the SQL oracle
# agree byte-for-byte
STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is", "it")

# language marker words for the n-gram/stopword language-ID heuristic
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
    "es": ("el", "los", "que"),
}


def token_count(col: Column) -> Column:
    """Whitespace token count (empty string -> 0)."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def normalize_text(col: Column) -> Column:
    """Canonical form for near-dup detection: lowercase, strip
    non-alphanumerics, collapse whitespace."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^a-z0-9 ]", " ")
    c = F.regexp_replace(c, r" +", " ")
    return F.trim(c)


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of the normalized text (md5 is
    identical across Spark and DuckDB, making it oracle-checkable)."""
    return F.md5(normalize_text(col))


def word_regex_count(col: Column, word: str) -> Column:
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(rf"\b{word}\b"), F.lit(0)))


def stopword_count(col: Column, words=STOPWORDS_EN) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(pat), F.lit(0)))


def punct_ratio(col: Column) -> Column:
    n_punct = F.length(F.regexp_replace(col, r"[^.,;:!?]", ""))
    return F.round(n_punct / F.greatest(F.length(col), F.lit(1)), 6)


def stopword_ratio(col: Column) -> Column:
    return F.round(
        stopword_count(col) / F.greatest(token_count(col), F.lit(1)), 6
    )


def quality_score(col: Column) -> Column:
    """Composite quality heuristic in [0,1]: length band + stopword
    presence - punctuation excess. Deliberately simple and frozen; the
    value is pipeline plumbing, not linguistics."""
    n_tok = token_count(col)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 1000), F.lit(0.5)).otherwise(F.lit(0.0))
    sw = F.when(stopword_ratio(col) >= 0.01, F.lit(0.3)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(col) <= 0.1, F.lit(0.2)).otherwise(F.lit(0.0))
    return F.round(len_ok + sw + punct_ok, 6)


def chunk_documents(
    df,
    max_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Sliding-window token chunking (training-data prep: long
    documents -> fixed-budget windows with overlap for sequence
    packing). Pure Catalyst — split, sequence, transform, explode —
    zero Python, so it whole-stage-codegens and scales scan-locally
    (one document never leaves its partition; no shuffle).

    Windows start every ``max_tokens - overlap`` tokens until the
    start passes the end of the document; the final window may be
    short (standard stride semantics). Empty documents yield no
    chunks. Returns ``id_col, chunk_idx, n_tokens, chunk_text``.
    """
    if overlap >= max_tokens:
        raise ValueError("overlap must be smaller than max_tokens")
    step = max_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(step))
    out = (
        df.select(
            F.col(id_col),
            toks.alias("__toks"),
            n.alias("__n"),
            F.explode(starts).alias("__start"),
        )
        .filter((F.col("__n") > 0) & (F.length(F.concat_ws("", "__toks")) > 0))
        .select(
            id_col,
            (F.col("__start") / step).cast("int").alias("chunk_idx"),
            F.least(F.col("__n") - F.col("__start"), F.lit(max_tokens)).alias(
                "n_tokens"
            ),
            F.array_join(
                F.slice(F.col("__toks"), F.col("__start") + 1, max_tokens), " "
            ).alias("chunk_text"),
        )
    )
    return out


# frozen PII patterns (deliberately simple + identical semantics in
# Java regex and RE2, so the DuckDB oracle matches byte-for-byte):
# applied in this order
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\+\d[\d\- ]{7,}\d", "<PHONE>"),
)


def pii_count(col: Column) -> Column:
    """Number of PII matches (before redaction), summed over the
    pattern set."""
    out = F.lit(0)
    for pat, _tok in PII_PATTERNS:
        out = out + F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0)))
    return out


def redact_pii(col: Column) -> Column:
    """Redact emails / IPv4s / phone numbers with typed tokens —
    training-data scrubbing as pure Catalyst regexp_replace chains
    (scan-local, no Python, no shuffle)."""
    out = col
    for pat, tok in PII_PATTERNS:
        out = F.regexp_replace(out, pat, tok)
    return out


def let_(value: Column, body) -> Column:
    """Let-binding for Catalyst higher-order expressions: evaluate
    ``value`` ONCE per row and pass it to ``body`` as a bound lambda
    variable.

    Catalyst's HOF evaluation re-evaluates a *captured* subexpression
    on every element of the iterated array (e.g. ``transform(seq, i ->
    slice(toks, i, n))`` recomputes the whole ``toks`` pipeline per
    window — O(len * windows) instead of O(len), measured ~2x on token
    n-grams and far worse when projection collapse multiplies the
    references). Wrapping the value in a single-element array and
    binding it through ``transform`` turns the capture into a lambda
    variable, which IS evaluated once."""
    return F.element_at(F.transform(F.array(value), body), 1)


def _token_ngrams(col: Column, n: int) -> Column:
    """All token n-grams of the normalized text as an array<string>
    (empty when the document has fewer than n tokens). Pure Catalyst
    (split / sequence / transform / slice) — scan-local; the token
    array is let-bound so the normalize+split pipeline runs once per
    row, not once per window."""
    toks = F.split(normalize_text(col), " ")

    def body(ts: Column) -> Column:
        starts = F.sequence(F.lit(1), F.greatest(F.size(ts) - (n - 1), F.lit(0)))
        grams = F.transform(starts, lambda i: F.array_join(F.slice(ts, i, n), " "))
        return F.when(F.size(ts) >= n, grams).otherwise(
            F.array().cast("array<string>")
        )

    return let_(toks, body)


def decontaminate(docs, eval_df, n: int = 8, id_col: str = "doc_id",
                  text_col: str = "text", eval_text_col: str = "text"):
    """Benchmark decontamination: flag training documents that share
    any token ``n``-gram with an eval/benchmark set (the standard
    pre-training hygiene pass: if an eval question's 8-gram appears in
    a training doc, the doc is contaminated and must be dropped).

    Scale shape: the eval side is benchmark data — thousands of rows
    against billions of training docs — so its DISTINCT gram set is
    broadcast and the training scan stays shuffle-free until the final
    per-doc count (map-side combined). The training side's grams are
    derived scan-locally; a document never leaves its partition before
    aggregation.

    Returns ``id_col, n_hit_grams`` — one row per contaminated doc
    (docs with zero overlap are absent; anti-join against this result
    to keep the clean set).
    """
    from pyspark.sql import functions as _F

    eval_grams = (
        eval_df.select(
            _F.explode(_token_ngrams(_F.col(eval_text_col), n)).alias("gram")
        )
        .distinct()
    )
    # per-doc grams deduped SCAN-LOCALLY (array_distinct) — no
    # corpus-wide distinct shuffle; only rows surviving the broadcast
    # join (contaminated grams, a tiny fraction) reach the shuffle
    doc_grams = docs.select(
        id_col,
        _F.explode(
            _F.array_distinct(_token_ngrams(_F.col(text_col), n))
        ).alias("gram"),
    )
    return (
        doc_grams.join(_F.broadcast(eval_grams), "gram")
        .groupBy(id_col)
        .agg(_F.count(_F.lit(1)).cast("bigint").alias("n_hit_grams"))
    )


def repetition_stats(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Gopher-style repetition signals per document: token count,
    distinct-token ratio, top-token share, duplicate-bigram fraction
    (high repetition -> low-quality machine-generated or boilerplate
    text). Explode + two-level aggregation: partial (map-side) combine
    on (doc, token) collapses repeats before the shuffle, so the
    shuffled volume is bounded by per-doc vocabulary, not corpus size.

    Returns ``id_col, n_tokens, distinct_ratio, top_share,
    dup_bigram_frac`` (ratios rounded to 6 dp; docs with no tokens are
    absent).

    Every signal is a function of ONE document, so the whole operator
    is scan-local: distinct counts via ``array_distinct`` and the
    top-token frequency via a sorted-run ``aggregate`` (sort the token
    array, longest equal-run = max frequency) — higher-order Catalyst
    expressions, ZERO shuffles, one pass over the scan. The earlier
    explode + two-level-aggregate formulation shuffled the corpus'
    per-doc vocabulary twice; at 100x corpus size that exchange is the
    bottleneck while this form stays embarrassingly parallel.

    Evaluation discipline (measured 195 s -> ~2 s at sf0.1): every
    derived array (tokens, bigrams) is let-bound (:func:`let_`) so it
    is computed once per row, and the five raw counters are emitted
    through ONE ``inline`` generator — a projection-collapse barrier;
    naming them as sibling columns lets CollapseProject re-inline the
    whole token pipeline into every downstream reference."""
    from pyspark.sql import functions as _F

    toks = _F.split(normalize_text(_F.col(text_col)), " ")

    def _max_run(arr):
        # longest run of equal values in the SORTED array == max
        # multiplicity. Accumulator: (prev value, current run, best).
        init = _F.struct(
            _F.lit(None).cast("string").alias("prev"),
            _F.lit(0).cast("bigint").alias("run"),
            _F.lit(0).cast("bigint").alias("best"),
        )

        def step(acc, x):
            same = _F.coalesce(x == acc["prev"], _F.lit(False))
            run2 = _F.when(same, acc["run"] + 1).otherwise(_F.lit(1).cast("bigint"))
            return _F.struct(
                x.alias("prev"),
                run2.alias("run"),
                _F.greatest(acc["best"], run2).alias("best"),
            )

        return _F.aggregate(_F.array_sort(arr), init, step, lambda acc: acc["best"])

    def _bigrams(ts):
        starts = _F.sequence(_F.lit(1), _F.greatest(_F.size(ts) - 1, _F.lit(0)))
        grams = _F.transform(
            starts, lambda i: _F.array_join(_F.slice(ts, i, 2), " ")
        )
        return _F.when(_F.size(ts) >= 2, grams).otherwise(
            _F.array().cast("array<string>")
        )

    def _counters(ts):
        def inner(bg):
            return _F.struct(
                _F.size(ts).cast("bigint").alias("n_tokens"),
                _F.size(_F.array_distinct(ts)).cast("bigint").alias("n_distinct"),
                _max_run(ts).alias("top_c"),
                _F.size(bg).cast("bigint").alias("n_bg"),
                _F.size(_F.array_distinct(bg)).cast("bigint").alias("n_bg_distinct"),
                (_F.length(_F.concat_ws("", ts)) > 0).alias("nonempty"),
            )

        return let_(_bigrams(ts), inner)

    base = docs.select(
        _F.col(id_col), _F.inline(_F.array(let_(toks, _counters)))
    ).filter(_F.col("nonempty"))

    return base.select(
        id_col,
        _F.col("n_tokens"),
        _F.round(_F.col("n_distinct") / _F.col("n_tokens"), 6).alias(
            "distinct_ratio"
        ),
        _F.round(_F.col("top_c") / _F.col("n_tokens"), 6).alias("top_share"),
        _F.round(
            _F.when(
                _F.col("n_bg") > 0,
                1 - _F.col("n_bg_distinct") / _F.col("n_bg"),
            ).otherwise(_F.lit(0.0)),
            6,
        ).alias("dup_bigram_frac"),
    )


def lang_id(col: Column) -> Column:
    """Marker-word language ID: the language with the highest marker
    count, ties broken by fixed language order (en,de,fr,es), 'und'
    (undetermined) when no marker hits."""
    counts = {
        lang: F.size(
            F.regexp_extract_all(
                F.lower(col), F.lit(r"\b(" + "|".join(words) + r")\b"), F.lit(0)
            )
        )
        for lang, words in LANG_MARKERS.items()
    }
    best = F.greatest(*counts.values())
    out = F.lit("und")
    # reversed fixed order so earlier languages win ties
    for lang in reversed(list(LANG_MARKERS)):
        out = F.when((counts[lang] > 0) & (counts[lang] == best), F.lit(lang)).otherwise(out)
    return out


def lang_id_sql(col_sql: str) -> str:
    """The DuckDB twin of :func:`lang_id` (same tie rules)."""
    counts = {
        lang: f"len(regexp_extract_all(lower({col_sql}), '\\b({'|'.join(words)})\\b'))"
        for lang, words in LANG_MARKERS.items()
    }
    best = f"greatest({', '.join(counts.values())})"
    expr = "'und'"
    for lang in reversed(list(LANG_MARKERS)):
        c = counts[lang]
        expr = f"CASE WHEN {c} > 0 AND {c} = {best} THEN '{lang}' ELSE {expr} END"
    return expr


def split_bucket(id_col: Column, n: int = 100) -> Column:
    """Engine-portable deterministic bucket in [0, n): first 8 hex
    digits of md5 of the id's decimal string, mod n. md5 is bit-stable
    across engines (unlike Spark's murmur ``hash()``), so an oracle —
    or a later rerun on different hardware/partitioning — derives the
    identical assignment. Pure Catalyst."""
    from pyspark.sql import functions as F

    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10)
    return (h.cast("bigint") % n).alias("bucket")


def deterministic_split(
    df,
    id_col: str = "doc_id",
    weights: tuple = (80, 10, 10),
    labels: tuple = ("train", "val", "test"),
):
    """Reproducible train/val/test assignment: md5-bucket each row by
    id and cut at cumulative weights — stable under reruns, engine
    changes, and data reordering (the property ``df.sample`` lacks),
    and a new document never moves existing documents between splits.
    Adds a ``split`` column."""
    from pyspark.sql import functions as F

    n = sum(weights)
    b = split_bucket(F.col(id_col), n)
    expr = F.lit(labels[-1])
    cum = 0
    conds = []
    for w, lab in zip(weights[:-1], labels[:-1]):
        cum += w
        conds.append((b < cum, lab))
    for cond, lab in reversed(conds):
        expr = F.when(cond, lab).otherwise(expr)
    return df.withColumn("split", expr)


# --------------------------------------------------------------- span dedup


def _dup_window_hits(docs, n: int, id_col: str, text_col: str):
    """(doc, 1-based window position) of every token ``n``-gram window
    whose gram occurs MORE THAN ONCE in the corpus — any document, any
    position (self-repetition counts, matching the exact-substring
    dedup definition of Lee et al., "Deduplicating Training Data Makes
    Language Models Better").

    Shape at 100 TB: the posting list is one row per corpus token —
    the volume of a word-count, Spark's canonical workload. The
    duplicate-gram set comes from a map-side-combined count (partial
    aggregation collapses each scan partition's repeats before the
    shuffle), and the join back is gram-clustered on both sides."""
    wins = docs.select(
        F.col(id_col),
        F.posexplode(_token_ngrams(F.col(text_col), n)).alias("__p0", "__gram"),
    ).select(id_col, (F.col("__p0") + 1).alias("pos"), "__gram")
    dup_grams = (
        wins.groupBy("__gram")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= 2)
        .select("__gram")
    )
    return wins.join(dup_grams, "__gram").select(id_col, "pos")


def duplicate_spans(docs, n: int = 8, id_col: str = "doc_id", text_col: str = "text"):
    """Maximal duplicated spans per document: overlapping/adjacent
    duplicated ``n``-gram windows merge into one span (gaps-and-islands
    over window positions). Returns one row per span:
    ``id_col, span_start, span_end`` — 1-based inclusive TOKEN indexes
    into the normalized token sequence (the training-data scrubber cuts
    exactly these ranges).

    One window partitioned by document (per-doc data, never corpus-
    wide) + one aggregation; the heavy lifting is in
    :func:`_dup_window_hits`."""
    from pyspark.sql import Window

    hits = _dup_window_hits(docs, n, id_col, text_col)
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + (n - 1)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = hits.withColumn(
        # new span only when a GAP exists: a window starting at
        # prev_end+1 abuts the previous span (contiguous coverage) and
        # must merge — "maximal duplicated spans", the documented
        # contract a scrubber relies on
        "__new",
        (F.col("pos") > F.coalesce(prev_end, F.lit(-2)) + F.lit(1)).cast("int"),
    ).withColumn(
        "__span",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        flagged.groupBy(id_col, "__span")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (n - 1)).alias("span_end"),
        )
        .select(id_col, "span_start", "span_end")
    )


def duplicate_span_stats(
    docs, n: int = 8, id_col: str = "doc_id", text_col: str = "text"
):
    """Per-document exact substring-level duplication signals — the
    span-level complement of the document-level dedup family: a window
    is duplicated when its token ``n``-gram occurs >=2 times in the
    corpus; overlapping windows merge into maximal spans.

    Returns one row per document (clean/short docs included, zeros):
    ``id_col, n_tokens, n_dup_windows, n_spans, dup_tokens, dup_frac``
    where ``dup_tokens`` is the merged span coverage in tokens and
    ``dup_frac = dup_tokens / n_tokens`` (6 dp).

    The island merge runs as ONE scan-local higher-order ``aggregate``
    over each doc's sorted hit positions (bounded by the doc's own
    length) — no per-row window, one groupBy shuffle."""
    hits = _dup_window_hits(docs, n, id_col, text_col)

    init = F.struct(
        F.lit(-1).cast("bigint").alias("prev_end"),
        F.lit(0).cast("bigint").alias("spans"),
        F.lit(0).cast("bigint").alias("dup"),
    )

    def step(acc, p):
        end = (p + (n - 1)).cast("bigint")
        # gap test matches duplicate_spans: abutting windows merge
        new = p.cast("bigint") > acc["prev_end"] + F.lit(1).cast("bigint")
        return F.struct(
            F.greatest(acc["prev_end"], end).alias("prev_end"),
            (acc["spans"] + F.when(new, 1).otherwise(0)).alias("spans"),
            (
                acc["dup"]
                + F.when(new, F.lit(n).cast("bigint")).otherwise(end - acc["prev_end"])
            ).alias("dup"),
        )

    per_doc = hits.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_dup_windows"),
        F.sort_array(F.collect_list("pos")).alias("__ps"),
    )
    per_doc = per_doc.select(
        id_col,
        "n_dup_windows",
        F.aggregate(
            "__ps", init, step, lambda acc: F.struct(acc["spans"], acc["dup"])
        ).alias("__agg"),
    ).select(
        id_col,
        "n_dup_windows",
        F.col("__agg.spans").alias("n_spans"),
        F.col("__agg.dup").alias("dup_tokens"),
    )

    toks = F.split(normalize_text(F.col(text_col)), " ")
    base = docs.select(
        F.col(id_col),
        F.when(F.length(F.concat_ws("", toks)) == 0, F.lit(0))
        .otherwise(F.size(toks))
        .cast("bigint")
        .alias("n_tokens"),
    )
    out = base.join(per_doc, id_col, "left")
    return out.select(
        id_col,
        "n_tokens",
        F.coalesce("n_dup_windows", F.lit(0)).cast("bigint").alias("n_dup_windows"),
        F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
        F.coalesce("dup_tokens", F.lit(0)).cast("bigint").alias("dup_tokens"),
        F.round(
            F.when(
                F.col("n_tokens") > 0,
                F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_frac"),
    )
