"""Conversation-level training-data operators over transcript tables.

The engine's target table is the multi-turn transcript table
``(conv_id, turn_idx, role, text, tool, ts)`` (BASELINE input_hint).
A training-data pipeline built on it needs conversation-granular
operators, not just document-granular ones:

- :func:`conv_fingerprint` / :func:`dedup_conversations` — exact
  conversation-level dedup: two conversations are duplicates iff their
  ordered (turn_idx, role, text) sequences are byte-identical
  (timestamps and ids excluded — re-ingested or mirrored conversations
  differ in both).
- :func:`render_chat` — serialize each conversation into one training
  sample string under a token budget, keeping the TAIL (most recent
  turns) — the standard context-window truncation rule for chat SFT.
- :func:`conv_stats` — structural stats per conversation (turn/role
  counts, alternation violations, tool-call count, wall duration) for
  quality filtering.
- :func:`boilerplate_turns` — turn texts repeated verbatim across many
  conversations (greeting templates, canned responses) — the
  conversation-granularity analogue of a stop-gram / max_df filter.

All four are pure Catalyst (aggregates + window functions, zero
Python rows). Scale shape: everything keys on conv_id, so one hash
shuffle on conv_id serves fingerprint, render and stats alike;
boilerplate detection is a text-keyed aggregation with map-side
partial aggregation. Nothing here is quadratic and nothing collects.
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F, Window

from .text import token_count

# ASCII unit/record separators: cannot appear in generated text, so the
# packed fingerprint string is unambiguous. NULL fields encode as the
# group separator — concat_ws SKIPS nulls, so without a sentinel the
# field positions collapse and (role=NULL, text='hi') would fingerprint
# identically to (role='hi', text=NULL): distinct conversations merged
# by dedup.
_FIELD_SEP = "\x1f"
_TURN_SEP = "\x1e"
_NULL_MARK = "\x1d"


def _nn(c):
    return F.coalesce(c.cast("string"), F.lit(_NULL_MARK))


def conv_fingerprint(df: DataFrame, conv_col: str = "conv_id") -> DataFrame:
    """``(conv_id, fingerprint, n_turns)`` — md5 over the ordered
    ``turn_idx<US>role<US>text`` turn sequence joined by ``<RS>``.

    Implementation: pack each turn into one string, ``collect_list``
    into an array (one row per conversation after the conv_id
    shuffle), ``array_sort`` — the packed string starts with the
    struct's turn_idx so struct sort order == turn order — then join
    and hash. Map-side partial aggregation applies to collect_list,
    and each conversation is bounded (thousands of turns at most), so
    the per-key state is small.
    """
    packed = F.struct(
        F.col("turn_idx"),
        F.concat_ws(
            _FIELD_SEP, F.col("turn_idx"), _nn(F.col("role")), _nn(F.col("text"))
        ).alias("t"),
    )
    return df.groupBy(F.col(conv_col).alias("conv_id")).agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(packed)), lambda x: x["t"]
                ),
                _TURN_SEP,
            )
        ).alias("fingerprint"),
        F.count(F.lit(1)).alias("n_turns"),
    )


def dedup_conversations(df: DataFrame, conv_col: str = "conv_id") -> DataFrame:
    """``(fingerprint, n_convs, keeper_conv, n_turns)`` — one row per
    distinct conversation CONTENT; ``keeper_conv`` is the minimum
    conv_id (the canonical survivor), ``n_convs`` how many exact
    copies exist. Filter ``n_convs > 1`` for the duplicate report;
    join ``keeper_conv`` back to keep one copy per group."""
    fp = conv_fingerprint(df, conv_col)
    return fp.groupBy("fingerprint").agg(
        F.count(F.lit(1)).alias("n_convs"),
        F.min("conv_id").alias("keeper_conv"),
        F.min("n_turns").alias("n_turns"),
    )


def render_chat(df: DataFrame, token_budget: int = 48) -> DataFrame:
    """``(conv_id, sample_text, n_turns_kept, n_tokens)`` — each
    conversation rendered ``role: text`` per line, truncated to the
    most recent turns whose whitespace-token total fits the budget.

    The tail-sum is a window over ``turn_idx DESC`` (rows unbounded
    preceding → current), then turns with ``tail_sum <= budget``
    survive — exactly "drop oldest turns until it fits". One shuffle
    on conv_id shared by the window and the final aggregation.
    """
    toks = df.withColumn("__tok", token_count(F.col("text")))
    w = (
        Window.partitionBy("conv_id")
        .orderBy(F.col("turn_idx").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept = toks.withColumn("__tail", F.sum("__tok").over(w)).filter(
        F.col("__tail") <= token_budget
    )
    line = F.struct(
        F.col("turn_idx"),
        F.concat_ws(": ", F.col("role"), F.col("text")).alias("l"),
    )
    return kept.groupBy("conv_id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(line)), lambda x: x["l"]),
            "\n",
        ).alias("sample_text"),
        F.count(F.lit(1)).alias("n_turns_kept"),
        F.sum("__tok").alias("n_tokens"),
    )


def conv_stats(df: DataFrame) -> DataFrame:
    """Per-conversation structural stats for quality filtering:
    ``(conv_id, n_turns, n_user, n_assistant, n_tool,
    n_alt_violations, duration_s)``. An alternation violation is two
    consecutive turns with the same role (e.g. a double user send).
    One conv_id shuffle; lag + aggregate share it."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    lagged = df.withColumn("__prev_role", F.lag("role").over(w))
    return lagged.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0)).alias("n_user"),
        F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0)).alias(
            "n_assistant"
        ),
        F.sum(F.when(F.col("role") == "tool", 1).otherwise(0)).alias("n_tool"),
        F.sum(
            F.when(F.col("role") == F.col("__prev_role"), 1).otherwise(0)
        ).alias("n_alt_violations"),
        (
            F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
        ).alias("duration_s"),
    )


def build_sft_samples(
    df: DataFrame,
    token_budget: int = 48,
    boilerplate_min_convs: int = 10,
    max_violations: int = 0,
) -> DataFrame:
    """The export pipeline a training run actually consumes, composed
    from the operators above: (1) drop turns whose text is
    cross-conversation boilerplate (>= ``boilerplate_min_convs``
    distinct conversations), (2) drop conversations whose REMAINING
    turn sequence still has more than ``max_violations`` same-role
    double-sends, (3) render the survivors under the token budget
    (tail truncation). Returns ``(conv_id, sample_text, n_turns_kept,
    n_tokens)``.

    Scale shape: the boilerplate set is tiny by construction (texts
    repeated across >= N conversations) — broadcast anti-join; the
    violation filter and render share one conv_id shuffle.
    """
    bp = boilerplate_turns(df, min_convs=boilerplate_min_convs).select("text")
    clean = df.join(F.broadcast(bp), "text", "left_anti")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    viol = (
        clean.withColumn("__prev_role", F.lag("role").over(w))
        .groupBy("conv_id")
        .agg(
            F.sum(
                F.when(F.col("role") == F.col("__prev_role"), 1).otherwise(0)
            ).alias("__nv")
        )
        .filter(F.col("__nv") <= max_violations)
        .select("conv_id")
    )
    return render_chat(clean.join(viol, "conv_id", "left_semi"), token_budget)


def incremental_conv_stats(
    table: DataFrame, prev_stats: DataFrame, changes: DataFrame
) -> DataFrame:
    """Incrementally maintain a materialized :func:`conv_stats` view
    from a CDC changelog (``LakeTable.read_changes`` output): stats
    for conversations touched by the change set are recomputed from
    the current table, untouched rows carry forward from
    ``prev_stats``, and fully-deleted conversations drop out (they are
    touched but have no surviving turns).

    This is the downstream-consumer pattern the changelog exists for:
    cost tracks the WORKING SET (distinct touched conv_ids — a
    semi-join prunes the table scan to their buckets' rows), never the
    table or history size. Equivalent to a full recompute by
    construction; the equivalence is asserted in tests.
    """
    touched = changes.select("conv_id").distinct()
    refreshed = conv_stats(table.join(touched, "conv_id", "left_semi"))
    carried = prev_stats.join(touched, "conv_id", "left_anti")
    return carried.unionByName(refreshed)


def conv_full_text(df: DataFrame) -> DataFrame:
    """``(conv_id, text)`` — each conversation's turn texts in
    turn_idx order joined by newlines (the rendering conv-level
    near-dup detection fingerprints over). One conv_id shuffle."""
    line = F.struct(F.col("turn_idx"), F.col("text").alias("t"))
    return df.groupBy("conv_id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(line)), lambda x: x["t"]), "\n"
        ).alias("text")
    )


def conv_signatures(
    df: DataFrame, k: int = 32, n: int = 3, seed: int = 42
) -> DataFrame:
    """``(conv_id, sig)`` — per-conversation MinHash signature (k
    permutations over word n-gram shingles of the rendered text): the
    persistent near-dup INDEX for a conversation corpus. Pure Catalyst
    (sketches.minhash_signature), one conv_id shuffle."""
    from .sketches import minhash_signature

    return conv_full_text(df).select(
        "conv_id", minhash_signature(F.col("text"), k=k, n=n, seed=seed).alias("sig")
    )


def incremental_conv_signatures(
    table: DataFrame,
    prev_sigs: DataFrame,
    changes: DataFrame,
    k: int = 32,
    n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Incrementally maintain the :func:`conv_signatures` near-dup
    index from a CDC changelog (``LakeTable.read_changes`` output):
    signatures for touched conversations are recomputed from the
    current table, untouched rows carry forward from ``prev_sigs``,
    fully-deleted conversations drop out (touched, no surviving
    turns). Same working-set cost model as
    :func:`incremental_conv_stats` — at 10^10 rows the per-batch index
    refresh touches only changed conversations' buckets, never the
    corpus. Equivalence to a full recompute is asserted in tests and
    in the cdc_incremental_minhash_index contract row."""
    touched = changes.select("conv_id").distinct()
    refreshed = conv_signatures(
        table.join(touched, "conv_id", "left_semi"), k=k, n=n, seed=seed
    )
    carried = prev_sigs.join(touched, "conv_id", "left_anti")
    return carried.unionByName(refreshed)


def conv_band_index(
    df: DataFrame, k: int = 32, bands: int = 8, n: int = 3, seed: int = 42
) -> DataFrame:
    """``(id, band, bh)`` — the persistent LSH BAND table over
    per-conversation MinHash signatures (:func:`conv_signatures`,
    Catalyst hash family): the index an at-ingest near-dup gate probes
    with ``sketches.near_dup_lookup(use_fast=False)``."""
    from .sketches import banded_signature_index

    return banded_signature_index(
        conv_signatures(df, k=k, n=n, seed=seed),
        id_col="conv_id",
        sig_col="sig",
        k=k,
        bands=bands,
    )


def incremental_conv_band_index(
    table: DataFrame,
    prev_index: DataFrame,
    changes: DataFrame,
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Incrementally maintain :func:`conv_band_index` from a CDC
    changelog: touched conversations re-signed and re-banded from the
    current table, untouched band rows carried forward, deleted
    conversations drop out. Same working-set cost model as
    :func:`incremental_conv_signatures` — per batch the corpus is
    never re-shingled, only changed conversations are."""
    touched = changes.select("conv_id").distinct()
    refreshed = conv_band_index(
        table.join(touched, "conv_id", "left_semi"), k=k, bands=bands, n=n, seed=seed
    )
    carried = prev_index.join(
        touched, prev_index["id"] == touched["conv_id"], "left_anti"
    )
    return carried.unionByName(refreshed)


_BAND_PARAMS_FILE = "index_params.json"


def conv_band_index_view(
    table, view_dir: str, k: int = 32, bands: int = 8, n: int = 3,
    seed: int = 42, keep_last: int = 2, n_view_buckets: int | None = None,
):
    """:func:`conv_band_index` packaged as a lakestore
    ``MaterializedView`` (the text twin of
    ``similarity.ann_index_view``): one ``sync(spark)`` per micro-batch
    keeps the near-dup gate's index in lock-step with the transcript
    table, with the view layer's crash-safety and no-op-at-unchanged-
    version semantics.

    The index's PROVENANCE — hash family + (k, bands, n, seed) — is
    stamped into ``index_params.json`` beside the view on first
    construction and validated on every later one: an index is only
    probeable under the exact banding it was built with, and a
    parameter drift across restarts would otherwise mix incompatible
    band rows (carried vs refreshed) with no error. Probe through
    :func:`conv_gate_lookup`, which reads the stamp instead of trusting
    the caller.

    ``n_view_buckets`` opts into bucketed view storage
    (``views.BucketedMaterializedView``): per sync only buckets with
    touched conversations are re-signed and rewritten, the rest carry
    by hardlink — working-set write cost at any index size. Per-conv
    signatures are bucket-local on conv_id, so the contract holds."""
    import json

    from ..views import BucketedMaterializedView, MaterializedView

    os.makedirs(view_dir, exist_ok=True)
    params = {"family": "catalyst", "k": k, "bands": bands, "n": n, "seed": seed}
    ppath = os.path.join(view_dir, _BAND_PARAMS_FILE)
    if os.path.exists(ppath):
        with open(ppath) as f:
            stored = json.load(f)
        if stored != params:
            raise ValueError(
                f"band index at {view_dir} was built with {stored}; got "
                f"{params} — matching parameters are required (delete the "
                "view dir to rebuild under new ones)"
            )
    else:
        tmp = f"{ppath}.tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(params, f)
        os.replace(tmp, ppath)

    def bootstrap(tdf: DataFrame) -> DataFrame:
        return conv_band_index(tdf, k=k, bands=bands, n=n, seed=seed)

    if n_view_buckets:
        return BucketedMaterializedView(
            table, view_dir, bootstrap, key_col="conv_id",
            n_buckets=n_view_buckets, keep_last=keep_last, view_key_col="id",
        )

    def refresh(tdf: DataFrame, prev: DataFrame, changes: DataFrame) -> DataFrame:
        return incremental_conv_band_index(
            tdf, prev, changes, k=k, bands=bands, n=n, seed=seed
        )

    return MaterializedView(table, view_dir, bootstrap, refresh, keep_last=keep_last)


def conv_gate_lookup(
    spark,
    view,
    table_df: DataFrame,
    incoming: DataFrame,
    threshold: float = 0.7,
) -> DataFrame:
    """The scale-correct at-ingest gate composition: check an INCOMING
    transcript batch against a synced :func:`conv_band_index_view` and
    return ``(probe_id, match_id, jaccard)`` near-dup flags.

    Reads the banding parameters from the view's provenance stamp (so a
    probe can never use the wrong hash family or (k, bands, n, seed) —
    the silent-zero-matches trap), and restricts the corpus render to
    the candidate conversations BEFORE the ``conv_full_text`` aggregate
    (a semi-join on conv_id under the groupBy), so per batch the table
    contributes only candidate rows — never a corpus-wide render."""
    import json

    from .sketches import jaccard_ngram, near_dup_candidates

    with open(os.path.join(view.view_dir, _BAND_PARAMS_FILE)) as f:
        p = json.load(f)
    probes = conv_full_text(incoming)
    cands = near_dup_candidates(
        probes,
        view.read(spark),
        id_col="conv_id",
        k=p["k"],
        bands=p["bands"],
        n=p["n"],
        seed=p["seed"],
        use_fast=(p["family"] == "fast"),
    )
    match_ids = cands.select(F.col("match_id").alias("conv_id")).distinct()
    corpus = conv_full_text(table_df.join(match_ids, "conv_id", "left_semi")).select(
        F.col("conv_id").alias("match_id"), F.col("text").alias("__mtxt")
    )
    ptxt = probes.select(
        F.col("conv_id").alias("probe_id"), F.col("text").alias("__ptxt")
    )
    return (
        cands.join(ptxt, "probe_id")
        .join(corpus, "match_id")
        .select(
            "probe_id",
            "match_id",
            F.round(
                jaccard_ngram(F.col("__ptxt"), F.col("__mtxt"), p["n"]), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def boilerplate_turns(df: DataFrame, min_convs: int = 10) -> DataFrame:
    """``(text, n_convs, n_occurrences)`` — turn texts that appear in
    at least ``min_convs`` DISTINCT conversations, verbatim. These are
    template/greeting turns a training pipeline masks or drops (the
    turn-level analogue of the documents' max_df stop-gram guard).
    Text-keyed aggregation: count_distinct(conv_id) partial-aggregates
    map-side on the text key, so the shuffle carries one row per
    distinct (text, conv_id) worst-case and hot templates collapse
    before the exchange."""
    return (
        df.groupBy("text")
        .agg(
            F.countDistinct("conv_id").alias("n_convs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_convs") >= min_convs)
    )
