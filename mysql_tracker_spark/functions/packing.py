"""Sequence packing: bin documents into fixed token-budget training
sequences.

LLM pre-training/SFT pipelines concatenate short documents into full
context-window sequences ("packing") to avoid padding waste. The
assignment rule here is the standard greedy sequential fill: walk the
group's documents in a deterministic order and open a new bin whenever
the next document would overflow the budget (a document larger than
the budget gets a bin of its own). Greedy-sequential — NOT first-fit
-decreasing — because determinism and streamability matter more in a
data pipeline than the last few percent of packing density.

Scale shape: the fill is inherently sequential WITHIN a group, so
parallelism comes from the grouping key. At corpus scale you pack per
(group, shard) where ``shard = pmod(hash(id), n_shards)`` — packing is
a local decision and sequences never need to cross shards, so this is
embarrassingly parallel with one shuffle on the group key and bounded
per-task state (one pandas batch per group-shard). The per-batch walk
is a numpy loop over token counts only (no text moves through Python).
"""
from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F, types as T

from .text import token_count


def pack_sequences(
    docs: DataFrame,
    budget: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int | None = None,
) -> DataFrame:
    """``(group_col, id_col, n_tokens, bin_idx)`` — greedy sequential
    packing of each group's documents (ordered by ``id_col``) into
    bins of at most ``budget`` whitespace tokens (oversize documents
    get a singleton bin).

    ``n_shards`` adds a ``pmod(hash(id), n_shards)`` component to the
    grouping key — the 100 TB path: packing parallelizes per (group,
    shard), and the emitted ``bin_idx`` is made GLOBALLY unique per
    group by interleaving (``local_bin * n_shards + shard``), so two
    shards can never emit the same (group, bin_idx) — downstream
    consumers (``packed_bins_summary``, the sequence builder) would
    otherwise silently merge unrelated bins into one oversized
    "sequence". The default (None) keeps bins global and dense per
    group, which is what the SQL oracle mirrors.
    """
    keys = [group_col]
    sel = [
        F.col(group_col),
        F.col(id_col),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    ]
    if n_shards is not None:
        sel.append(F.pmod(F.hash(F.col(id_col)), F.lit(n_shards)).alias("__shard"))
        keys.append("__shard")
    toks = docs.select(*sel)

    in_fields = {f.name: f for f in toks.schema.fields}
    out_schema = T.StructType(
        [
            in_fields[group_col],
            in_fields[id_col],
            T.StructField("n_tokens", T.LongType()),
            T.StructField("bin_idx", T.LongType()),
        ]
    )

    def pack(pdf):
        pdf = pdf.sort_values(id_col, kind="stable").reset_index(drop=True)
        tok = pdf["n_tokens"].to_numpy()
        bins = np.zeros(len(pdf), dtype=np.int64)
        fill = 0
        b = 0
        # greedy fill is order-dependent by definition; this loop
        # touches one int per document (token counts only)
        for i, t in enumerate(tok):
            if i == 0:
                fill = t
            elif fill + t > budget:
                b += 1
                fill = t
            else:
                fill += t
            bins[i] = b
        if n_shards is not None and "__shard" in pdf.columns and len(pdf):
            # interleave: shard-local bin b -> b * n_shards + shard
            bins = bins * n_shards + int(pdf["__shard"].iloc[0])
        pdf["bin_idx"] = bins
        return pdf[[group_col, id_col, "n_tokens", "bin_idx"]]

    return toks.groupBy(*keys).applyInPandas(pack, out_schema)


def packed_bins_summary(packed: DataFrame, group_col: str = "lang") -> DataFrame:
    """``(group_col, bin_idx, n_docs, bin_tokens)`` — per-bin roll-up
    of :func:`pack_sequences` output (padding-efficiency accounting)."""
    return packed.groupBy(group_col, "bin_idx").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
    )
