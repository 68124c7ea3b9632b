"""Last-writer-wins dedup per key (SURVEY.md §2.9 windows; north_star
"max-by-(binlog_pos, ts) window per key").

The reference gets this ordering for free from its single reader
(binlog arrival order IS the total order). Under parallelism we make
it explicit: the winner per ``(conv_id, turn_idx)`` is the event with
the greatest ``(file, pos, row_idx)`` — a total order, so ties are
impossible (``ts`` alone would not be; SURVEY.md §7 hard parts).

Scale notes (100 TB / 10^10 events):

* ``groupBy(key).agg(max_by(payload, order_key))`` compiles to a
  hash aggregation with **map-side partial aggregation**: each input
  partition emits at most one row per key before the shuffle. A hot
  conversation that dominates input partitions is therefore collapsed
  *before* it can skew the shuffle — this is the two-phase (salted)
  aggregation done by the engine for free, and why we prefer it over a
  ``row_number() over (partition by key)`` window, which would shuffle
  **all** events of a hot key to one task (no partial aggregation).
* The explicit-salt variant below exists for the pathological case
  where a single key floods single input partitions (measurable via
  metrics); it demonstrates the classic two-phase pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..schema import LOG_ORDER


def _order_key():
    return F.struct(*[F.col(c) for c in LOG_ORDER])


def lww_latest(
    df: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
) -> DataFrame:
    """One row per key: the payload of the event greatest in log order.

    Input may contain exact duplicates (replay overlap) — max_by picks
    the same winner regardless, so no pre-dedup pass is needed.
    Returns ``key_cols + payload_cols``.
    """
    payload = F.struct(*[F.col(c).alias(c) for c in payload_cols])
    agg = df.groupBy(*key_cols).agg(F.max_by(payload, _order_key()).alias("__w"))
    return agg.select(*key_cols, *[F.col(f"__w.{c}").alias(c) for c in payload_cols])


def lww_latest_salted(
    df: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Explicit two-phase LWW: local max per (key, salt), then global
    max per key. Semantically identical to :func:`lww_latest`; use when
    profiling shows a single key saturating the partial-agg hash map.
    Salt is derived from the total order key, so it is deterministic.
    """
    payload = F.struct(*[F.col(c).alias(c) for c in payload_cols])
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in LOG_ORDER]), F.lit(n_salts))
    local = (
        df.withColumn("__salt", salt)
        .groupBy(*key_cols, "__salt")
        .agg(F.max_by(payload, _order_key()).alias("__w"), F.max(_order_key()).alias("__k"))
    )
    glob = local.groupBy(*key_cols).agg(F.max_by(F.col("__w"), F.col("__k")).alias("__w"))
    return glob.select(*key_cols, *[F.col(f"__w.{c}").alias(c) for c in payload_cols])


# single source of truth for the one-char op encoding in the packed
# order key; the encode/decode when-chains below are both generated
# from it (a new op added here reaches both sides)
_OP_CODE = {"INSERT": "I", "UPDATE": "U", "DELETE": "D"}


def _encode_op(op_col: str):
    items = list(_OP_CODE.items())
    expr = F.when(F.col(op_col) == items[0][0], F.lit(items[0][1]))
    for name, code in items[1:-1]:
        expr = expr.when(F.col(op_col) == name, F.lit(code))
    return expr.otherwise(F.lit(items[-1][1]))


def _decode_op(code_col):
    items = list(_OP_CODE.items())
    expr = F.when(code_col == items[0][1], F.lit(items[0][0]))
    for name, code in items[1:-1]:
        expr = expr.when(code_col == code, F.lit(name))
    return expr.otherwise(F.lit(items[-1][0]))


def lww_latest_packed(
    df: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
    kv_col: str = "after_kv",
) -> DataFrame:
    """LWW dedup with MAP-SIDE PARTIAL AGGREGATION via the
    packed-argmax trick: the order key and payload are packed into ONE
    string whose lexicographic order equals the log order::

        file ++ lpad(pos,12) ++ lpad(row_idx,6) ++ 0x01 ++ opcode ++ kv

    and the winner is a plain ``max(string)``. Var-length agg buffers
    still plan as SortAggregate (strings are not UnsafeRow-mutable),
    BUT unlike ``max_by(struct_payload, struct_order)`` — whose
    repartition workaround sorts and shuffles EVERY event — this
    compiles to partial+final aggregation: each input partition emits
    at most one packed row per key before the exchange, so the shuffle
    carries the key set, not the event stream, and hot keys collapse
    BEFORE the shuffle (no explicit salting needed on this path).

    Measured (alternating A/B, 20.2M rows, local[32]): equal wall to
    the repartition+max_by plan on the default workload (keys are
    mostly unique per batch, so there is little to combine and the
    pre-shuffle sort offsets the shuffle saving) — the pipeline-only
    dedup segment alone runs ~1.5x faster. Chosen as the default for
    the SKEW story: a flooded (conv_id, turn_idx) key collapses
    map-side here, while the repartition plan funnels the whole flood
    through one task.

    Prefix-order invariants (both already engine-wide): binlog file
    names within a stream are equal-length ASCII (rotation ordering is
    lexicographic everywhere, see ``after_watermark``), and positions
    fit 12 digits / row_idx 6 digits. The op rides as a single
    character, so the payload after the 0x01 separator may contain any
    bytes. Ties are impossible (the log order is total; exact
    duplicate frames pack identically).

    Returns ``key_cols + [op_col, kv_col]`` like :func:`lww_latest`.
    """
    ordk = F.concat(
        F.col("file"),
        F.lpad(F.col("pos").cast("string"), 12, "0"),
        F.lpad(F.col("row_idx").cast("string"), 6, "0"),
    )
    op_code = _encode_op(op_col)
    # NULL payloads must not poison the pack: F.concat of a NULL makes
    # the whole packed string NULL and max() would skip the true latest
    # event. Ride a one-char null flag after the opcode and decode back.
    null_flag = F.when(F.col(kv_col).isNull(), F.lit("N")).otherwise(F.lit("V"))
    packed = F.concat(
        ordk, F.lit("\x01"), op_code, null_flag, F.coalesce(F.col(kv_col), F.lit(""))
    )
    agg = df.groupBy(*key_cols).agg(F.max(packed).alias("__w"))
    sep = F.locate("\x01", F.col("__w"))
    op_back = F.substring(F.col("__w"), sep + 1, 1)
    kv_null = F.substring(F.col("__w"), sep + 2, 1) == "N"
    return agg.select(
        *key_cols,
        _decode_op(op_back).alias(op_col),
        F.when(kv_null, F.lit(None).cast("string"))
        .otherwise(F.col("__w").substr(sep + 3, F.length("__w")))
        .alias(kv_col),
    )


def exact_dedup(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Exact duplicate elimination (replayed frames). Hash-based
    ``dropDuplicates`` — safe because replayed frames are bytewise
    identical copies; any representative is correct."""
    return df.dropDuplicates(subset or list(LOG_ORDER))
