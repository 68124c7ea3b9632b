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


def exact_dedup(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Exact duplicate elimination (replayed frames). Hash-based
    ``dropDuplicates`` — safe because replayed frames are bytewise
    identical copies; any representative is correct."""
    return df.dropDuplicates(subset or list(LOG_ORDER))
