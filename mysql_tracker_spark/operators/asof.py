"""As-of (temporal point-in-time) join: for every left row, the latest
right row of the same key at-or-before (or strictly-before) the left
row's timestamp.

The reference has no such operator (its pipeline is a totally-ordered
single stream, ``tracker/parser/LogEventConvert.java`` sees events in
binlog order), but a CDC consumer constantly needs it: "what was the
state of conversation X when event Y happened", enrichment of a fact
stream against a slowly-changing dimension, lag attribution. Spark has
no built-in as-of join either, so it is built here from primitives —
twice, because the right construction depends on the lookback bound:

* :func:`asof_join` — unbounded lookback. Union both sides, ONE shuffle
  on the key, and a running ``last(payload, ignorenulls=True)`` window
  ordered by ``(ts, side, ties)``. O(n log n) per key partition, no
  join explosion ever; the per-key sort is the same work a sort-merge
  join would do. Skew caveat: one task per hot key, the same bound as
  any per-key window — use the binned variant when a tolerance exists.

* :func:`asof_join_binned` — bounded lookback (``tolerance_s``). Bin
  both sides into tolerance-width time buckets, duplicate each right
  row into its own and the NEXT bin (a left row in bin b only sees
  matches from bins b-1 and b), equi-join on ``(key, bin)``, then
  argmax per left row. Shuffle granularity is ``(key, bin)`` — a hot
  key's traffic spreads over its time range, bounding max-task size.
  The follow-up groupBy adds no shuffle: hash partitioning on
  ``(key, bin)`` already satisfies the grouping's clustered
  distribution (asserted in tests/test_asof.py).

Choosing between them — MEASURED (tools/asof_bench.py, local[32],
digest-equal outputs): the window path's single-task-per-key sort is
cheap far longer than intuition says (32M rows of one key sorted in
one task: 38.5 s), while the binned path pays a per-(key,bin)
left×right candidate product that grows with per-window density
(density 10/window: 9.5 s ≈ window path's 11.0 s; density 40/window at
16M hot rows: 286 s vs 38.5 s). Default to :func:`asof_join`; reach
for the binned variant when one key's volume exceeds what a single
task can sort (memory, not time, is the first wall) AND match density
per tolerance window is low — the regime of point-in-time lookups
against a sparse slowly-changing right side.

Both paths are pure Catalyst (zero Python stages) and return exactly
the left rows (left-outer semantics: unmatched rows keep NULL match
columns). Ties at equal right timestamp are broken by ``tie_cols``
(ascending; the LAST one wins), so results are deterministic whenever
``(right_ts, *tie_cols)`` is unique per key.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F, types as T


def _right_payload(right: DataFrame, right_ts: str, tie_cols, right_cols):
    """Struct of (match ts, tie columns, requested output columns)."""
    fields = [F.col(right_ts).alias("__ts")]
    fields += [F.col(t).alias(f"__tie{i}") for i, t in enumerate(tie_cols)]
    fields += [F.col(src).alias(out) for out, src in right_cols.items()]
    return F.struct(*fields)


def _pay_type(right: DataFrame, pay) -> T.DataType:
    return right.select(pay.alias("__p")).schema["__p"].dataType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: dict[str, str],
    tie_cols: tuple[str, ...] = (),
    inclusive: bool = True,
    tolerance_s: float | None = None,
) -> DataFrame:
    """Unbounded-lookback as-of join (union + running-last window).

    ``right_cols`` maps output column name -> right column; matched
    values appear under those names (NULL when no match). ``inclusive``
    matches ``right_ts <= left_ts``; strict matches ``<``. An optional
    ``tolerance_s`` nulls out matches older than the bound (the match
    is still found in O(1) extra work; use :func:`asof_join_binned`
    when the bound should also bound the shuffle).
    """
    on = list(on)
    ties = list(tie_cols)
    pay = _right_payload(right, right_ts, ties, right_cols)
    pay_t = _pay_type(right, pay)
    left_struct = F.struct(*[F.col(c) for c in left.columns])
    left_t = T.StructType(left.schema.fields)

    # Sort rank at equal ts: inclusive -> right rows first (visible to
    # the left row); strict -> right rows after (not yet visible).
    l_rank, r_rank = 1, (0 if inclusive else 2)
    tie_nulls = [
        F.lit(None).cast(right.schema[t].dataType).alias(f"__tie{i}")
        for i, t in enumerate(ties)
    ]
    lf = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__ts"),
        F.lit(l_rank).alias("__rank"),
        *tie_nulls,
        F.lit(None).cast(pay_t).alias("__pay"),
        left_struct.alias("__left"),
    )
    rf = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(r_rank).alias("__rank"),
        *[F.col(t).alias(f"__tie{i}") for i, t in enumerate(ties)],
        pay.alias("__pay"),
        F.lit(None).cast(left_t).alias("__left"),
    ).filter(F.col("__ts").isNotNull())
    # ^ a right row with NULL ts has no position on the timeline; the
    # window's ASC NULLS FIRST would otherwise sort it to the head of
    # the partition where it matches every left row preceding the
    # first real right row (the binned variant drops them implicitly —
    # NULL bin — so this also keeps the two variants agreeing)
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__rank", *[f"__tie{i}" for i in range(len(ties))])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = (
        lf.unionByName(rf)
        .withColumn("__m", F.last("__pay", ignorenulls=True).over(w))
        .filter(F.col("__rank") == l_rank)
    )
    if tolerance_s is not None:
        in_tol = (
            F.col("__ts").cast("double") - F.col("__m.__ts").cast("double")
        ) <= F.lit(float(tolerance_s))
        m = m.withColumn("__m", F.when(in_tol, F.col("__m")))
    return m.select(
        F.col("__left.*"),
        *[F.col(f"__m.{out}").alias(out) for out in right_cols],
    )


def asof_join_binned(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: dict[str, str],
    left_id: list[str],
    tolerance_s: float,
    tie_cols: tuple[str, ...] = (),
    inclusive: bool = True,
) -> DataFrame:
    """Bounded-lookback as-of join, skew-free: equi-join on
    (key, tolerance-width time bin) with right rows duplicated into the
    next bin, then argmax per left row. ``left_id`` must uniquely
    identify left rows (within a key) — it anchors the argmax.
    """
    on = list(on)
    ties = list(tie_cols)
    wsec = float(tolerance_s)
    pay = _right_payload(right, right_ts, ties, right_cols)

    lf = left.select(
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        *[F.col(c) for c in on],
        *[F.col(c).alias(f"__id_{c}") for c in left_id],
        F.col(left_ts).alias("__lts"),
        F.floor(F.col(left_ts).cast("double") / wsec).alias("__bin"),
    )
    rf = (
        right.select(
            *[F.col(c).alias(f"__r_{c}") for c in on],
            F.col(right_ts).alias("__rts"),
            pay.alias("__pay"),
            F.floor(F.col(right_ts).cast("double") / wsec).alias("__bin0"),
        )
        # each right row serves its own bin and the next one
        .withColumn("__rbin", F.explode(F.array(F.col("__bin0"), F.col("__bin0") + 1)))
        .drop("__bin0")
    )
    time_ok = (
        (F.col("__rts") <= F.col("__lts"))
        if inclusive
        else (F.col("__rts") < F.col("__lts"))
    ) & ((F.col("__lts").cast("double") - F.col("__rts").cast("double")) <= wsec)
    cond = reduce(
        lambda a, b: a & b,
        [lf["__bin"] == rf["__rbin"]]
        + [lf[c] == rf[f"__r_{c}"] for c in on]
        + [time_ok],
    )
    ordk = F.when(
        F.col("__pay").isNotNull(),
        F.struct(
            F.col("__pay.__ts"),
            *[F.col(f"__pay.__tie{i}") for i in range(len(ties))],
        ),
    )
    g = (
        lf.join(rf, cond, "left_outer")
        # same (key, bin) clustering as the join output -> no new shuffle
        .groupBy("__bin", *on, *[f"__id_{c}" for c in left_id])
        .agg(
            F.first("__left").alias("__left"),  # constant per group
            F.max_by(F.col("__pay"), ordk).alias("__m"),
        )
    )
    return g.select(
        F.col("__left.*"),
        *[F.col(f"__m.{out}").alias(out) for out in right_cols],
    )
