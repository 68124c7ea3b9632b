"""Deterministic sampling operators for training-data mixture
construction: hash-threshold Bernoulli sampling per group (the
pretraining "mixture weights" pass) and per-group token-budget
downsampling (fill each language/source to a token budget).

Why hash-threshold instead of ``DataFrame.sample``: a 100 TB mixture
pass must be (a) reproducible across runs, engines, and cluster sizes
— ``sample()`` depends on partition layout and RNG seeding per task —
and (b) stable under re-partitioning, retries, and speculative
execution. Keying the decision on ``md5(key || salt)`` makes the kept
set a pure function of the data, so replays/audits re-derive it
exactly; the same formula runs in ANSI SQL, which is what the DuckDB
contract oracle does (``__spark_entry__.oracle_sql``).

Scale shape: ``mixture_sample`` is a scan-local filter — zero
shuffles, fully pushdown-friendly, embarrassingly parallel.
``token_budget_sample`` sorts WITHIN each group by the same hash
(one shuffle on the group column); for a group so hot that one
reducer can't sort it, take the two-pass route instead: estimate the
keep-rate from a mixture_sample pass, then apply the rate as a pure
filter (see docstring).

Reference surface: the reference engine has no sampling operators —
this family extends §2 the way the dedup/sketch families do, as
first-class training-data-pipeline coverage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_U32 = float(2**32)


def hash_uniform(key: Column, salt: str) -> Column:
    """Deterministic uniform draw in [0, 1): the first 8 hex chars of
    ``md5(key || salt)`` as a 32-bit integer, scaled. Identical in
    ANSI SQL: ``CAST(CONCAT('0x', SUBSTR(MD5(key || salt), 1, 8)) AS
    UBIGINT) / 4294967296.0`` — the engine/oracle pair agrees
    byte-for-byte."""
    # NULL keys would md5 to NULL and silently drop the row from any
    # sampler regardless of weight — give them one deterministic draw
    # instead (chr(0) cannot collide with a real stringified key)
    k = F.coalesce(key.cast("string"), F.lit("\x00"))
    h = F.conv(F.substring(F.md5(F.concat(k, F.lit(salt))), 1, 8), 16, 10)
    return h.cast("double") / F.lit(_U32)


def hash_uniform_sql(key_sql: str, salt: str) -> str:
    """The DuckDB twin of :func:`hash_uniform` (same bytes, same
    scale)."""
    return (
        f"cast(concat('0x', substr(md5(coalesce(cast({key_sql} as varchar), chr(0))"
        f" || '{salt}'), 1, 8)) as ubigint) / 4294967296.0"
    )


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, float],
    group_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "mix-v1",
    default_weight: float = 0.0,
) -> DataFrame:
    """Deterministic Bernoulli mixture sampling: keep each row with
    its group's probability (``weights[group]``; unlisted groups get
    ``default_weight``). Adds ``sample_u`` — the row's uniform draw
    rounded to 9 dp FOR DISPLAY/STABLE HASHING; the keep decision uses
    the full-precision draw, so an audit must recompute the exact
    draw from (key, salt) via :func:`hash_uniform` /
    :func:`hash_uniform_sql`, never compare the rounded value against
    the weight (boundary rows within 5e-10 of a weight would disagree).

    The kept set is a pure function of (key, salt, weights): re-runs,
    replays, different cluster sizes, and the SQL oracle all agree
    exactly. Upsampling (weight > 1) is out of scope here — repeat
    the pass with distinct salts to draw multiple epochs.
    """
    for g, w in weights.items():
        if not (0.0 <= w <= 1.0):
            raise ValueError(f"weight for {g!r} must be in [0, 1], got {w}")
    if not 0.0 <= default_weight <= 1.0:
        raise ValueError("default_weight must be in [0, 1]")
    clash = {"sample_u"} & set(docs.columns)
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with mixture_sample "
            "output columns; rename them first"
        )
    u = hash_uniform(F.col(key_col), salt)
    p = F.lit(float(default_weight))
    for g, w in sorted(weights.items()):
        p = F.when(F.col(group_col) == g, F.lit(float(w))).otherwise(p)
    return (
        docs.withColumn("sample_u", F.round(u, 9))
        .filter(u < p)
    )


def token_budget_sample(
    docs: DataFrame,
    budgets: dict[str, int],
    group_col: str = "lang",
    key_col: str = "doc_id",
    token_col: Column | str = "n_tokens",
    salt: str = "budget-v1",
) -> DataFrame:
    """Fill each group to a token budget with a deterministic,
    hash-ordered prefix: rows are ranked inside their group by
    ``hash_uniform(key)`` (a reproducible shuffle), and a row is kept
    while the running token total INCLUDING the row stays within the
    group's budget. Groups without a budget are dropped.

    The kept set is again a pure function of the data — the SQL twin
    ranks by the same hash and compares the same running sum, so the
    oracle reproduces the exact prefix. The first over-budget row is
    excluded (strict ``<=``): budgets are honored exactly, at the cost
    of possibly undershooting by less than one document.

    Scale: one shuffle on ``group_col`` + a per-group sort (the window
    rank). Mixture passes have few groups (languages/sources), so the
    sort is the classic skew risk at 10^9 rows per group; there, run
    :func:`mixture_sample` with rate ≈ budget / group_tokens instead
    and tolerate the ±sqrt noise, or pre-split hot groups by a salt
    column. This exact-prefix form is for budget-accurate curation at
    per-group cardinalities a single sort handles (<~10^8).
    """
    for g, b in budgets.items():
        if b < 0:
            raise ValueError(f"budget for {g!r} must be >= 0, got {b}")
    clash = {"running_tokens", "__budget"} & set(docs.columns)
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with "
            "token_budget_sample working/output columns; rename them first"
        )
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    u = hash_uniform(F.col(key_col), salt)
    b = F.lit(None).cast("bigint")
    for g, v in sorted(budgets.items()):
        b = F.when(F.col(group_col) == g, F.lit(int(v))).otherwise(b)
    w = Window.partitionBy(group_col).orderBy(u.asc(), F.col(key_col).asc())
    run = F.sum(tok.cast("bigint")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        # NULL/negative token counts cannot be budgeted: a NULL row
        # would be kept for free (sum() skips NULLs) and a negative one
        # makes the running sum non-monotonic, re-admitting rows after
        # the budget is spent — both silently break the exact-prefix
        # contract, so such rows are excluded as invalid input
        docs.filter(tok.isNotNull() & (tok.cast("bigint") >= 0))
        .withColumn("__budget", b)
        .filter(F.col("__budget").isNotNull())
        .withColumn("running_tokens", run)
        .filter(F.col("running_tokens") <= F.col("__budget"))
        .drop("__budget")
    )


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    n_salts: int = 16,
    rank_col: str = "rank",
    salt_on: Column | None = None,
) -> DataFrame:
    """EXACT per-group top-k without a single-task-per-group sort —
    the source/domain-capping pass of web-scale curation ("no one
    domain contributes more than K documents"), where the plain
    ``row_number() over (partition by group)`` dies on the one domain
    that is half the corpus.

    Two-phase (same trade as the engine's two-phase sequencer, B3):

    1. rows are split into ``n_salts`` deterministic shards per group
       (``pmod(xxhash64(salt_on), n_salts)``); a LOCAL top-k per
       (group, shard) survives. Any element of the true global top-k
       is, within its own shard, still top-k — so the union of shard
       winners is a superset of the answer for ANY shard assignment;
       the hash only balances sizes.
    2. the ≤ ``n_salts * k`` survivors per group are ranked exactly.

    Phase-1 tasks sort ~|group|/n_salts rows, phase-2 tasks sort
    ≤ n_salts*k — both bounded, vs the plain window's |group|.

    ``order_cols`` must be a TOTAL order (append a unique tie-break,
    e.g. the id column) so the result is deterministic and replayable;
    ``salt_on`` (the shard key) defaults to a hash of every hashable
    input column (map-typed columns are excluded — Spark prohibits
    hashing maps) — a pure function of the row, so replays shard
    identically regardless of partition layout. Returns the winners
    with ``rank_col`` (1-based).
    """
    if not order_cols:
        raise ValueError("order_cols must be non-empty (and a total order)")
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    clash = {rank_col, "__shard", "__r1"} & set(df.columns)
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with topk_per_group "
            f"working/output columns; rename them or pass a different rank_col"
        )
    if salt_on is None:
        # hash expressions prohibit MapType anywhere in the column type —
        # shard on the hashable columns only (still a pure row function)
        hashable = [
            f.name for f in df.schema.fields if "MapType" not in repr(f.dataType)
        ]
        if not hashable:
            raise ValueError("no hashable columns to shard on; pass salt_on")
        shard = F.pmod(F.xxhash64(*[F.col(c) for c in hashable]), F.lit(n_salts))
    else:
        shard = F.pmod(F.xxhash64(salt_on), F.lit(n_salts))
    salted = df.withColumn("__shard", shard)
    w1 = Window.partitionBy(*group_cols, "__shard").orderBy(*order_cols)
    survivors = (
        salted.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .drop("__r1", "__shard")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        survivors.withColumn(rank_col, F.row_number().over(w2).cast("bigint"))
        .filter(F.col(rank_col) <= k)
    )
