"""SCD Type-2 history materialization: changelog -> versioned
dimension with ``[valid_from, valid_to)`` intervals.

The reference ships every change event downstream and leaves history
reconstruction to the consumer (its HBase sink keeps one row per event
under an increasing rowkey, ``tracker/HandlerNoParserMagpieHBase.java``
— time-travel means scanning the log). This operator is that
consumer's missing half: fold the ordered per-key change stream into
type-2 dimension rows, the shape warehouse joins actually want
("what was the value of key K at time T" becomes a range predicate,
not a log scan).

Semantics (one pass, one shuffle on the key):

* every non-DELETE change opens a version valid from its own
  timestamp; the version closes at the NEXT change's timestamp for the
  same key (``lead`` over the per-key order), whatever kind it is;
* a DELETE contributes no version row — it only closes its
  predecessor (its timestamp becomes the predecessor's ``valid_to``);
* ``is_current`` = the version is last in its key's stream
  (``valid_to IS NULL``); a key whose last change is a DELETE has no
  current version;
* ``version`` numbers all changes of the key (deletes included) in
  stream order, so version numbers are stable under later replays of
  a longer log prefix.

Plan shape: single hash exchange on ``key_cols``; window ``lead`` +
``row_number`` share the one sort; DELETE filtering happens after the
window (a delete must still advance ``lead``), everything stays in
whole-stage codegen. Per-key state is two window frames — no driver
state, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def scd2_history(
    changes: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    ts_col: str = "ts",
    op_col: str = "op",
    delete_op: str = "D",
    attr_cols: list[str] | None = None,
) -> DataFrame:
    """Fold an ordered changelog into SCD2 rows.

    ``order_cols`` must totally order each key's changes (e.g. the log
    position ``(file, pos, row_idx)`` or ``(ts, event_id)``); ``ts_col``
    supplies the interval bounds (it need not be an order col, but must
    be non-decreasing along it for intervals to nest sensibly).
    """
    if attr_cols is None:
        attr_cols = [
            c
            for c in changes.columns
            if c not in set(key_cols) | set(order_cols) | {ts_col, op_col}
        ]
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    versioned = changes.select(
        *key_cols,
        *attr_cols,
        F.col(op_col).alias("__op"),
        F.row_number().over(w).alias("version"),
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w).alias("valid_to"),
    )
    return versioned.filter(F.col("__op") != delete_op).select(
        *key_cols,
        "version",
        *attr_cols,
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )
