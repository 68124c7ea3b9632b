"""Ready-made ingest transforms for ``CdcApplyJob(transform=...)``
(Debezium single-message-transform analogue, applied to each batch's
post-LWW change set before the quality gates).

Contract for any transform: a pure, DETERMINISTIC row-wise Catalyst
expression over the change-set DataFrame (key cols + typed payload +
``__delete``) that preserves the column set and never modifies key
columns or ``__delete`` — replay of a fenced batch must reproduce
byte-identical rows, or exactly-once convergence breaks. Keep it
JVM-side (built-in functions, no Python UDFs): the hook runs on every
batch's winners in the hot path.

JSON job configs reference a transform by dotted path, e.g.
``"transform": "mysql_tracker_spark.transforms:redact_text"``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions.text import redact_pii


def redact_columns(*cols: str):
    """Factory: redact PII (emails / IPv4s / phone numbers, the frozen
    ``functions.text.PII_PATTERNS``) in the named text columns —
    scrubbing AT INGEST so raw PII never lands in the table, its
    changelog, or any downstream snapshot. Pure regexp_replace chains
    (scan-local, codegen'd, no Python)."""

    def _t(df):
        out = df
        for c in cols:
            out = out.withColumn(c, redact_pii(F.col(c)))
        return out

    return _t


# dotted-path-friendly instance for the transcripts table shape
redact_text = redact_columns("text")
