"""lakestore — a minimal snapshot-versioned lakehouse table format.

Fills the Iceberg role in this sandbox (no Iceberg runtime jar is
available): atomic manifest commits, hash-bucketed copy-on-write MERGE,
schema evolution without rewriting history, and snapshot properties
used for exactly-once offset fencing. Semantics follow the public
Iceberg spec's spirit (snapshot isolation, optimistic commit via
exclusive-create of the next version file); implementation is plain
parquet + JSON manifests and is swappable for real Iceberg when its
runtime is on the classpath.
"""

from .table import CommitConflictError, LakeTable, WapConflictError

__all__ = ["CommitConflictError", "LakeTable", "WapConflictError"]
