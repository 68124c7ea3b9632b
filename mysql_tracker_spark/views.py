"""Incrementally-maintained materialized views over a lakestore table
(the Iceberg materialized-view + incremental-refresh analogue).

The reference's downstream consumers re-read the Kafka/HBase stream to
rebuild any derived dataset (``consumer/kafka/KafkaReceiver.java`` —
full replays). Here a derived view declares two functions and the
engine keeps it current from the table's CHANGELOG instead:

* ``bootstrap(table_df) -> view_df`` — the full computation, run once
  (or after a manual invalidation);
* ``refresh(table_df, prev_view_df, changes_df) -> view_df`` — the
  incremental step, fed ``LakeTable.read_changes`` output between the
  view's last synced snapshot and the table head. The conversation
  stats/signature maintainers (``functions.conversations``) have
  exactly this signature.

``sync`` is idempotent and crash-safe the same way the table is:
view data lands in a versioned directory first, then a tiny meta JSON
is committed with ``O_EXCL`` — the commit IS the rename point; a
killed sync leaves only an orphan data directory that the next sync
garbage-collects, and two racing syncs resolve by first-commit-wins.
Re-syncing at an unchanged table version is a no-op (never recomputes),
so calling ``sync`` after every micro-batch costs one version check
when nothing changed and one WORKING-SET-sized refresh when something
did — the view never pays corpus-sized work after bootstrap.

Like Iceberg maintenance jobs, a view assumes one maintenance writer
at a time; concurrent syncs stay CORRECT (first commit wins, the loser
discards its output) but may redo work.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .lakestore import LakeTable


class MaterializedView:
    """A named derived dataset kept in lock-step with a LakeTable."""

    def __init__(
        self,
        table: LakeTable,
        view_dir: str,
        bootstrap: Callable[[DataFrame], DataFrame],
        refresh: Callable[[DataFrame, DataFrame, DataFrame], DataFrame],
        keep_last: int = 2,
    ):
        self.table = table
        self.view_dir = view_dir
        self.bootstrap = bootstrap
        self.refresh = refresh
        self.keep_last = max(int(keep_last), 1)
        self.meta_dir = os.path.join(view_dir, "meta")
        os.makedirs(self.meta_dir, exist_ok=True)

    # ------------------------------------------------------------- state

    def synced_version(self) -> int | None:
        """Table snapshot version the view currently reflects."""
        vs = [
            int(f[1:-5])
            for f in os.listdir(self.meta_dir)
            if f.startswith("v") and f.endswith(".json")
        ]
        return max(vs) if vs else None

    def _meta(self, version: int) -> dict:
        with open(os.path.join(self.meta_dir, f"v{version:08d}.json")) as f:
            return json.load(f)

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        v = version if version is not None else self.synced_version()
        if v is None:
            raise FileNotFoundError(f"view at {self.view_dir} never synced")
        return spark.read.parquet(
            os.path.join(self.view_dir, self._meta(v)["data"])
        )

    # -------------------------------------------------------------- sync

    def sync(self, spark: SparkSession) -> bool:
        """Bring the view to the table head. Returns True iff work ran."""
        cur = self.table.current_version()
        if cur is None:
            raise FileNotFoundError("backing table has no snapshots")
        last = self.synced_version()
        if last == cur:
            return False
        if last is None:
            new = self.bootstrap(self.table.read(spark))
        else:
            changes = self.table.read_changes(spark, last, cur)
            new = self.refresh(self.table.read(spark), self.read(spark, last), changes)

        data_name = f"data_v{cur:08d}"
        tmp = os.path.join(self.view_dir, f"{data_name}.tmp-{os.getpid()}")
        # prev data dir stays alive while `new` (lazy over it) executes
        new.write.mode("overwrite").parquet(tmp)
        final = os.path.join(self.view_dir, data_name)
        shutil.rmtree(final, ignore_errors=True)  # orphan of a killed sync
        os.rename(tmp, final)
        meta = {"table_version": cur, "data": data_name}
        target = os.path.join(self.meta_dir, f"v{cur:08d}.json")
        try:
            fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            # a racing sync committed this version first; ours is the orphan
            shutil.rmtree(final, ignore_errors=True)
            return False
        try:
            os.write(fd, json.dumps(meta).encode())
            os.fsync(fd)
        finally:
            os.close(fd)
        self._gc()
        return True

    def _gc(self) -> None:
        """Drop metas/data beyond keep_last, plus stranded tmp dirs."""
        vs = sorted(
            int(f[1:-5])
            for f in os.listdir(self.meta_dir)
            if f.startswith("v") and f.endswith(".json")
        )
        keep = set(vs[-self.keep_last :])
        live = {self._meta(v)["data"] for v in keep}
        for v in vs:
            if v not in keep:
                os.unlink(os.path.join(self.meta_dir, f"v{v:08d}.json"))
        for d in os.listdir(self.view_dir):
            full = os.path.join(self.view_dir, d)
            if d == "meta" or not os.path.isdir(full):
                continue
            if d not in live and (d.startswith("data_v") or ".tmp-" in d):
                shutil.rmtree(full, ignore_errors=True)
