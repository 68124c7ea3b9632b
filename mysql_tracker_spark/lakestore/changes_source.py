"""Streaming CDC-out: the lakestore changelog as a first-class
Structured Streaming SOURCE (Spark 4 Python Data Source API).

The reference's downstream verification consumer polls Kafka
(SURVEY.md §2.1 S6); the lakestore already answers it with the batch
:meth:`LakeTable.read_changes`. This module closes the loop for
streaming consumers:

    spark.dataSource.register(LakeChangesDataSource)
    df = (spark.readStream.format("lakestore_changes")
          .option("path", table_path).load())

* **Offsets are snapshot versions** — the table's own commit log is
  the stream's offset axis, so Spark's checkpoint + the engine's
  deterministic version-range diff give end-to-end exactly-once: a
  replayed micro-batch re-reads the SAME version range and yields the
  identical rows.
* **One input partition per changed bucket** (`partitions()`): the
  COW/MOR invariant that an untouched bucket carries identical file
  entries forward means only changed buckets are listed, and each
  executor task diffs exactly one bucket — the same working-set bound
  the batch changelog has.
* **Executor-side diff without a SparkSession**: `read()` runs on
  executors where no SparkSession exists, so the per-bucket state
  resolution (schema-aligned base read + MOR LWW-by-seq + tombstone
  drop) and the old-vs-new key diff are implemented over
  pyarrow/pandas. Equivalence with the Spark-side
  :meth:`LakeTable.read_changes` is property-tested
  (tests/test_changes_source.py) — any divergence between the two
  implementations breaks the suite.

Schema note: the output schema (op + the table's columns) is fixed
when the stream starts, like any Spark source; files written under
older schema_ids are aligned (missing columns null, widened cast via
pandas). After an ADD COLUMN, restart the stream to surface the new
column.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_TOMBSTONE = "__delete"


def _manifest(path: str, version: int) -> dict:
    with open(os.path.join(path, "snapshots", f"v{version:08d}.json")) as f:
        return json.load(f)


def _current_version(path: str) -> int:
    snap = os.path.join(path, "snapshots")
    return max(
        int(f[1:-5])
        for f in os.listdir(snap)
        if f.startswith("v") and f.endswith(".json")
    )


def _bucket_state(path: str, m: dict, bucket: int, target_fields: list):
    """One live row per key for a single bucket, as pandas — the
    executor-side twin of LakeTable._read_state restricted to one
    bucket: schema-align every file, stamp MOR deltas with their
    commit seq, keep the max-seq row per key, drop tombstones."""
    import pandas as pd
    import pyarrow.parquet as pq

    names = [f["name"] for f in target_fields]
    key_cols = m["key_cols"]
    parts = []
    for fe in m["buckets"].get(str(bucket), []):
        pdf = pq.read_table(os.path.join(path, fe["path"])).to_pandas()
        for n in names:
            if n not in pdf.columns:
                pdf[n] = None
        is_delta = bool(fe.get("delta"))
        tomb = (
            pdf[_TOMBSTONE].fillna(False).astype(bool)
            if is_delta and _TOMBSTONE in pdf.columns
            else False
        )
        part = pdf[names].copy()
        part["__del"] = tomb
        part["__seq"] = fe.get("seq", 0) if is_delta else 0
        parts.append(part)
    if not parts:
        return pd.DataFrame(columns=names + ["__del", "__seq"])
    allr = pd.concat(parts, ignore_index=True)
    # max-seq row per key wins (stable sort keeps within-seq order;
    # keys are unique within one seq level by the merge contract)
    allr = allr.sort_values("__seq", kind="stable").groupby(
        key_cols, as_index=False, dropna=False
    ).tail(1)
    return allr[~allr["__del"]].drop(columns=["__del", "__seq"])


class _BucketDiffPart(InputPartition):
    def __init__(self, path: str, bucket: int, v_from: int, v_to: int):
        self.path = path
        self.bucket = bucket
        self.v_from = v_from
        self.v_to = v_to


class LakeChangesStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema_json: str):
        self.path = options["path"]
        self.start_version = int(options.get("fromversion", 0)) or None
        self._schema_json = schema_json

    # ---- offsets -------------------------------------------------------
    def initialOffset(self) -> dict:
        v = (
            self.start_version
            if self.start_version is not None
            else _current_version(self.path)
        )
        return {"version": v}

    def latestOffset(self) -> dict:
        return {"version": _current_version(self.path)}

    def partitions(self, start: dict, end: dict):
        v0, v1 = start["version"], end["version"]
        if v1 <= v0:
            return []
        mf, mt = _manifest(self.path, v0), _manifest(self.path, v1)
        parts = []
        for b in sorted(set(mf["buckets"]) | set(mt["buckets"]), key=int):
            if mf["buckets"].get(b, []) != mt["buckets"].get(b, []):
                parts.append(_BucketDiffPart(self.path, int(b), v0, v1))
        return parts

    def commit(self, end: dict) -> None:
        pass  # offsets live in the stream checkpoint; nothing to ack

    # ---- executor-side read -------------------------------------------
    def read(self, partition: _BucketDiffPart):
        import math

        import pandas as pd

        sch = json.loads(self._schema_json)
        target_fields = sch["fields"]
        names = [f["name"] for f in target_fields if f["name"] != "op"]
        mf = _manifest(partition.path, partition.v_from)
        mt = _manifest(partition.path, partition.v_to)
        key = mt["key_cols"]
        non_key = [n for n in names if n not in key]
        old = _bucket_state(partition.path, mf, partition.bucket, target_fields)
        new = _bucket_state(partition.path, mt, partition.bucket, target_fields)
        o = {tuple(r[k] for k in key): r for _, r in old.iterrows()}
        n = {tuple(r[k] for k in key): r for _, r in new.iterrows()}

        def eq(a, b) -> bool:
            if a is None and b is None:
                return True
            try:
                if pd.isna(a) and pd.isna(b):
                    return True
                if pd.isna(a) or pd.isna(b):
                    return False
            except (TypeError, ValueError):
                pass
            if isinstance(a, float) and isinstance(b, float):
                return a == b or (math.isnan(a) and math.isnan(b))
            return a == b

        for k in set(o) | set(n):
            if k not in o:
                row = n[k]
                op = "insert"
            elif k not in n:
                row = o[k]
                op = "delete"
            else:
                row = n[k]
                if all(eq(o[k][c], row[c]) for c in non_key):
                    continue
                op = "update"
            yield tuple(
                [op] + [None if _is_na(row[c]) else row[c] for c in names]
            )


def _is_na(v) -> bool:
    import pandas as pd

    try:
        return v is None or pd.isna(v)
    except (TypeError, ValueError):
        return False


class LakeChangesDataSource(DataSource):
    """``spark.readStream.format("lakestore_changes")`` — register with
    ``spark.dataSource.register(LakeChangesDataSource)`` first."""

    @classmethod
    def name(cls) -> str:
        return "lakestore_changes"

    def schema(self) -> str:
        path = self.options["path"]
        m = _manifest(path, _current_version(path))
        tbl = T.StructType.fromJson(m["schemas"][str(m["schema_id"])])
        return T.StructType(
            [T.StructField("op", T.StringType())] + list(tbl.fields)
        )

    def streamReader(self, schema: T.StructType) -> LakeChangesStreamReader:
        return LakeChangesStreamReader(self.options, schema.json())
