"""Plan checks: assert that the physical plans Catalyst produces are
the ones we designed for (SURVEY.md §4) — filters reach the scan,
small dimensions broadcast, Python appears only in the decode stage.

The reference has no optimizer to inspect; these checks are the
engine's substitute for its hand-verified pipeline order, and they run
in CI (tests/test_plans.py) so a regression that silently de-optimizes
a plan (e.g. a cast blocking pushdown) fails loudly.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every scan in the plan."""
    txt = explain_str(df)
    # greedy to the line's LAST ']' — a nested bracket (In(col,
    # [v1,v2])) must not truncate the captured list
    return re.findall(r"PushedFilters: \[(.*)\]", txt)


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan — verifies column pruning."""
    txt = explain_str(df)
    return re.findall(r"ReadSchema: (struct<[^\n]*>)", txt)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def python_stage_count(df: DataFrame) -> int:
    """Number of Python/Arrow eval nodes — the hot path should have 0
    (pure Catalyst) or exactly the intended decode/UDF stages.
    Uses simple mode: formatted mode prints each node twice (tree +
    details), double-counting."""
    txt = explain_str(df, mode="simple")
    return len(
        re.findall(
            r"(ArrowEvalPython|BatchEvalPython|MapInPandas|MapInArrow"
            r"|PythonMapInArrow|FlatMapGroupsInPandas|FlatMapGroupsInPandasWithState"
            r"|FlatMapCoGroupsInPandas|WindowInPandas|AggregateInPandas)",
            txt,
        )
    )


def wholestage_codegen_spans(df: DataFrame) -> int:
    # use codegen mode: with AQE the formatted plan is not final and
    # hides WholeStageCodegen annotations until execution
    txt = explain_str(df, mode="codegen")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", txt)
    return int(m.group(1)) if m else 0
