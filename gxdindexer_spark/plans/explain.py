"""Physical-plan introspection helpers.

Used by tests (and by us while iterating) to assert the plans we want
at scale actually materialize: filters pushed to the parquet scan,
column pruning in ReadSchema, broadcast joins for small dims, and a
bounded number of exchanges (shuffles).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries from the formatted plan's scans."""
    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    plan = physical_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (\S+)", plan)]


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan."""
    plan = physical_plan(df)
    return len(re.findall(r"\bExchange (hash|range|rangepartitioning|SinglePartition)", plan, re.I))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", physical_plan(df))))
