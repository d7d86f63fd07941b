"""Plan audit helpers: make "is the filter pushed down / is this join
broadcast / did a shuffle sneak in / is Python on the hot path" into
assertions a test can run, instead of a one-off .explain() eyeball.

These read the *executed* (physical) plan string — the same text
`df.explain("formatted")` prints — so what's asserted is what runs.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges)."""
    plan = physical_plan(df)
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)", plan))


def assert_no_exchange(df: DataFrame, msg: str = "") -> None:
    n = count_exchanges(df)
    assert n == 0, f"plan has {n} shuffle exchange(s) {msg}\n{physical_plan(df)}"


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """Assert a data-source-level pushed filter mentioning `fragment`
    (parquet scans print PushedFilters: [...])."""
    plan = physical_plan(df)
    # the plan string truncates long lists at maxMetadataStringLength with
    # '...', so the list may not close with ']' — capture either way
    m = re.findall(r"PushedFilters: \[(.*?)(?:\]|\.\.\.)", plan)
    joined = ";".join(m)
    assert fragment in joined, (
        f"filter on {fragment!r} not pushed to scan; PushedFilters were [{joined}]"
    )


def wholestage_codegen_spans(df: DataFrame) -> int:
    return len(set(re.findall(r"\*\((\d+)\)", physical_plan(df))))


def python_eval_nodes(df: DataFrame) -> list[str]:
    """Python-execution operators in the plan (ArrowEval is the acceptable
    vectorized form; BatchEvalPython = row-at-a-time = hot-path poison)."""
    plan = physical_plan(df)
    return re.findall(r"(ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas|MapInPandas)", plan)
