"""Physical-plan assertions — the guardrails that keep plans
100-TB-shaped (SURVEY §4.3/§4.4).

Catalyst gives pushdown, pruning, and join selection for free *if* the
query is expressed declaratively; these helpers make that a testable
property instead of a hope. Used by tests/test_plans.py and available
for ad-hoc `.explain` review while developing operators:

- filters must reach the parquet scan (``PushedFilters``),
- scans must read only needed columns (``ReadSchema``),
- dim joins must broadcast (no shuffle of the fact side),
- narrow pipelines must not shuffle at all,
- whole-stage codegen should cover the hot path.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    """Explain output as a string via the PUBLIC ``DataFrame.explain``
    (it prints; capture stdout) — no ``_jvm`` gateway."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def executed_plan_str(df: DataFrame) -> str:
    """Final (post-AQE-planning) physical plan string. Diagnostic-only
    surface: ``_jdf`` is the one non-public access left in the repo —
    the final adaptive plan has no public string accessor in PySpark."""
    return df._jdf.queryExecution().executedPlan().toString()


def count_shuffles(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the physical plan."""
    return len(re.findall(r"\bExchange (?!SinglePartition)", executed_plan_str(df)))


def assert_no_shuffle(df: DataFrame) -> None:
    n = count_shuffles(df)
    if n:
        raise AssertionError(
            f"expected a narrow (no-shuffle) plan, found {n} Exchange(s):\n"
            + executed_plan_str(df)[:4000]
        )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert each fragment appears in a PushedFilters clause of the
    formatted plan (predicate reached the data source)."""
    plan = plan_str(df)
    pushed = " | ".join(re.findall(r"PushedFilters: \[(.*?)\]", plan))
    for frag in fragments:
        if frag not in pushed:
            raise AssertionError(
                f"filter fragment {frag!r} not pushed to scan; pushed: [{pushed}]"
            )


def scan_read_schemas(df: DataFrame) -> list[str]:
    return re.findall(r"ReadSchema: struct<(.*?)>", plan_str(df))


def assert_columns_pruned(df: DataFrame, *absent: str) -> None:
    """Assert no scan reads any of the named columns."""
    schemas = scan_read_schemas(df)
    for col in absent:
        for s in schemas:
            if re.search(rf"\b{re.escape(col)}:", s):
                raise AssertionError(
                    f"column {col!r} not pruned from scan (ReadSchema: {s})"
                )


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    n = len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin",
                       executed_plan_str(df)))
    if n < min_count:
        raise AssertionError(
            f"expected >= {min_count} broadcast join(s), found {n}:\n"
            + executed_plan_str(df)[:4000]
        )


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen stages; spelled ``*(N)`` in the
    executed-plan string and ``WholeStageCodegen (N)`` in formatted
    explain — count either."""
    s = executed_plan_str(df)
    ids = set(re.findall(r"\*\((\d+)\)", s))
    ids |= set(re.findall(r"WholeStageCodegen \((\d+)\)", s))
    return len(ids)
