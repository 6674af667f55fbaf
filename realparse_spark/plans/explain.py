"""Plan-inspection helpers: the 100 TB design checks, mechanized.

These let tests (and bench) assert the physical properties that matter at
scale instead of eyeballing `.explain()`: filters reaching the parquet
scan, dims broadcast instead of shuffled, expressions inside whole-stage
codegen, and shuffle counts bounded.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def full_explain(df: DataFrame) -> str:
    return df._jdf.queryExecution().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters clauses on the scan nodes.

    Bracket-aware: an ``In(col, [a,b,c])`` filter nests ``]`` inside the
    clause, so a naive ``\\[[^\\]]*\\]`` capture would stop mid-list and
    hide every filter after it from the gates."""
    text = full_explain(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[", text):
        depth, i = 1, m.end()
        while i < len(text) and depth:
            if text[i] == "[":
                depth += 1
            elif text[i] == "]":
                depth -= 1
            i += 1
        if depth:
            # unbalanced clause — the scan metadata was truncated (filters
            # longer than spark.sql.maxMetadataStringLength); appending the
            # unbounded tail would silently corrupt gate matches
            import warnings

            warnings.warn(
                "pushed_filters: truncated/unbalanced PushedFilters clause "
                "skipped — raise spark.sql.maxMetadataStringLength"
            )
            continue
        out.append(text[m.end() : i - 1])
    return out


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    return any(fragment in pf for pf in pushed_filters(df))


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each scan — column-pruning check: a scan reading
    columns the query never touches is a bug at 100 TB."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", full_explain(df))


def count_shuffles(df: DataFrame) -> int:
    """Exchange nodes in the executed plan (AQE may reuse/elide some at
    runtime; this is the static upper bound)."""
    return executed_plan(df).count("Exchange ")


def broadcast_join_count(df: DataFrame) -> int:
    return executed_plan(df).count("BroadcastHashJoin")


def sortmerge_join_count(df: DataFrame) -> int:
    return executed_plan(df).count("SortMergeJoin")


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Distinct codegen stage ids: executedPlan marks codegen'd operators
    with a `*(n)` prefix."""
    return len(set(re.findall(r"\*\((\d+)\)", executed_plan(df))))


def python_eval_nodes(df: DataFrame) -> int:
    """Row-at-a-time Python UDF nodes (BatchEvalPython) — must be 0 in
    every hot path; ArrowEvalPython/MapInPandas are the sanctioned slow
    path and are counted separately."""
    return executed_plan(df).count("BatchEvalPython")
