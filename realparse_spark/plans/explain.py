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


def _top_level_bracket_groups(s: str) -> list[str]:
    """Contents of each `[...]` group at bracket depth 0 in a plan line."""
    depth, start, groups = 0, -1, []
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(s[start:i])
    return groups


def unpartitioned_windows(df: DataFrame) -> int:
    """Window nodes with an EMPTY partition spec — the plan shape that
    funnels the whole input through one task (`WindowExec: No Partition
    Defined`).  A Window line prints as
    ``Window [functions], [partition spec], [ordering]``; the
    unpartitioned-but-ordered form drops the middle group (2 groups, the
    last being an ASC/DESC ordering), a partitioned-but-unordered window
    also has 2 groups but no ordering markers.  An unpartitioned AND
    unordered window (a grand-total frame, 1 bracket group) is counted
    too — it is just as single-partition as the ordered form.  Anything
    non-zero must be justified by a bounded (post-aggregation /
    post-limit) input — the blanket plan gate keeps the allowlist."""
    n = 0
    for line in executed_plan(df).splitlines():
        s = re.sub(r"^[\s+:|*()\d-]*", "", line)
        if not s.startswith("Window "):
            continue
        groups = _top_level_bracket_groups(s)
        if len(groups) >= 3:
            continue  # functions, partition spec, ordering — partitioned
        if len(groups) == 2 and not re.search(r" (ASC|DESC)\b", groups[1]):
            continue  # partitioned, no ordering
        n += 1
    return n
