"""Physical-plan inspection helpers (SURVEY.md §5.2.3 plan-shape
asserts; the "iterate on .explain until it's the plan you'd want"
loop made checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def formatted(df: DataFrame) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def uses_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in physical_plan(df)


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the scan node(s)."""
    plan = formatted(df)
    return "\n".join(
        line.strip() for line in plan.splitlines() if "PushedFilters" in line
    )


def read_schema(df: DataFrame) -> str:
    plan = formatted(df)
    return "\n".join(
        line.strip() for line in plan.splitlines() if "ReadSchema" in line
    )


def uses_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in physical_plan(df)


def count_unpartitioned_windows(df: DataFrame) -> int:
    """Number of WindowExec nodes with NO partition spec — the 'move
    all data to a single partition' shape that WindowExec warns about.
    A partitioned+ordered Window renders three top-level bracket
    groups (``Window [specs], [partition], [order]``); with two
    groups the second is EITHER a partition spec (fine) or a sort
    order (unpartitioned — the bad shape), distinguished by the
    ``ASC``/``DESC`` markers only sort orders carry; one group means
    neither partition nor order (global frame over one partition).
    Only row-scaled inputs make this an anti-pattern; bounded inputs
    (the n_partitions-row offsets table of the two-pass distributed
    rank, vocabulary-sized cell tables, <=k-row re-ranks) are
    legitimate and allow-listed per key in
    tests/test_plan_canary.py."""
    import re

    n = 0
    for line in physical_plan(df).splitlines():
        node = re.sub(r"^[\s:+\-*()\d]*", "", line)
        if not node.startswith("Window ["):
            continue
        depth = 0
        groups: list[str] = []
        for ch in node:
            if ch == "[":
                if depth == 0:
                    groups.append("")
                depth += 1
            if depth > 0 and groups:
                groups[-1] += ch
            if ch == "]":
                depth -= 1
        if len(groups) >= 3:
            continue  # [specs], [partition], [order]
        if len(groups) == 2 and not re.search(
            r"\b(ASC|DESC) NULLS (FIRST|LAST)", groups[1]
        ):
            continue  # [specs], [partition] — partitioned, unordered
        n += 1
    return n


def window_partition_columns(df: DataFrame) -> list[set]:
    """Per-WindowExec sets of partition column BASE names (``#id``
    refs stripped), parsed from the executed plan with the same
    bracket-group walk as :func:`count_unpartitioned_windows`.
    Unpartitioned windows contribute an empty set. Feeds the
    low-cardinality window audit (tests/test_plan_canary.py): a
    window partitioned ONLY by bounded-domain columns is the
    structural-straggler shape agg_percentile_exact_twostage exists
    to beat — each such site must be justified."""
    import re

    out: list[set] = []
    for line in physical_plan(df).splitlines():
        node = re.sub(r"^[\s:+\-*()\d]*", "", line)
        if not node.startswith("Window ["):
            continue
        depth = 0
        groups: list[str] = []
        for ch in node:
            if ch == "[":
                if depth == 0:
                    groups.append("")
                depth += 1
            if depth > 0 and groups:
                groups[-1] += ch
            if ch == "]":
                depth -= 1
        part = ""
        if len(groups) >= 3:
            part = groups[1]
        elif len(groups) == 2 and not re.search(
            r"\b(ASC|DESC) NULLS (FIRST|LAST)", groups[1]
        ):
            part = groups[1]
        cols = set(
            re.findall(r"([A-Za-z_][A-Za-z0-9_]*)#\d+", part)
        )
        out.append(cols)
    return out


def count_shuffles(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan — the scale
    currency; every one is a full network rewrite of its input."""
    return physical_plan(df).count("Exchange hashpartitioning") + physical_plan(
        df
    ).count("Exchange rangepartitioning")
