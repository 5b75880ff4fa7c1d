"""Plan-text auditing helpers shared by ``scripts/audit_plans.py`` and
``tests/test_plans.py``.

The one non-trivial check (r8 verdict #6): an UNPARTITIONED Window —
``Window.orderBy(...)`` with no ``partitionBy`` — serializes the whole
input through a single task, which is fine only when something below it
already bounded the cardinality (an aggregate's group count, a
limit/top-K). ``unpartitioned_window_flags`` finds every unpartitioned
Window in a formatted plan and walks its input chain: pass-through
nodes (Sort/Exchange/Project/Filter/...) are skipped, a bounding node
(aggregate/limit/TakeOrdered) clears the window, anything else —
a scan, join, generate, expand — flags it as a single-task bottleneck
on potentially unbounded rows.
"""

from __future__ import annotations

import re

_NODE_RE = re.compile(r"([A-Za-z][A-Za-z0-9]*) \((\d+)\)")

# cardinality-preserving operators we can walk through
_PASSTHROUGH = {
    "Sort",
    "Exchange",
    "Project",
    "Filter",
    "Coalesce",
    "ColumnarToRow",
    "InputAdapter",
    "WholeStageCodegen",
    "AQEShuffleRead",
    "ShuffleQueryStage",
    "ReusedExchange",
    "Window",  # a window never changes cardinality; boundedness is deeper
    "WindowGroupLimit",
}

# operators that BOUND the row count flowing into the window
_BOUNDING_PREFIXES = (
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "TakeOrderedAndProject",
    "GlobalLimit",
    "LocalLimit",
    "CollectLimit",
)


def _spec_args(arguments_line: str) -> list[str] | None:
    """Top-level args of the first ``windowspecdefinition(...)`` in a
    Window node's Arguments line, excluding the trailing
    ``specifiedwindowframe(...)``."""
    i = arguments_line.find("windowspecdefinition(")
    if i < 0:
        return None
    s = arguments_line[i + len("windowspecdefinition(") :]
    args, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            if depth == 0:
                break
            depth -= 1
        if ch == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        args.append("".join(cur).strip())
    return [a for a in args if not a.startswith("specifiedwindowframe")]


_ORDER_ARG = re.compile(r"(ASC|DESC) NULLS (FIRST|LAST)$")


def _unpartitioned_window_ids(plan: str) -> set[str]:
    """Window node ids whose partition spec is empty, parsed from the
    ``windowspecdefinition(partCols..., orderCols ASC/DESC..., frame)``
    expression in the details block (the formatted explain omits the
    bracketed spec lists entirely when empty, so the expression text is
    the reliable signal: order args carry a sort direction, partition
    args do not — unpartitioned = no direction-less arg)."""
    ids = set()
    for m in re.finditer(
        r"^\((\d+)\) Window\b.*?(?=^\(\d+\) |\Z)", plan, re.S | re.M
    ):
        block = m.group(0)
        arg = re.search(r"Arguments: .*$", block, re.M)
        if not arg:
            continue
        spec = _spec_args(arg.group(0))
        if spec is None:
            continue
        if not any(not _ORDER_ARG.search(a) for a in spec):
            ids.add(m.group(1))
    return ids


def unpartitioned_window_flags(plan: str) -> list[str]:
    """Return one ``"Window(id)<-NodeName"`` flag per unpartitioned
    Window whose input chain hits a non-bounding operator before any
    aggregate/limit. Empty list = every global window in this plan is
    fed by bounded cardinality."""
    unp = _unpartitioned_window_ids(plan)
    if not unp:
        return []
    flags = []
    lines = plan.splitlines()
    tree_idx = [
        i
        for i, ln in enumerate(lines)
        if _NODE_RE.search(ln) and not ln.startswith("(")
    ]
    for pos, i in enumerate(tree_idx):
        m = _NODE_RE.search(lines[i])
        if m.group(1) != "Window" or m.group(2) not in unp:
            continue
        verdict = "Scan?"  # nothing below (shouldn't happen)
        for j in tree_idx[pos + 1 :]:
            name = _NODE_RE.search(lines[j]).group(1)
            if name in _PASSTHROUGH:
                continue
            if name.startswith(_BOUNDING_PREFIXES):
                verdict = None
                break
            verdict = name
            break
        if verdict is not None:
            flags.append(f"Window({m.group(2)})<-{verdict}")
    return flags


# Unpartitioned windows that are KNOWN and justified — every other
# global window in the registry must be fed by an aggregate/limit or
# the audit (and tests/test_plans.py) fails the build.
KNOWN_GLOBAL_WINDOWS = {
    "acctbal_quartiles": (
        "exact ntile over the full table is the DEMO rendering; its "
        "docstring names the 100 TB swap and acctbal_quartiles_approx "
        "IS that swap (percentile cut points, no global sort)"
    ),
    "nation_trade_pagerank": (
        "final rank over the nation-keyed PageRank vector - |nations| "
        "rows by construction (the nodes relation), invisible to the "
        "aggregate/limit walker because it flows through the rank join"
    ),
}
