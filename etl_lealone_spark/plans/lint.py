"""Plan lint: scale anti-pattern detection over physical plan text.

Rules (the failures that only surface as a cluster bill at 100 TB):

- ``cartesian`` — a ``CartesianProduct`` stage: O(n*m) row pairing.
- ``bnl-join`` — ``BroadcastNestedLoopJoin``: per-streamed-row scan of
  the broadcast side. EXEMPT when every BNL in the plan broadcasts an
  ungrouped (1-row) aggregate — the standard constant-size way to attach
  a scalar corpus statistic (avgdl, token totals, thresholds) to every
  row; recognized by shape, not by name.
- ``global-window`` — a Window node directly above an
  ``Exchange SinglePartition``: the whole dataset serialized through one
  task. (Ungrouped final aggregates legitimately end in a 1-row
  SinglePartition exchange; only a *window* above one is flagged.)

``scripts/plan_lint.py`` sweeps every registered workload through these
rules; tests/test_plans.py unit-tests the rules on planted plans.
"""

from __future__ import annotations

import re

RULES: list[tuple[str, re.Pattern]] = [
    ("cartesian", re.compile(r"CartesianProduct")),
    ("bnl-join", re.compile(r"BroadcastNestedLoopJoin")),
    (
        "global-window",
        re.compile(
            r"Window\s+\[[^\n]*\n"
            r"(?:[\s:+|-]*(?:Sort|Project)[^\n]*\n)*"
            r"[\s:+|-]*Exchange SinglePartition"
        ),
    ),
]

_SCALAR_BCAST = re.compile(
    r"BroadcastExchange IdentityBroadcastMode[^\n]*\n"
    r"(?:[\s:+|-]*(?:Project|Filter|HashAggregate\(keys=\[\]|WholeStageCodegen)[^\n]*\n)*?"
    r"[\s:+|-]*HashAggregate\(keys=\[\]"
)


def bnl_is_scalar_broadcast(plan: str) -> bool:
    """True iff every BroadcastNestedLoopJoin in the plan broadcasts an
    ungrouped (1-row) aggregate subtree."""
    n_bnl = len(re.findall(r"BroadcastNestedLoopJoin", plan))
    n_scalar = len(_SCALAR_BCAST.findall(plan))
    return n_scalar >= n_bnl


def lint_plan(plan: str) -> list[str]:
    """Rule names violated by a physical-plan string (empty = clean).

    ``plan`` must be tree-style explain text (``simple``/``extended``
    mode) — the ``formatted`` mode splits operator attributes away from
    the tree, which defeats the scalar-broadcast shape check. Use
    :func:`lint_df` to lint a DataFrame with the canonical mode.
    """
    hits = []
    for rule, pat in RULES:
        if not pat.search(plan):
            continue
        if rule == "bnl-join" and bnl_is_scalar_broadcast(plan):
            continue
        hits.append(rule)
    return hits


def lint_df(df) -> list[str]:
    """Lint a DataFrame's physical plan (canonical extended mode)."""
    from .explain import explain_str

    return lint_plan(explain_str(df, "extended"))
