"""Plan-shape guard: no scale-killing ``Exchange SinglePartition`` anywhere.

Round 4's only scale defect (``corpus_shuffle``'s unpartitioned
``row_number`` window — VERDICT r4) hid in a query whose physical plan was
never inspected.  This test closes that blind spot structurally: it walks
the executed plan of EVERY registered query and fails if an
``Exchange SinglePartition`` funnels *base data* through one task.

A ``SinglePartition`` exchange is legitimate exactly when its input is
already collapsed to a bounded row count before the exchange:

- an Aggregate node (scalar aggregates, per-partition/tiny-key counts —
  partial aggregation means the exchange moves one row per group, and the
  group count is bounded by construction in those queries);
- a ``LocalLimit`` (each task emits at most N rows pre-exchange);
- a ``LocalTableScan`` / ``Range`` literal (driver-sized by definition).

Anything else under a ``SinglePartition`` exchange — a scan, project,
filter, sort, join, or window over real rows — would serialize the whole
input through a single reducer at 100 TB, and fails the test with the
offending plan fragment.
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entry_mod

# Unary row-preserving wrappers to look through when finding the node that
# determines how many rows reach the exchange.
_NARROW = {
    "Project",
    "Filter",
    "Sort",  # partition-local sort below an exchange preserves row count
    "ColumnarToRow",
    "InputAdapter",
    "WholeStageCodegen",
    "SerializeFromObject",
    "DeserializeToObject",
    "Coalesce",
    "ReusedSubquery",
    "SubqueryBroadcast",
}

# Nodes whose output is bounded before the exchange (see module docstring).
_BOUNDED = (
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "LocalLimit",
    "LocalTableScan",
    "Range",
    "ReusedExchange",  # re-reads an exchange already vetted elsewhere in the plan
)


def _strip(line: str) -> str:
    return re.sub(r"^[\s:+|*-]*", "", line)


def _head(line: str) -> str:
    return _strip(line).split("(")[0].split("[")[0].strip().split(" ")[0]


def single_partition_violations(plan: str) -> list[str]:
    """Return plan fragments where Exchange SinglePartition consumes
    unbounded input (anything not collapsed by an aggregate/limit)."""
    lines = plan.splitlines()
    bad = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        j = i + 1
        while j < len(lines) and _head(lines[j]) in _NARROW:
            j += 1
        child = _head(lines[j]) if j < len(lines) else "<end>"
        if not child.startswith(_BOUNDED):
            bad.append("\n".join(lines[i : min(j + 1, len(lines))]))
    return bad


def test_old_corpus_shuffle_shape_would_fail():
    """The rule must catch exactly the round-4 defect: a window's
    SinglePartition exchange fed by a sort/project over a parquet scan."""
    plan = (
        "Window [row_number()], [h ASC]\n"
        "+- Sort [h ASC], false, 0\n"
        "   +- Exchange SinglePartition, ENSURE_REQUIREMENTS\n"
        "      +- Project [doc_id, h]\n"
        "         +- FileScan parquet [doc_id]\n"
    )
    assert single_partition_violations(plan)
    ok = (
        "Window [sum(n)], [pid ASC]\n"
        "+- Sort [pid ASC], false, 0\n"
        "   +- Exchange SinglePartition, ENSURE_REQUIREMENTS\n"
        "      +- HashAggregate(keys=[pid], functions=[count(1)])\n"
    )
    assert not single_partition_violations(ok)


def test_no_query_funnels_data_through_one_task(spark, sf_smoke):
    """Every registered query's executed plan: SinglePartition exchanges
    only above bounded (aggregated/limited) inputs."""
    failures = {}
    for name, fn in sorted(entry_mod.queries().items()):
        df = fn(spark, sf_smoke)
        plan = df._jdf.queryExecution().executedPlan().toString()
        bad = single_partition_violations(plan)
        if bad:
            failures[name] = bad[0]
    assert not failures, (
        "scale-killing Exchange SinglePartition in: "
        + ", ".join(failures)
        + "\n\n"
        + "\n\n".join(f"--- {k} ---\n{v}" for k, v in failures.items())
    )
