"""The PLANS.md generator's counting must be pin-aware: a persisted
frame's InMemoryRelation subtree prints once per consumer, but only
runs once."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_audit_dedupes_repeated_cached_subtrees():
    from plan_audit import audit

    cached = (
        "   +- InMemoryRelation [a#1L]\n"
        "         +- Exchange hashpartitioning(a#1L, 32)\n"
        "            +- Scan parquet [a#1L]\n"
    )
    # the same cached block under two consumers, at different tree
    # depths (different drawing prefixes), plus one genuinely distinct
    # exchange with its own expression ids
    plan = (
        "BroadcastHashJoin [a#1L], [b#2L]\n"
        ":- InMemoryTableScan [a#1L]\n"
        + cached
        + "+- InMemoryTableScan [a#1L]\n"
        + cached.replace("   +-", "      +-")
        + "+- Exchange hashpartitioning(b#2L, 32)\n"
        + "   +- Scan parquet [b#2L]\n"
    )
    a = audit(plan)
    assert a["exchanges"] == 2  # raw text has 3
    assert a["scans"] == 2      # raw text has 3
    assert a["broadcast_joins"] == 1
