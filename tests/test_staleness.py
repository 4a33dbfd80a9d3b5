"""Structural guard for the driver correctness record (r12 verdict §8).

Recomputes the per-vintage AST staleness audit (tools/staleness.py) and
fails when any query whose body changed after its own record vintage —
or that has no record at all — is missing from ``registry._PRIORITY``'s
50-slot prefix. This is the structural fix for the r12 bookkeeping
miss, where a single-base diff let three stale r8 records slip the
rotation.

No Spark session needed: the audit is pure git + ast.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import staleness  # noqa: E402

from pandas_reporter_spark import registry  # noqa: E402

#: The driver records exactly this many queries per round (observed in
#: every CORRECTNESS_r{N}.json since r2).
RECORD_WINDOW = 50

#: Stale-with-reason queries deliberately left out of the prefix when
#: the audit exceeds the window. Each entry must say WHY deferral is
#: safe (non-semantic: byte-identical output on every testdata sf).
KNOWN_DEFERRED: dict[str, str] = {
    # r14: drained — all four r13 deferrals lead registry._PRIORITY
    # and get official records this round.
}


@pytest.fixture(scope="module")
def audit():
    if not os.path.isdir(os.path.join(staleness.REPO, ".git")):
        pytest.skip("not a git checkout")
    return staleness.audit()


def test_priority_fits_record_window():
    assert len(registry._PRIORITY) <= RECORD_WINDOW
    assert len(set(registry._PRIORITY)) == len(registry._PRIORITY)


def test_every_stale_record_is_scheduled(audit):
    prefix = set(registry._PRIORITY[:RECORD_WINDOW])
    leaked = [
        s["query"] for s in audit["stale"]
        if s["query"] not in prefix and s["query"] not in KNOWN_DEFERRED
    ]
    assert not leaked, (
        f"stale records missing from _PRIORITY prefix (re-record or add a "
        f"documented KNOWN_DEFERRED entry): {leaked}"
    )


def test_every_unrecorded_query_is_scheduled(audit):
    """A query with no driver record at all costs a full round if it
    misses the prefix (the r12 restart lesson)."""
    registry.load_all()
    prefix = set(registry._PRIORITY[:RECORD_WINDOW])
    vint = staleness.record_vintages()
    leaked = [
        n for n in registry.QUERIES
        if n not in vint and n not in prefix and n not in KNOWN_DEFERRED
    ]
    assert not leaked, f"never-recorded queries missing from prefix: {leaked}"


def test_deferred_entries_are_actually_stale_or_gone(audit):
    """KNOWN_DEFERRED must not accumulate dead entries (ADVICE r13):
    every name must currently be registered AND still be flagged by the
    audit — a deferral for a query that has gone fresh (re-recorded)
    silently exempts its future staleness and must be deleted."""
    registry.load_all()
    vint = staleness.record_vintages()
    flagged = {s["query"] for s in audit["stale"]}
    flagged |= {n for n in registry.QUERIES if n not in vint}
    for name in KNOWN_DEFERRED:
        assert name in registry.QUERIES, f"deferred entry not registered: {name}"
        assert name in flagged, (
            f"KNOWN_DEFERRED entry {name!r} is fresh (re-recorded or "
            f"unchanged since its record vintage) — delete this deferral"
        )
