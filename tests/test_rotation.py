"""Guards for the driver-window rotation (__spark_entry__._reorder).

The driver's correctness gate hashes the FIRST 50 entries of queries()
in dict order, so the rotation logic IS the mechanism that drains the
never-verified backlog across rounds — a regression here silently
re-verifies old queries instead. These tests pin the contract without
touching the real CORRECTNESS history.
"""

import re
from unittest import mock

import __spark_entry__ as entry_mod


def _qnum(name: str) -> int:
    return int(re.match(r"q(\d+)", name).group(1))


def test_window_fronts_lowest_numbered_backlog():
    """The first 50 entries must be exactly the 50 lowest-numbered
    queries with no fully-green driver row in the committed history —
    recomputed here independently of _reorder's own implementation."""
    qs = entry_mod.queries()
    verified = entry_mod._verified_queries()
    backlog = sorted((n for n in qs if n not in verified), key=_qnum)
    assert list(qs)[: min(50, len(backlog))] == backlog[:50]


def test_rotation_advances_when_window_verifies():
    """Simulate the r6 window landing green: the next window must be
    the NEXT 50 backlog queries, not a re-verification of the old
    ones."""
    current = list(entry_mod.queries())
    window = current[:50]
    already = entry_mod._verified_queries()

    with mock.patch.object(
        entry_mod, "_verified_queries", return_value=already | set(window)
    ):
        nxt = list(entry_mod.queries())
    assert not (set(nxt[:50]) & set(window)), (
        "rotation re-fronted already-verified queries"
    )
    want = sorted(
        (n for n in current if n not in already and n not in window),
        key=_qnum,
    )[:50]
    assert nxt[: len(want)] == want


def test_verified_tail_keeps_registry_alignment():
    """queries() and oracle_sql() must stay POSITIONALLY aligned after
    reorder — the driver zips them by position for the graded window."""
    qs = list(entry_mod.queries())
    os_ = list(entry_mod.oracle_sql())
    assert qs == os_


def test_unreadable_history_falls_back_to_static_window():
    """If every history file is unreadable, the static _GRADE_FIRST
    fallback (the round-6 window) must still front the same queries —
    the driver gate never sees an arbitrary order."""
    with mock.patch.object(entry_mod, "_verified_queries", return_value=set()):
        qs = list(entry_mod.queries())
    assert qs[: len(entry_mod._GRADE_FIRST)] == entry_mod._GRADE_FIRST
