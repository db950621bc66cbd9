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
    """Simulate the current window landing green (ledger appended AND
    the driver's CORRECTNESS round committed, as happens every round):
    the next window must not re-front it — either the next 50 backlog
    queries (while a backlog remains) or, post-coverage, the 50 with
    the oldest last-green round."""
    current = list(entry_mod.queries())
    window = current[:50]
    already = entry_mod._verified_queries()
    rounds = entry_mod._last_green_rounds()
    bumped = dict(rounds)
    for n in window:
        bumped[n] = max(rounds.values(), default=0) + 1

    with mock.patch.object(
        entry_mod, "_verified_queries", return_value=already | set(window)
    ), mock.patch.object(
        entry_mod, "_last_green_rounds", return_value=bumped
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


def test_verified_ledger_is_consulted(tmp_path, monkeypatch):
    """_verified_queries must union the committed VERIFIED.json ledger
    with the CORRECTNESS_r*.json glob, so rotation survives a checkout
    where the driver's artifacts were never committed (r7 judge
    finding #1)."""
    import json
    import os

    ledger_names = ["q001_fake_ledger_entry", "q002_other_ledger_entry"]
    (tmp_path / "VERIFIED.json").write_text(
        json.dumps({"verified": ledger_names})
    )
    # Point the module's directory resolution at tmp_path: no
    # CORRECTNESS_r*.json there, so everything must come from the ledger.
    real_dirname = os.path.dirname

    def fake_dirname(p):
        if p == os.path.abspath(entry_mod.__file__):
            return str(tmp_path)
        return real_dirname(p)

    monkeypatch.setattr(os.path, "dirname", fake_dirname)
    assert entry_mod._verified_queries() == set(ledger_names)


def test_verified_ledger_matches_committed_history():
    """The committed VERIFIED.json must be a SUPERSET of what the
    CORRECTNESS history derives — a stale ledger that misses green rows
    would re-front already-verified queries and waste a round.

    Only COMMITTED history files count (enumerated via `git ls-files`):
    the driver may drop a fresh CORRECTNESS_r*.json into the worktree
    after the builder's final commit, and that untracked artifact must
    not fail a clean checkout's suite (r8 ADVICE item 1). Falls back to
    the on-disk glob when git is unavailable."""
    import glob
    import json
    import os
    import subprocess

    here = os.path.dirname(os.path.abspath(entry_mod.__file__))
    ledger_path = os.path.join(here, "VERIFIED.json")
    with open(ledger_path) as f:
        ledger = set(json.load(f)["verified"])
    try:
        out = subprocess.run(
            ["git", "ls-files", "CORRECTNESS_r*.json"],
            cwd=here,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        history_files = [
            os.path.join(here, line) for line in out.splitlines() if line
        ]
    except (OSError, subprocess.CalledProcessError):
        history_files = glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
    from_history: set[str] = set()
    for p in sorted(history_files):
        with open(p) as f:
            d = json.load(f)
        for name, row in d.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                from_history.add(name)
    assert from_history <= ledger, sorted(from_history - ledger)


def test_unreadable_history_falls_back_to_static_window():
    """If every history file is unreadable, the static _GRADE_FIRST
    fallback (the round-6 window) must still front the same queries —
    the driver gate never sees an arbitrary order."""
    with mock.patch.object(entry_mod, "_verified_queries", return_value=set()):
        qs = list(entry_mod.queries())
    assert qs[: len(entry_mod._GRADE_FIRST)] == entry_mod._GRADE_FIRST


def test_post_coverage_cycles_oldest_verified_window():
    """Once the backlog is empty (408/408 coverage), the graded window
    must become the 50 queries whose last fully-green round is OLDEST
    (query number as tiebreak) — the regression ratchet the round-10
    judge asked for — and a subsequent green round on that window must
    advance the cycle to the next-oldest 50."""
    all_names = set(entry_mod.queries())
    # synthetic history: round = 1 + (qnum // 50), so q01-q49 are the
    # oldest-green block, then q50-q99, etc.
    synth = {n: 1 + _qnum(n) // 50 for n in all_names}
    with mock.patch.object(
        entry_mod, "_verified_queries", return_value=all_names
    ), mock.patch.object(
        entry_mod, "_last_green_rounds", return_value=dict(synth)
    ):
        ordered = list(entry_mod.queries())
        expect = sorted(all_names, key=lambda n: (synth[n], _qnum(n)))
        assert ordered == expect
        window = ordered[:50]
        # ... the driver grades that window green; it becomes newest
        bumped = dict(synth)
        for n in window:
            bumped[n] = 99
        with mock.patch.object(
            entry_mod, "_last_green_rounds", return_value=bumped
        ):
            nxt = list(entry_mod.queries())
        assert not (set(nxt[:50]) & set(window)), (
            "post-coverage cycle re-fronted the just-graded window"
        )
        assert nxt[:50] == [n for n in ordered if n not in window][:50]


def test_post_coverage_alignment_and_ledger_only_fallback():
    """In post-coverage mode queries()/oracle_sql() stay positionally
    aligned, and queries with NO readable round history (ledger-only)
    sort oldest — a fresh checkout without CORRECTNESS files degrades
    to query-number order, never an arbitrary one."""
    all_names = set(entry_mod.queries())
    with mock.patch.object(
        entry_mod, "_verified_queries", return_value=all_names
    ), mock.patch.object(
        entry_mod, "_last_green_rounds", return_value={}
    ):
        qs = list(entry_mod.queries())
        os_ = list(entry_mod.oracle_sql())
        assert qs == os_
        assert qs == sorted(all_names, key=_qnum)
