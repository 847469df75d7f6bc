"""Smoke-test the driver contract surface itself."""

from __future__ import annotations

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
)
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_queries_and_oracles_align(spark):
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert qs, "no queries registered"
    assert set(os_) <= set(qs), "oracle without a query"


def test_r16_window_occupies_first_50_slots():
    """The driver checks the FIRST 50 registered queries; the rotation
    contract (registry._load.__doc__) says slots 1-50 are exactly
    _R16_WINDOW in order, with no other registration lost."""
    from bigdata_project_spark import registry

    names = list(registry.queries())
    assert names[:50] == registry._R16_WINDOW
    assert len(names) == len(set(names)) == 169


def test_rotation_ceiling_math():
    """Codify the rotation policy's 4-round hard ceiling against the
    committed driver artifacts: given the CORRECTNESS files through
    round 12 (pinned — NOT a glob, so a driver-written r13 file can't
    flip this test mid-round), every registered query must either have
    a green driver row at most 3 rounds old or sit inside the current
    window (where the next driver run gives it one). Each round's
    rotation updates the pinned range and window name together — a
    future window that strands a ceiling-bound query fails here
    instead of silently shipping a coverage regression."""
    import json

    from bigdata_project_spark import registry

    root = os.path.join(os.path.dirname(__file__), "..")
    last: dict[str, int] = {}
    for r in range(1, 16):  # pinned: artifacts that existed at r16 rotation
        fname = f"CORRECTNESS_r{r:02d}.json" if r < 10 else f"CORRECTNESS_r{r}.json"
        for q in json.load(open(os.path.join(root, fname))):
            last[q] = r
    latest = 15
    window = set(registry._R16_WINDOW)
    stranded = [
        q
        for q in registry.queries()
        if last.get(q, 0) < latest - 2 and q not in window
    ]
    assert not stranded, (
        f"queries past the 4-round ceiling and not in the window: {stranded}"
    )
