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


def test_r13_window_occupies_first_50_slots():
    """The driver checks the FIRST 50 registered queries; the rotation
    contract (registry._load.__doc__) says slots 1-50 are exactly
    _R13_WINDOW in order, with no other registration lost."""
    from bigdata_project_spark import registry

    names = list(registry.queries())
    assert names[:50] == registry._R13_WINDOW
    assert len(names) == len(set(names)) == 169
