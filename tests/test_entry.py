"""Smoke: the driver contract module loads and entry() produces rows."""

from __future__ import annotations

import importlib.util
import os


def _load_entry_module():
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("spark_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_smoke(spark):
    mod = _load_entry_module()
    df = mod.entry(spark)
    assert df.count() > 0


def test_contract_shape(spark):
    mod = _load_entry_module()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert qs, "no queries registered"
    assert set(oracles) <= set(qs), "oracle without matching query"


def test_check_priority_window_invariant():
    """The driver verifies the first 50 queries(): that prefix must stay
    exactly CHECK_PRIORITY (50 unique, all registered) so no family
    silently falls out of the checked window in later rounds."""
    from etl_pipeline_mini_project_01_spark.plans import registry

    registry.load_all_plans()
    names = list(registry.ordered_queries())
    assert len(registry.CHECK_PRIORITY) == 50
    assert len(set(registry.CHECK_PRIORITY)) == 50
    assert tuple(names[:50]) == registry.CHECK_PRIORITY
    missing = [n for n in registry.CHECK_PRIORITY if n not in registry.QUERIES]
    assert not missing
