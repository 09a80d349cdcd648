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


def test_no_query_staler_than_two_rounds():
    """Rotation-debt guard (VERDICT r2 #8): with ~100 registered queries
    and a 50-row driver window, every query must either have a driver
    row in one of the TWO most recent CORRECTNESS_r*.json files or sit
    inside the upcoming window (CHECK_PRIORITY) - otherwise its
    correctness evidence goes stale silently. Fails loudly naming the
    queries that must rotate into the next round's window."""
    import glob
    import json
    import re

    from etl_pipeline_mini_project_01_spark.plans import registry

    registry.load_all_plans()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = sorted(
        glob.glob(os.path.join(root, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)))
    recent: set[str] = set()
    for path in rounds[-2:]:
        with open(path, encoding="utf-8") as fh:
            recent |= set(json.load(fh))
    covered = recent | set(registry.CHECK_PRIORITY)
    stale = sorted(set(registry.QUERIES) - covered)
    assert not stale, (
        f"{len(stale)} queries have no driver row in the last two rounds "
        f"and are not in the upcoming check window - rotate them into "
        f"CHECK_PRIORITY: {stale}")
