"""Query registry: every implemented operator registers a (Spark builder,
DuckDB oracle SQL) pair here; `__spark_entry__.py` re-exports the dicts.

Determinism contract (FIXTURES.md §C):
  * float aggregates go through DECIMAL sums (order-insensitive, exact)
    before any cast back to DOUBLE;
  * every output column is aliased identically in the Spark plan and the
    oracle SQL;
  * no CURRENT_TIMESTAMP - a frozen RUN_TS constant is injected on both
    sides;
  * ties in rankings/mode are broken by an explicit secondary key.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: Frozen "now" for any wall-clock-derived column (reference uses
#: CURRENT_TIMESTAMP at /root/reference/models/gold/..sql:42,247,252); fixed
#: just past the events table's max ts (2024-01-30) so ages stay positive.
RUN_TS = "2024-02-01 00:00:00"

_PLAN_MODULES = (
    "core",
    "cleaning",
    "json_text",
    "windows",
    "joins",
    "silver",
    "gold",
    "dedup",
    "similarity",
    "text_analysis",
    "multimodal",
    "streaming_windows",
    "inference",
    "sql_surface",
    "digest",
    "olap",
)


def register(name: str, oracle: str | None = None):
    """Decorator: register a query builder and (optionally) its SQL oracle."""
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn
    return deco


def load_all_plans() -> None:
    """Import every plan module so its @register decorators run."""
    for mod in _PLAN_MODULES:
        try:
            importlib.import_module(f"{__package__}.{mod}")
        except ModuleNotFoundError as exc:
            # Allow partially-built plan sets during development; only
            # swallow "module itself missing", not errors inside it.
            if exc.name != f"{__package__}.{mod}":
                raise
