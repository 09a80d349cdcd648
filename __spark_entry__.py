"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine package: every operator from SURVEY.md §2 is
implemented as a registered (Spark builder, DuckDB oracle SQL) pair in
`etl_pipeline_mini_project_01_spark.plans.*`.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_pipeline_mini_project_01_spark.plans import registry  # noqa: E402

registry.load_all_plans()

FLAGSHIP = "g6_daily_event_trends"
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.QUERIES[FLAGSHIP](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so a
    driver that checks a prefix of the dict covers every operator family
    (see plans/registry.CHECK_PRIORITY)."""
    return registry.ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted => rows-only)."""
    return registry.ordered_oracles()
