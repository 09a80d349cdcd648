"""t2-mimic: every registered query with an oracle must hash-match DuckDB
on the same parquet inputs (sf0.001 by default for speed; the driver runs
sf0.01 - set SPARK_GRAFT_TEST_SF_DIR to cross-check)."""

from __future__ import annotations

import pytest

from etl_pipeline_mini_project_01_spark.plans.registry import (
    ORACLES,
    QUERIES,
    load_all_plans,
)

from conftest import assert_query_matches_oracle

load_all_plans()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_runs(spark, name):
    df = QUERIES[name](spark, "/root/testdata/sf0.001")
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
