"""S9 literal DDL executor: lexical per-layer execution, ${VAR}
substitution, catalog effects, and the pipeline's step-0 wiring."""

from __future__ import annotations

from etl_pipeline_mini_project_01_spark.sources.ddl import (
    execute_ddl_scripts,
    split_statements,
)
from etl_pipeline_mini_project_01_spark.sources.io import catalog_summary


def test_split_statements_drops_comments_and_empties():
    script = """-- header comment
CREATE DATABASE IF NOT EXISTS x;

-- another comment
CREATE TABLE x.t (a INT) USING PARQUET LOCATION '/tmp/t';
"""
    stmts = split_statements(script)
    assert len(stmts) == 2
    assert stmts[0].startswith("CREATE DATABASE")
    assert "-- " not in stmts[1]


def test_executor_declares_medallion_catalog(spark, tmp_path):
    report = execute_ddl_scripts(
        spark, {"OUT_DIR": str(tmp_path)}, recreate=True)
    # bronze/silver/gold, 2 files each, lexical order within each layer
    assert list(report) == [
        "bronze/01_create_schema.sql", "bronze/02_create_tables.sql",
        "silver/01_create_schema.sql", "silver/02_create_tables.sql",
        "gold/01_create_schema.sql",
        "gold/02_create_materialized_views.sql",
    ]
    assert sum(report.values()) == 2 + 4 + 8  # dbs + tables per layer
    tables = {t.name for t in spark.catalog.listTables("gold")}
    assert "g1_daily_engagement_summary" in tables and len(tables) == 7
    # ${OUT_DIR} substitution reached the table location
    desc = spark.sql(
        "DESCRIBE TABLE EXTENDED silver.dim_account").collect()
    locs = [r.data_type for r in desc if r.col_name == "Location"]
    assert locs and str(tmp_path) in locs[0]
    # S11 introspection sees the declared catalog
    summary = catalog_summary(spark)
    assert summary["databases"] >= 4 and summary["tables"] >= 11

    # Idempotent without recreate (IF NOT EXISTS path)
    report2 = execute_ddl_scripts(spark, {"OUT_DIR": str(tmp_path)})
    assert sum(report2.values()) == sum(report.values())


def test_pipeline_step0_fills_declared_tables(spark, tmp_path):
    from etl_pipeline_mini_project_01_spark.pipeline import run_pipeline

    stats = run_pipeline(spark, "/root/testdata/sf0.001",
                         str(tmp_path / "medallion"))
    assert stats["ddl_files"] == 6
    assert stats["bronze_rows"] > 0
    assert stats["silver_fact_rows"] == stats["bronze_rows"]
    # catalog-backed reads (spark.table) agree with the path layout
    assert spark.table("silver.dim_account").count() \
        == stats["silver_dim_account_rows"]
    assert stats["tables"] >= 11
