"""Bucketed-table co-located join: pre-bucketing both sides on the join
key removes the shuffle entirely (SCALE.md: 'co-locate joins via
bucketing'). This is the cluster-scale answer for repeated fact-fact
joins too large to broadcast."""

from __future__ import annotations

import pytest

from etl_pipeline_mini_project_01_spark.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    # warehouse.dir is a static conf; pin the database location instead
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{wh}/bkt.db'")
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    (orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
     .sortBy("o_orderkey").saveAsTable("bkt.orders_b"))
    (lineitem.write.mode("overwrite").bucketBy(8, "l_orderkey")
     .sortBy("l_orderkey").saveAsTable("bkt.lineitem_b"))
    yield spark
    spark.sql("DROP TABLE IF EXISTS bkt.orders_b")
    spark.sql("DROP TABLE IF EXISTS bkt.lineitem_b")
    spark.sql("DROP DATABASE IF EXISTS bkt")


def test_bucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    # disable broadcast so the join strategy is driven by bucketing alone
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bkt.lineitem_b").join(
            spark.table("bkt.orders_b"),
            spark.table("bkt.lineitem_b").l_orderkey
            == spark.table("bkt.orders_b").o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: SortMergeJoin with ZERO Exchange operators
        assert "Exchange" not in plan, plan[:2000]
        assert joined.count() == 6000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_catalog_summary_counts(bucketed):
    from etl_pipeline_mini_project_01_spark.sources.io import catalog_summary
    s = catalog_summary(bucketed)
    assert s["databases"] >= 2
    assert s["tables"] >= 2
