"""Streaming library tests: stateful running totals must agree with the
batch ground truth on bounded input."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_mini_project_01_spark.catalog import load_table
from etl_pipeline_mini_project_01_spark.streaming.stateful import (
    run_stateful_to_completion,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stateful_running_totals_match_batch(spark):
    streamed = {r.user_id: (r.n_events, round(r.total_value, 4))
                for r in run_stateful_to_completion(spark, SF_DIR).collect()}
    batch = {r.user_id: (r.n, round(r.tv, 4))
             for r in (load_table(spark, SF_DIR, "events")
                       .groupBy("user_id")
                       .agg(F.count(F.lit(1)).alias("n"),
                            F.sum("value").alias("tv"))).collect()}
    assert streamed == batch
