"""As-of join unit semantics: backward direction, tie inclusion, missing
match -> NULL (the DuckDB ASOF contract the oracle enforces at scale)."""

from __future__ import annotations

import datetime

from etl_pipeline_mini_project_01_spark.operators.asof import (
    asof_join_backward,
)


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_backward_ties_and_misses(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-05T00:00:00")),   # after both rights -> latest
         (2, 10, _ts("2024-01-03T00:00:00")),   # tie with right ts -> included
         (3, 10, _ts("2024-01-01T00:00:00")),   # before all rights -> NULL
         (4, 99, _ts("2024-01-05T00:00:00"))],  # key with no rights -> NULL
        ["event_id", "k", "ts"])
    right = spark.createDataFrame(
        [(10, _ts("2024-01-02T00:00:00"), "old"),
         (10, _ts("2024-01-03T00:00:00"), "new")],
        ["k", "rts", "payload"])
    out = {r["event_id"]: r["payload"]
           for r in asof_join_backward(left, right, key="k", left_ts="ts",
                                       right_ts="rts",
                                       payload=["payload"]).collect()}
    assert out == {1: "new", 2: "new", 3: None, 4: None}


def test_asof_null_join_keys_never_match(spark):
    """ADVICE r10: DuckDB ASOF's equality condition never matches NULL
    keys, but Window.partitionBy groups NULLs together - a NULL-key
    right row must not be carried into NULL-key left rows, and left
    NULL-key rows still surface with NULL payload."""
    left = spark.createDataFrame(
        [(1, None, _ts("2024-01-05T00:00:00")),
         (2, 10, _ts("2024-01-05T00:00:00"))],
        "event_id bigint, k int, ts timestamp")
    right = spark.createDataFrame(
        [(None, _ts("2024-01-01T00:00:00"), "null-key"),
         (10, _ts("2024-01-02T00:00:00"), "real")],
        "k int, rts timestamp, payload string")
    out = {r["event_id"]: r["payload"]
           for r in asof_join_backward(left, right, key="k", left_ts="ts",
                                       right_ts="rts",
                                       payload=["payload"]).collect()}
    assert out == {1: None, 2: "real"}
