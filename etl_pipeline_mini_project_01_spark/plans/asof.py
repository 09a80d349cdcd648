"""As-of join query: each event picks up the latest order at-or-before
its timestamp (operators/asof.py). DuckDB oracles it with its native
ASOF JOIN - the engine's composition must reproduce exactly that
semantics (backward direction, ties included)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.asof import asof_join_backward
from .registry import register


@register(
    "asof_join_latest_order",
    oracle="""
WITH snap AS (
    SELECT o_custkey AS user_id, o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS last_order_price
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY o_custkey, o_orderdate
            ORDER BY o_orderkey DESC) AS rn
        FROM orders
    ) WHERE rn = 1
)
SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
       s.last_order_price
FROM events e
ASOF LEFT JOIN snap s
    ON e.user_id = s.user_id AND CAST(e.ts AS TIMESTAMP) >= s.o_orderdate
ORDER BY e.event_id
""",
)
def asof_join_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join via the union+window composition (one shuffle
    on user_id, no range join): events x latest prior order snapshot.
    The right side dedups to one row per (user, orderdate) with a
    deterministic tie-break first - the same contract DuckDB ASOF
    requires for reproducibility with duplicate timestamps."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.desc("o_orderkey"))
    snap = (orders
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("o_custkey").alias("user_id"),
                    "o_orderdate",
                    F.col("o_totalprice").alias("last_order_price")))
    out = asof_join_backward(events, snap, key="user_id",
                             left_ts="ts", right_ts="o_orderdate",
                             payload=["last_order_price"])
    return out.orderBy("event_id")
