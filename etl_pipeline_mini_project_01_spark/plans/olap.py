"""OLAP extension surface: pivot and cube/rollup.

The reference has no grouping-sets operators (SURVEY §2.4 'not present'),
but a complete analytics engine needs them; both compile to a single
Expand + aggregate in Spark (one shuffle, map-side combined).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .parity import dsum, sql_dsum
from .registry import register


@register(
    "olap_rollup_returnflag_status",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n,
       {sql_dsum('l_quantity')} AS total_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""",
)
def olap_rollup_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals: (flag, status) -> (flag) -> grand total;
    NULL marks subtotal rows in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity", "total_qty"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(),
                 F.col("l_linestatus").asc_nulls_first())
    )


@register(
    "olap_cube_type_weekend",
    oracle=f"""
SELECT event_type,
       date_part('dow', ts) IN (0, 6) AS is_weekend,
       COUNT(*) AS n,
       {sql_dsum('value')} AS total_value
FROM events
GROUP BY CUBE (event_type, is_weekend)
ORDER BY event_type NULLS FIRST, is_weekend NULLS FIRST
""",
)
def olap_cube_type_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, is_weekend): all 4 grouping sets in one
    Expand+aggregate pass."""
    events = load_table(spark, sf_dir, "events")
    return (
        events
        .select("event_type", "value",
                F.dayofweek("ts").isin(1, 7).alias("is_weekend"))
        .cube("event_type", "is_weekend")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "total_value"))
        .orderBy(F.col("event_type").asc_nulls_first(),
                 F.col("is_weekend").asc_nulls_first())
    )


@register(
    "olap_pivot_status_qty",
    oracle=f"""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'O'
                THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS O,
       CAST(SUM(CASE WHEN l_linestatus = 'F'
                THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS F
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def olap_pivot_status_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT linestatus into columns (explicit value list, so no extra
    distinct-discovery job); oracle = conditional aggregation, the
    relational identity of pivot."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double"))
        .orderBy("l_returnflag")
    )


@register(
    "olap_grouping_sets",
    oracle=f"""
SELECT event_type,
       date_part('dow', ts) IN (0, 6) AS is_weekend,
       COUNT(*) AS n,
       {sql_dsum('value')} AS total_value
FROM events
GROUP BY GROUPING SETS ((event_type), (is_weekend), ())
ORDER BY event_type NULLS FIRST, is_weekend NULLS FIRST
""",
)
def olap_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form rollup/cube specialize):
    per-type totals, per-weekend totals, and the grand total in ONE
    Expand + aggregate pass - one shuffle for all three groupings, vs
    three scans if issued separately."""
    events = load_table(spark, sf_dir, "events")
    events.select(
        "event_type", "value",
        F.dayofweek("ts").isin(1, 7).alias("is_weekend"),
    ).createOrReplaceTempView("ev_gs")
    return spark.sql(f"""
        SELECT event_type, is_weekend,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        FROM ev_gs
        GROUP BY GROUPING SETS ((event_type), (is_weekend), ())
        ORDER BY event_type ASC NULLS FIRST, is_weekend ASC NULLS FIRST
    """)


@register(
    "setops_user_segments",
    oracle="""
WITH clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
purchasers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
SELECT user_id, 'both' AS segment
FROM (SELECT user_id FROM clickers INTERSECT SELECT user_id FROM purchasers)
UNION ALL
SELECT user_id, 'click_only' AS segment
FROM (SELECT user_id FROM clickers EXCEPT SELECT user_id FROM purchasers)
UNION ALL
SELECT user_id, 'purchase_only' AS segment
FROM (SELECT user_id FROM purchasers EXCEPT SELECT user_id FROM clickers)
ORDER BY user_id
""",
)
def setops_user_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (SURVEY §2.12: INTERSECT/EXCEPT are engine
    capabilities beyond the reference's implicit unions): user segments
    via intersect/except over distinct key sets - each compiles to a
    hash-partitioned distinct + join under Catalyst."""
    events = load_table(spark, sf_dir, "events")
    clickers = (events.filter(F.col("event_type") == "click")
                .select("user_id").distinct())
    purchasers = (events.filter(F.col("event_type") == "purchase")
                  .select("user_id").distinct())
    both = clickers.intersect(purchasers).withColumn("segment", F.lit("both"))
    click_only = (clickers.exceptAll(purchasers)
                  .withColumn("segment", F.lit("click_only")))
    purchase_only = (purchasers.exceptAll(clickers)
                     .withColumn("segment", F.lit("purchase_only")))
    return both.unionByName(click_only).unionByName(purchase_only).orderBy("user_id")
