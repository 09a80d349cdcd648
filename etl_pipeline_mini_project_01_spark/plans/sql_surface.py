"""SQL API surface: the engine's second query interface.

The reference is a SQL *client* (ships SQL strings to Postgres,
model_executor.py:46-53); this engine owns a real SQL frontend via
spark.sql - same Catalyst lifecycle as the DataFrame API (SURVEY §3.3).
These queries register the harness tables as temp views and execute Spark
SQL text, proving both surfaces share semantics (the oracle is the same
one the DataFrame twin uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import TABLES, load_table
from .parity import sql_davg, sql_dsum
from .registry import register


def register_temp_views(spark: SparkSession, sf_dir: str,
                        tables: tuple[str, ...] = TABLES) -> None:
    """S9-analogue: bind the catalog so spark.sql text can run (the
    engine's 'DDL layer' is view registration, not CREATE TABLE files)."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


@register(
    "sql_surface_daily_trends",
    oracle=f"""
WITH daily AS (
    SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS event_date, event_type,
           COUNT(*) AS event_count,
           {sql_dsum('value')} AS total_value
    FROM events GROUP BY 1, 2
)
SELECT event_date, event_type, event_count, total_value,
       LAG(event_count) OVER (PARTITION BY event_type ORDER BY event_date)
           AS prev_day_count
FROM daily
ORDER BY event_date, event_type
""",
)
def sql_surface_daily_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G6-lite expressed as Spark SQL text (not DataFrame calls): the
    engine's SQL surface compiles through the same Catalyst pipeline, so
    results are identical to the DataFrame twin (g6_daily_event_trends)."""
    register_temp_views(spark, sf_dir, ("events",))
    return spark.sql("""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS event_date, event_type,
                   COUNT(*) AS event_count,
                   CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                       AS total_value
            FROM events GROUP BY 1, 2
        )
        SELECT event_date, event_type, event_count, total_value,
               LAG(event_count) OVER (PARTITION BY event_type
                                      ORDER BY event_date) AS prev_day_count
        FROM daily
        ORDER BY event_date, event_type
    """)


@register(
    "sql_surface_star_revenue",
    oracle=f"""
SELECT n.n_name AS nation_name,
       COUNT(*) AS line_count,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
           AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY nation_name
""",
)
def sql_surface_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join via Spark SQL text - the SQL-surface twin of j7,
    proving hints pass through the SQL parser into the same Catalyst
    pipeline. Hint policy matches j7 after the broadcast sweep: only
    the CONSTANT dim (nation, 25 rows) carries a hint; customer GROWS
    with the corpus, so its hint (a sweep survivor hiding in SQL text
    until r11) is gone - AQE size-checks it instead, broadcast while
    it fits, shuffle join at the scale where it no longer does.
    Plan-guarded in test_no_forced_bigside_broadcast."""
    register_temp_views(spark, sf_dir,
                        ("lineitem", "orders", "customer", "nation"))
    return spark.sql("""
        SELECT /*+ BROADCAST(n) */
               n.n_name AS nation_name,
               COUNT(*) AS line_count,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                   AS revenue
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        ORDER BY nation_name
    """)


@register(
    "a11_approx_distinct",
    oracle="""
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS within_2pct
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def a11_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB-scale variant of exact COUNT(DISTINCT) (SCALE.md TODO):
    HyperLogLog++ sketch, one pass, no expand. The raw HLL estimate is
    engine-specific by nature, so the checked surface emits the exact
    count plus the |approx - exact| / exact <= 2% VERDICT as a boolean
    (oracle = exact count + literal TRUE) - hash-checkable evidence the
    sketch meets its accuracy contract, without hashing sketch noise."""
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
    )
    return agg.select(
        "event_type", "exact_users",
        (F.abs(F.col("approx_users") - F.col("exact_users"))
         <= 0.02 * F.col("exact_users")).alias("within_2pct"),
    ).orderBy("event_type")
