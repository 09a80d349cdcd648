"""Core query set: the flagship daily-trend query plus the reference's
basic aggregate/sort/top-k surface (SURVEY §2.4 A1-A3, §2.8 O1-O2).

Reference citations:
  * flagship shape = mv_sentiment_trends (G6): daily counts per class +
    LAG day-over-day change (/root/reference/models/gold/
    02_create_materialized_views.sql:212-230), re-skinned onto `events`
    (event_type plays sentiment_value).
  * A1 language distribution: /root/reference/src/extractor/
    hashtag_data_extractor.py:487-493 (group/sort/head(5)).
  * A3 scalar engagement stats: hashtag_data_extractor.py:475-482.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .parity import davg, dsum, sql_davg, sql_dsum
from .registry import register


@register(
    "g6_daily_event_trends",
    oracle=f"""
WITH daily AS (
    SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS event_date,
           event_type,
           COUNT(*) AS event_count,
           COUNT(DISTINCT user_id) AS unique_users,
           {sql_dsum('value')} AS total_value,
           {sql_davg('value')} AS avg_value
    FROM events
    GROUP BY 1, 2
)
SELECT event_date, event_type, event_count, unique_users, total_value, avg_value,
       LAG(event_count) OVER (PARTITION BY event_type ORDER BY event_date)
           AS prev_day_count,
       CAST(event_count - LAG(event_count) OVER (
           PARTITION BY event_type ORDER BY event_date) AS DOUBLE)
         / NULLIF(LAG(event_count) OVER (
           PARTITION BY event_type ORDER BY event_date), 0) * 100.0
           AS pct_change
FROM daily
ORDER BY event_date, event_type
""",
)
def g6_daily_event_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-type event trend with day-over-day % change (G6 shape:
    A2 group-count, A3 avg, A11 distinct users, W2 LAG, F12 NULLIF guard).
    """
    events = load_table(spark, sf_dir, "events")
    daily = (
        events
        .groupBy(F.to_date("ts").alias("event_date"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.countDistinct("user_id").alias("unique_users"),
            dsum("value", "total_value"),
            davg("value", "avg_value"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("event_date")
    prev = F.lag("event_count").over(w)
    return (
        daily
        .withColumn("prev_day_count", prev)
        .withColumn(
            "pct_change",
            (F.col("event_count") - prev).cast("double")
            / F.nullif(prev, F.lit(0)) * F.lit(100.0),
        )
        .orderBy("event_date", "event_type")
    )


@register(
    "a1_language_distribution",
    oracle="""
SELECT lang, COUNT(*) AS doc_count
FROM documents
WHERE lang IS NOT NULL
GROUP BY lang
ORDER BY doc_count DESC, lang
LIMIT 5
""",
)
def a1_language_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 language distribution (A1 + P8 not-null + O2 top-k).

    Tie-break on `lang` so the top-5 cut is deterministic for the oracle.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("lang").isNotNull())
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.desc("doc_count"), "lang")
        .limit(5)
    )


@register(
    "a3_engagement_stats",
    oracle=f"""
SELECT COUNT(*) AS total_events,
       COUNT(DISTINCT user_id) AS unique_users,
       COUNT(DISTINCT event_type) AS event_types,
       {sql_davg('value')} AS avg_value,
       {sql_dsum('value')} AS total_value,
       CAST(MIN(value) AS DOUBLE) AS min_value,
       CAST(MAX(value) AS DOUBLE) AS max_value
FROM events
""",
)
def a3_engagement_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar engagement statistics (A3: mean/max/sum/min/count/n_unique)."""
    events = load_table(spark, sf_dir, "events")
    return events.agg(
        F.count(F.lit(1)).alias("total_events"),
        F.countDistinct("user_id").alias("unique_users"),
        F.countDistinct("event_type").alias("event_types"),
        davg("value", "avg_value"),
        dsum("value", "total_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@register(
    "a2_event_type_distribution",
    oracle="""
SELECT event_type, COUNT(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def a2_event_type_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentiment-distribution analogue (A2): counts per event_type."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).orderBy("event_type")


@register(
    "o2_top_events",
    oracle="""
SELECT event_id, user_id, event_type, CAST(value AS DOUBLE) AS value
FROM events
ORDER BY value DESC, event_id
LIMIT 100
""",
)
def o2_top_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by engagement (O2): plans as TakeOrderedAndProject - no global
    shuffle-sort of the full table, which is the 100TB-safe form of O1."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.select("event_id", "user_id", "event_type", "value")
        .orderBy(F.desc("value"), "event_id")
        .limit(100)
    )


@register(
    "p2_time_window_cutoff",
    oracle="""
SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
       CAST(value AS DOUBLE) AS value
FROM events
WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-24 00:00:00'
ORDER BY event_id
""",
)
def p2_time_window_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: extraction time-window cutoff (hashtag_data_extractor.py:41-47:
    drop rows older than now - N days; frozen cutoff = RUN_TS - 8 days).
    At scale this predicate prunes date partitions before any scan."""
    events = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-24 00:00:00").cast("timestamp_ntz")
    return (events.filter(F.col("ts") >= cutoff)
            .select("event_id", "ts", "event_type", "value")
            .orderBy("event_id"))


@register(
    "a7_dedup_keep_first",
    oracle="""
WITH versions AS (
    SELECT event_id, user_id, CAST(value AS DOUBLE) AS value, 1 AS src
    FROM events
    UNION ALL
    SELECT event_id, user_id, CAST(value AS DOUBLE) * 2 AS value, 2 AS src
    FROM events WHERE event_id % 4 = 1
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY src) AS rn
    FROM versions
)
SELECT event_id, user_id, value, src
FROM ranked WHERE rn = 1
ORDER BY event_id
""",
)
def a7_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: df.unique(keep='first') (data_quality.py:57-62). Spark's
    dropDuplicates keeps an ARBITRARY row, so the engine's deterministic
    form orders by an explicit arrival column - the documented replacement
    (SURVEY A7 note). Fixture: every 4th event arrives twice."""
    events = load_table(spark, sf_dir, "events")
    v1 = events.select("event_id", "user_id", "value").withColumn("src", F.lit(1))
    v2 = (events.filter(F.col("event_id") % 4 == 1)
          .select("event_id", "user_id", (F.col("value") * 2).alias("value"))
          .withColumn("src", F.lit(2)))
    w = Window.partitionBy("event_id").orderBy("src")
    return (v1.unionByName(v2)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
            .orderBy("event_id"))


@register(
    "o1_global_sort",
    oracle="""
SELECT event_id, user_id, event_type, CAST(value AS DOUBLE) AS value
FROM events
ORDER BY value DESC, event_id
""",
)
def o1_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: full global sort (range-partitioned exchange + per-partition
    sort). Kept for parity with the reference's ORDER BY-everywhere MVs;
    the engine prefers O2 top-k when a LIMIT exists (see o2_top_events)."""
    events = load_table(spark, sf_dir, "events")
    return (events.select("event_id", "user_id", "event_type", "value")
            .orderBy(F.desc("value"), "event_id"))


@register(
    "a14_table_stats",
    oracle="""
SELECT COUNT(*) AS row_count,
       COUNT(DISTINCT user_id) AS distinct_users,
       MIN(CAST(ts AS TIMESTAMP)) AS min_ts,
       MAX(CAST(ts AS TIMESTAMP)) AS max_ts,
       (SELECT COUNT(*) FROM (
           SELECT user_id FROM events GROUP BY user_id HAVING COUNT(*) > 1))
           AS users_with_dups
FROM events
""",
)
def a14_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14: post-load verification stats (bronze_loader.py:198-220,
    silver_etl.py:501-522): row counts, distinct keys, time range, and the
    GROUP BY ... HAVING COUNT(*)>1 duplicate detector."""
    events = load_table(spark, sf_dir, "events")
    dups = (events.groupBy("user_id").count()
            .filter(F.col("count") > 1).count())
    return events.agg(
        F.count(F.lit(1)).alias("row_count"),
        F.countDistinct("user_id").alias("distinct_users"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
        F.lit(dups).cast("bigint").alias("users_with_dups"),
    )
