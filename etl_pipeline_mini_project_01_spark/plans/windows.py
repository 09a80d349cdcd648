"""Window / dedup / surrogate-key query set (SURVEY §2.4 A5-A7, §2.6 W1-W3,
§2.9 M4, §2.4 A12).

The reference's DISTINCT ON-latest dedup (silver_etl.py:349-366), SERIAL
surrogate keys (silver/02:34), global engagement rank (gold/02:80) and
MODE() WITHIN GROUP (gold/02:35) all become window functions with explicit,
deterministic tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .parity import dsum, sql_dsum
from .registry import register

#: Versioned-ingest fixture: every event arrives in run_1; every third event
#: is re-ingested an hour later in run_2 with a revised measure. This
#: reproduces the reference's multi-run lineage (pipeline_run_id,
#: ingestion_timestamp - bronze_loader.py:90-94) deterministically in-query.
_VERSIONS_SQL = """
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
           CAST(value AS DOUBLE) AS value,
           CAST(ts AS TIMESTAMP) AS ingestion_ts, 'run_1' AS pipeline_run_id
    FROM events
    UNION ALL
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
           CAST(value AS DOUBLE) * 1.1 AS value,
           CAST(ts AS TIMESTAMP) + INTERVAL 1 HOUR AS ingestion_ts,
           'run_2' AS pipeline_run_id
    FROM events WHERE event_id % 3 = 0
"""


def _versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE scan of the fact, not a self-union (which plans two FileScans
    # - 2x the read at 100 TB): each row emits its run_1 version plus,
    # for every third event, the revised run_2 version, via a row-local
    # array explode. Same rows as the UNION ALL oracle twin.
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value")
    v1 = F.struct(F.col("value").alias("value"),
                  F.col("ts").alias("ingestion_ts"),
                  F.lit("run_1").alias("pipeline_run_id"))
    v2 = F.struct((F.col("value") * 1.1).alias("value"),
                  (F.col("ts") + F.expr("INTERVAL 1 HOUR"))
                  .alias("ingestion_ts"),
                  F.lit("run_2").alias("pipeline_run_id"))
    versions = F.when(F.col("event_id") % 3 == 0, F.array(v1, v2)) \
                .otherwise(F.array(v1))
    return (events
            .select("event_id", "ts", "user_id", "event_type",
                    F.explode(versions).alias("_v"))
            .select("event_id", "ts", "user_id", "event_type",
                    F.col("_v.value").alias("value"),
                    F.col("_v.ingestion_ts").alias("ingestion_ts"),
                    F.col("_v.pipeline_run_id").alias("pipeline_run_id")))


@register(
    "a6_dedup_latest_version",
    oracle=f"""
WITH versions AS ({_VERSIONS_SQL}),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY event_id
        ORDER BY ingestion_ts DESC, pipeline_run_id DESC) AS rn
    FROM versions
)
SELECT event_id, ts, user_id, event_type, value, ingestion_ts, pipeline_run_id
FROM ranked WHERE rn = 1
""",
)
def a6_dedup_latest_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/W3/M3: keep-latest-per-key via window row_number - the canonical
    Spark rewrite of PG DISTINCT ON (id ... ORDER BY ingestion_timestamp
    DESC) and of the upsert sink (S6). Partition-local after one shuffle on
    the key; no global sort."""
    w = Window.partitionBy("event_id").orderBy(
        F.desc("ingestion_ts"), F.desc("pipeline_run_id"))
    return (
        _versions(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "a5_latest_user_snapshot",
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       MAX(CAST(ts AS TIMESTAMP)) AS last_seen,
       MIN(CAST(ts AS TIMESTAMP)) AS first_seen,
       COUNT(DISTINCT event_type) AS distinct_types
FROM events
GROUP BY user_id
""",
)
def a5_latest_user_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: GROUP BY entity with MAX(ingestion_timestamp) - the reference's
    new_accounts dedup (silver_etl.py:144-181)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("ts").alias("last_seen"),
        F.min("ts").alias("first_seen"),
        F.countDistinct("event_type").alias("distinct_types"),
    )


@register(
    "w1_user_engagement_rank",
    oracle=f"""
WITH totals AS (
    SELECT user_id, {sql_dsum('value')} AS total_value, COUNT(*) AS n_events
    FROM events GROUP BY user_id
)
SELECT user_id, total_value, n_events,
       ROW_NUMBER() OVER (ORDER BY total_value DESC, user_id) AS engagement_rank
FROM totals
ORDER BY engagement_rank
LIMIT 100
""",
)
def w1_user_engagement_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: global ROW_NUMBER rank (gold/02:80). Applied post-aggregation
    only - the single-partition window is safe on the (small) aggregate,
    never on the raw table; raw-table top-k uses orderBy().limit() (O2)."""
    events = load_table(spark, sf_dir, "events")
    totals = events.groupBy("user_id").agg(
        dsum("value", "total_value"), F.count(F.lit(1)).alias("n_events"))
    w = Window.orderBy(F.desc("total_value"), "user_id")
    return (
        totals.withColumn("engagement_rank", F.row_number().over(w))
        .orderBy("engagement_rank")
        .limit(100)
    )


@register(
    "a12_daily_modal_event_type",
    oracle="""
WITH counts AS (
    SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS event_date, event_type,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY event_date ORDER BY n DESC, event_type) AS rn
    FROM counts
)
SELECT event_date, event_type AS modal_event_type, n AS modal_count
FROM ranked WHERE rn = 1
ORDER BY event_date
""",
)
def a12_daily_modal_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: MODE() WITHIN GROUP (gold/02:35) with the PG tie-break made
    explicit (count desc, then value asc) - built-in mode() has
    nondeterministic ties, so the engine uses the window form."""
    events = load_table(spark, sf_dir, "events")
    counts = (events.groupBy(F.to_date("ts").alias("event_date"), "event_type")
              .agg(F.count(F.lit(1)).alias("n")))
    w = Window.partitionBy("event_date").orderBy(F.desc("n"), "event_type")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_date", F.col("event_type").alias("modal_event_type"),
                F.col("n").alias("modal_count"))
        .orderBy("event_date")
    )


@register(
    "m4_surrogate_keys",
    oracle="""
WITH dim AS (SELECT DISTINCT event_type FROM events)
SELECT ROW_NUMBER() OVER (ORDER BY event_type) AS event_type_key, event_type
FROM dim
ORDER BY event_type_key
""",
)
def m4_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4: deterministic surrogate keys - row_number over the natural key
    order, replacing SERIAL (silver/02:34). monotonically_increasing_id is
    rejected: nondeterministic across runs/partitionings."""
    events = load_table(spark, sf_dir, "events")
    dim = events.select("event_type").distinct()
    w = Window.orderBy("event_type")
    return (dim.withColumn("event_type_key", F.row_number().over(w))
            .select("event_type_key", "event_type")
            .orderBy("event_type_key"))


@register(
    "w2_user_daily_value_change",
    oracle=f"""
WITH daily AS (
    SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS event_date,
           {sql_dsum('value')} AS daily_value
    FROM events GROUP BY 1, 2
)
SELECT user_id, event_date, daily_value,
       LAG(daily_value) OVER (PARTITION BY user_id ORDER BY event_date)
           AS prev_value,
       daily_value - LAG(daily_value) OVER (
           PARTITION BY user_id ORDER BY event_date) AS value_delta
FROM daily
""",
)
def w2_user_daily_value_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: LAG over a partition (gold/02:221-222 day-over-day sentiment)."""
    events = load_table(spark, sf_dir, "events")
    daily = (events.groupBy("user_id", F.to_date("ts").alias("event_date"))
             .agg(dsum("value", "daily_value")))
    w = Window.partitionBy("user_id").orderBy("event_date")
    prev = F.lag("daily_value").over(w)
    return (daily
            .withColumn("prev_value", prev)
            .withColumn("value_delta", F.col("daily_value") - prev))
