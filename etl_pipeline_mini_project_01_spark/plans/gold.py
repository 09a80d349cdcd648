"""Gold layer: the reference's 7 materialized analytical views
(SURVEY §2.10 G1-G7; /root/reference/models/gold/
02_create_materialized_views.sql), re-skinned onto the harness star:
events = fact, customer = account dim, documents = content, score bands =
sentiment dim, calendar derived from ts.

Materialization note: in the engine these are CTAS tables refreshed by
recompute + atomic overwrite (M6, operators/sinks) - the queries here are
the view definitions themselves, which is what the oracle checks.

G6 lives in plans/core.py (flagship).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.dates import calendar_attrs
from ..functions.text import preview
from .parity import davg, dsum, sql_davg, sql_dsum
from .registry import RUN_TS, register


@register(
    "g1_daily_engagement_summary",
    oracle=f"""
WITH base AS (
    SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS full_date,
           date_part('year', ts) AS year,
           date_part('month', ts) AS month,
           dayname(CAST(ts AS TIMESTAMP)) AS day_name,
           date_part('dow', ts) IN (0, 6) AS is_weekend,
           user_id, event_type, value
    FROM events
),
modal AS (
    SELECT full_date, event_type AS top_event_type FROM (
        SELECT full_date, event_type,
               ROW_NUMBER() OVER (PARTITION BY full_date
                   ORDER BY COUNT(*) DESC, event_type) AS rn
        FROM base GROUP BY full_date, event_type
    ) WHERE rn = 1
),
daily AS (
    SELECT full_date, year, month, day_name, is_weekend,
           COUNT(*) AS total_events,
           COUNT(DISTINCT user_id) AS unique_users,
           {sql_dsum('value')} AS total_value,
           {sql_davg('value')} AS avg_value,
           CAST(MAX(value) AS DOUBLE) AS max_value,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase_count,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error_count,
           CAST(SUM(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT)
               AS high_value_events,
           CAST(100.0 * COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                AS DOUBLE) / NULLIF(COUNT(*), 0) AS purchase_pct
    FROM base
    GROUP BY full_date, year, month, day_name, is_weekend
)
SELECT d.*, m.top_event_type
FROM daily d LEFT JOIN modal m ON d.full_date = m.full_date
ORDER BY d.full_date
""",
)
def g1_daily_engagement_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 (gold/02:11-48): daily rollup - calendar attrs, total/distinct
    counts (A11), decimal-exact sums/avgs, conditional aggregation (A9),
    NULLIF-guarded ratio (A10), and the MODE-with-PG-tie-break (A12) via a
    per-day window join. One shuffle for the rollup, one for the (tiny)
    modal CTE."""
    events = load_table(spark, sf_dir, "events")
    cal = calendar_attrs("ts")
    base = events.select(
        cal["full_date"].alias("full_date"), cal["year"].alias("year"),
        cal["month"].alias("month"), cal["day_name"].alias("day_name"),
        cal["is_weekend"].alias("is_weekend"),
        "user_id", "event_type", "value")
    is_purchase = F.when(F.col("event_type") == "purchase", 1)
    daily = (base.groupBy("full_date", "year", "month", "day_name", "is_weekend")
             .agg(
                 F.count(F.lit(1)).alias("total_events"),
                 F.countDistinct("user_id").alias("unique_users"),
                 dsum("value", "total_value"),
                 davg("value", "avg_value"),
                 F.max("value").alias("max_value"),
                 F.count(is_purchase).alias("purchase_count"),
                 F.count(F.when(F.col("event_type") == "error", 1))
                 .alias("error_count"),
                 F.sum(F.when(F.col("value") > 100, 1).otherwise(0))
                 .alias("high_value_events"),
                 ((F.lit(100.0) * F.count(is_purchase)).cast("double")
                  / F.nullif(F.count(F.lit(1)), F.lit(0))).alias("purchase_pct"),
             ))
    counts = base.groupBy("full_date", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("full_date").orderBy(F.desc("n"), "event_type")
    modal = (counts.withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") == 1)
             .select("full_date", F.col("event_type").alias("top_event_type")))
    return daily.join(modal, "full_date", "left").orderBy("full_date")


@register(
    "g2_top_performing_content",
    oracle="""
WITH topk AS (
    SELECT e.event_id, e.user_id, e.event_type, CAST(e.value AS DOUBLE) AS value,
           e.event_id % (SELECT COUNT(*) FROM documents) AS doc_id
    FROM events e
    ORDER BY value DESC, event_id
    LIMIT 1000
)
SELECT f.event_id, f.event_type, f.value,
       SUBSTRING(d.text, 1, 200) AS content_preview,
       d.lang AS content_lang,
       c.c_name AS account_name,
       CAST(f.value AS DOUBLE) / NULLIF(d.n_chars, 0) AS engagement_rate,
       ROW_NUMBER() OVER (ORDER BY f.value DESC, f.event_id) AS engagement_rank
FROM topk f
LEFT JOIN documents d ON f.doc_id = d.doc_id
LEFT JOIN customer c ON f.user_id = c.c_custkey
ORDER BY engagement_rank
""",
)
def g2_top_performing_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2 (gold/02:56-89): top-1000 content by engagement. Top-k FIRST
    (orderBy+limit plans as TakeOrderedAndProject - no global-window
    exchange over the full fact), then dim joins + rank over the 1000
    survivors only. The deterministic event->document FK is
    event_id % |documents|, with |documents| derived via a broadcast
    1-row count join (scalar-subquery shape; no driver-side count), so
    every SF exercises the whole documents table. F6 preview, F16/A10
    guarded rate, W1 rank.

    No broadcast HINT on documents/customer (VERDICT r9 #1): both grow
    with the corpus, and a hint overrides AQE's size check - forcing a
    full-documents broadcast (text payloads included) is an
    OOM-by-construction at 100x. The 1000-row top-k side makes any
    join strategy cheap; AQE broadcasts whichever side is genuinely
    small at runtime. Only the 1-row count relation keeps its hint.
    Plan-guarded in tests/test_plan_properties.py::
    test_no_forced_bigside_broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    cust = load_table(spark, sf_dir, "customer")
    n_docs = F.broadcast(
        load_table(spark, sf_dir, "documents")
        .agg(F.count(F.lit(1)).alias("__n_docs")))
    topk = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .join(n_docs)  # 1-row broadcast: scalar-subquery shape
        .withColumn("doc_id", F.col("event_id") % F.col("__n_docs"))
        .drop("__n_docs")
        .orderBy(F.desc("value"), "event_id")
        .limit(1000)
    )
    w = Window.orderBy(F.desc("value"), "event_id")
    return (
        topk.join(docs, "doc_id", "left")
        .join(cust, topk.user_id == cust.c_custkey, "left")
        .select(
            "event_id", "event_type", "value",
            preview("text", 200).alias("content_preview"),
            F.col("lang").alias("content_lang"),
            F.col("c_name").alias("account_name"),
            (F.col("value").cast("double")
             / F.nullif(F.col("n_chars"), F.lit(0))).alias("engagement_rate"),
        )
        .withColumn("engagement_rank", F.row_number().over(w))
        .orderBy("engagement_rank")
    )


@register(
    "g3_account_influence",
    oracle=f"""
SELECT c.c_custkey AS account_id,
       c.c_name AS account_name,
       c.c_mktsegment AS segment,
       n.n_name AS nation_name,
       CASE WHEN c.c_acctbal >= 7500 THEN 'Mega'
            WHEN c.c_acctbal >= 5000 THEN 'Macro'
            WHEN c.c_acctbal >= 2500 THEN 'Mid'
            ELSE 'Micro' END AS influence_tier,
       COUNT(e.event_id) AS total_events,
       COUNT(DISTINCT e.event_type) AS distinct_event_types,
       {sql_dsum('e.value')} AS total_value,
       {sql_davg('e.value')} AS avg_value,
       COUNT(CASE WHEN e.event_type = 'purchase' THEN 1 END) AS purchases,
       CAST(100.0 * COUNT(CASE WHEN e.event_type = 'purchase' THEN 1 END)
            AS DOUBLE) / NULLIF(COUNT(e.event_id), 0) AS purchase_pct
FROM customer c
JOIN events e ON e.user_id = c.c_custkey
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY c.c_custkey, c.c_name, c.c_mktsegment, n.n_name, c.c_acctbal
ORDER BY total_value DESC, account_id
LIMIT 500
""",
)
def g3_account_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 (gold/02:97-135): account-influence rollup - dim⋈fact with
    group-by on account attrs, P10 influence tier, A9/A10/A11 aggregates,
    top-500. Events shuffle on user_id once; dims broadcast."""
    events = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    tier = (F.when(F.col("c_acctbal") >= 7500, "Mega")
            .when(F.col("c_acctbal") >= 5000, "Macro")
            .when(F.col("c_acctbal") >= 2500, "Mid").otherwise("Micro"))
    is_purchase = F.when(F.col("event_type") == "purchase", 1)
    return (
        cust.join(events, events.user_id == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey, "left")
        .groupBy(
            F.col("c_custkey").alias("account_id"),
            F.col("c_name").alias("account_name"),
            F.col("c_mktsegment").alias("segment"),
            F.col("n_name").alias("nation_name"),
            tier.alias("influence_tier"),
        )
        .agg(
            F.count("event_id").alias("total_events"),
            F.countDistinct("event_type").alias("distinct_event_types"),
            dsum("value", "total_value"),
            davg("value", "avg_value"),
            F.count(is_purchase).alias("purchases"),
            ((F.lit(100.0) * F.count(is_purchase)).cast("double")
             / F.nullif(F.count("event_id"), F.lit(0))).alias("purchase_pct"),
        )
        .orderBy(F.desc("total_value"), "account_id")
        .limit(500)
    )


@register(
    "g4_hashtag_performance",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, n_chars, source,
           TRIM(unnest(string_split_regex(LOWER(text), '\\s+'))) AS tag
    FROM documents
)
SELECT tag,
       COUNT(*) AS total_mentions,
       COUNT(DISTINCT doc_id) AS unique_docs,
       COUNT(DISTINCT source) AS unique_sources,
       {sql_davg('n_chars')} AS avg_doc_chars
FROM toks
WHERE tag <> ''
GROUP BY tag
HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY total_mentions DESC, tag
LIMIT 500
""",
)
def g4_hashtag_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4 (gold/02:143-180): explode tags -> per-tag rollup with multiple
    COUNT(DISTINCT)s (A11), HAVING >= 2 (A13), top-500 (O2)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (docs.select(
        "doc_id", "n_chars", "source",
        F.explode(F.split(F.lower("text"), r"\s+")).alias("tag"))
        .withColumn("tag", F.trim("tag"))
        .filter(F.col("tag") != ""))
    return (
        toks.groupBy("tag")
        .agg(
            F.count(F.lit(1)).alias("total_mentions"),
            F.countDistinct("doc_id").alias("unique_docs"),
            F.countDistinct("source").alias("unique_sources"),
            davg("n_chars", "avg_doc_chars"),
        )
        .filter(F.col("unique_docs") >= 2)
        .orderBy(F.desc("total_mentions"), "tag")
        .limit(500)
    )


@register(
    "g5_hourly_posting_patterns",
    oracle=f"""
WITH hourly AS (
    SELECT date_part('hour', ts) AS hour,
           dayname(CAST(ts AS TIMESTAMP)) AS day_name,
           date_part('dow', ts) IN (0, 6) AS is_weekend,
           COUNT(*) AS event_count,
           {sql_davg('value')} AS avg_value,
           {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY 1, 2, 3
)
SELECT *,
       ROW_NUMBER() OVER (ORDER BY avg_value DESC, hour, day_name)
           AS engagement_rank
FROM hourly
ORDER BY engagement_rank
""",
)
def g5_hourly_posting_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5 (gold/02:188-204): hour x day-name grid with avg engagement and
    post-aggregation global rank (W1 - safe: <=168 rows)."""
    events = load_table(spark, sf_dir, "events")
    hourly = (events.groupBy(
        F.hour("ts").alias("hour"),
        F.date_format("ts", "EEEE").alias("day_name"),
        F.dayofweek("ts").isin(1, 7).alias("is_weekend"))
        .agg(F.count(F.lit(1)).alias("event_count"),
             davg("value", "avg_value"),
             dsum("value", "total_value")))
    w = Window.orderBy(F.desc("avg_value"), "hour", "day_name")
    return (hourly.withColumn("engagement_rank", F.row_number().over(w))
            .orderBy("engagement_rank"))


@register(
    "g7_viral_content",
    oracle=f"""
WITH enriched AS (
    SELECT e.event_id, e.event_type, e.user_id,
           CAST(e.value AS DOUBLE) AS value,
           COALESCE(CAST(json_extract_string(e.props, '$.k') AS DOUBLE), 0.0)
               AS k_value,
           CAST(epoch(TIMESTAMP '{RUN_TS}')
                - floor(epoch(CAST(e.ts AS TIMESTAMP))) AS DOUBLE) / 3600.0
               AS hours_since_post
    FROM events e
),
scored AS (
    SELECT *,
           value + k_value AS total_engagement,
           (value * 0.4 + k_value * 0.4 + (value + k_value) * 0.2)
             / NULLIF(hours_since_post, 0) AS virality_score
    FROM enriched
)
SELECT event_id, event_type, user_id, value, k_value, total_engagement,
       hours_since_post, virality_score
FROM scored
WHERE total_engagement > 10
ORDER BY virality_score DESC, event_id
LIMIT 500
""",
)
def g7_viral_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G7 (gold/02:238-271): time-decay virality - weighted composite
    (F14) over engagement measures divided by hours-since-post (F11,
    frozen RUN_TS), filter total>10 pushed below the sort, top-500."""
    events = load_table(spark, sf_dir, "events")
    run_ts = F.lit(RUN_TS).cast("timestamp")
    k = F.coalesce(F.get_json_object("props", "$.k").cast("double"), F.lit(0.0))
    hours = ((F.unix_timestamp(run_ts) - F.unix_timestamp(F.col("ts")))
             .cast("double") / F.lit(3600.0))
    enriched = events.select(
        "event_id", "event_type", "user_id", "value",
        k.alias("k_value"), hours.alias("hours_since_post"))
    total = F.col("value") + F.col("k_value")
    score = ((F.col("value") * 0.4 + F.col("k_value") * 0.4 + total * 0.2)
             / F.nullif(F.col("hours_since_post"), F.lit(0.0)))
    return (
        enriched
        .withColumn("total_engagement", total)
        .withColumn("virality_score", score)
        .filter(F.col("total_engagement") > 10)
        .orderBy(F.desc("virality_score"), "event_id")
        .limit(500)
    )
