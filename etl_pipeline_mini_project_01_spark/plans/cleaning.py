"""Data-quality / projection / scalar-function query set
(SURVEY §2.2 P3-P10, §2.5 F6-F18, §2.4 A8).

Each query re-skins a reference transform onto the harness tables:
  * p3/p5/p6/p9/p10 bundle -> events  (data_quality.py:24-54,
    json_extractor.py:152-165, silver_etl.py:163-167)
  * p4/f6/f7 bundle        -> documents (data_quality.py:35-44, gold/02:59)
  * dim_date build         -> events.ts (silver_etl.py:95-130)
  * pricing summary        -> lineitem (additive measures F15 + safe casts
    F18 + decimal-exact aggregate rounding F13)
  * user activity age      -> events (F11 epoch arithmetic with frozen now,
    P10 tiering)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.cleaning import (
    blank_to_null,
    normalize_string_nulls,
    nullify_negative,
    nullify_out_of_domain,
    nullify_overlong,
    null_profile,
    tier,
)
from ..functions.dates import calendar_attrs
from ..functions.text import preview
from .parity import davg, dsum, sql_davg, sql_dsum
from .registry import RUN_TS, register

EVENT_DOMAIN = ("click", "view", "purchase", "signup")  # 'error' -> NULL (P5)


@register(
    "p_clean_events",
    oracle="""
SELECT event_id,
       CASE WHEN value < 0 THEN NULL ELSE CAST(value AS DOUBLE) END AS value_clean,
       CASE WHEN event_type NOT IN ('click','view','purchase','signup')
            THEN NULL ELSE event_type END AS event_type_clean,
       CASE WHEN TRIM(props) = '' THEN NULL ELSE props END AS props_clean,
       value > 100 AS is_high_value,
       CASE WHEN value >= 150 THEN 'Mega'
            WHEN value >= 100 THEN 'Macro'
            WHEN value >= 50  THEN 'Mid'
            ELSE 'Micro' END AS value_tier
FROM events
""",
)
def p_clean_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 negative->NULL, P5 domain check, P6 blank->NULL, P9 derived
    boolean, P10 CASE tiering - one pass, all codegen'd."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        nullify_negative("value").alias("value_clean"),
        nullify_out_of_domain("event_type", EVENT_DOMAIN).alias("event_type_clean"),
        blank_to_null("props").alias("props_clean"),
        (F.col("value") > 100).alias("is_high_value"),
        tier("value", [(150, "Mega"), (100, "Macro"), (50, "Mid")], "Micro")
        .alias("value_tier"),
    )


@register(
    "p_clean_documents",
    oracle="""
SELECT doc_id,
       CASE WHEN LENGTH(lang) > 2 THEN NULL ELSE lang END AS lang_clean,
       LOWER(source) AS source_lower,
       LENGTH(text) AS text_len,
       n_chars > 300 AS is_long,
       SUBSTRING(text, 1, 200) AS text_preview
FROM documents
WHERE text IS NOT NULL AND TRIM(text) <> ''
""",
)
def p_clean_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 overlong->NULL, P6/P8 not-null filters, F6 preview, F7 case/len."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs
        .filter(F.col("text").isNotNull() & (F.trim("text") != ""))
        .select(
            "doc_id",
            nullify_overlong("lang", 2).alias("lang_clean"),
            F.lower("source").alias("source_lower"),
            F.length("text").alias("text_len"),
            (F.col("n_chars") > 300).alias("is_long"),
            preview("text", 200).alias("text_preview"),
        )
    )


@register(
    "f9_date_dimension",
    oracle="""
SELECT DISTINCT
       CAST(strftime(CAST(ts AS TIMESTAMP), '%Y%m%d') AS INT) AS date_key,
       CAST(CAST(ts AS TIMESTAMP) AS DATE) AS full_date,
       date_part('year', ts) AS year,
       date_part('quarter', ts) AS quarter,
       date_part('month', ts) AS month,
       monthname(CAST(ts AS TIMESTAMP)) AS month_name,
       weekofyear(CAST(ts AS TIMESTAMP)) AS week,
       date_part('day', ts) AS day_of_month,
       date_part('dow', ts) AS day_of_week,
       dayname(CAST(ts AS TIMESTAMP)) AS day_name,
       date_part('dow', ts) IN (0, 6) AS is_weekend
FROM events
ORDER BY date_key
""",
)
def f9_date_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dim_date build (F9/F10 + A4 DISTINCT), PG-compatible DOW/weekend."""
    events = load_table(spark, sf_dir, "events")
    attrs = calendar_attrs("ts")
    cols = [expr.alias(name) for name, expr in attrs.items()
            if name != "date_key"]
    return (
        events.select(attrs["date_key"].alias("date_key"), *cols)
        .distinct()
        .orderBy("date_key")
    )


@register(
    "q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag,
       l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
           AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))
                * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
       {sql_davg('l_quantity')} AS avg_qty,
       {sql_davg('l_extendedprice')} AS avg_price,
       {sql_davg('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive derived measures + safe casts + decimal-exact aggregates
    (F13/F15/F18, A3) in the TPC-H Q1 shape; filters push to the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    ext = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(ext * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(ext * (F.lit(1) - disc) * (F.lit(1) + tax)).cast("double")
            .alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "f11_user_activity_age",
    oracle=f"""
SELECT user_id,
       COUNT(*) AS event_count,
       CAST(CAST(epoch(TIMESTAMP '{RUN_TS}')
            - floor(epoch(MIN(CAST(ts AS TIMESTAMP)))) AS DOUBLE)
            / 86400.0 AS DOUBLE) AS days_since_first_seen,
       CAST(CAST(epoch(TIMESTAMP '{RUN_TS}')
            - floor(epoch(MAX(CAST(ts AS TIMESTAMP)))) AS DOUBLE)
            / 3600.0 AS DOUBLE) AS hours_since_last_seen,
       CASE WHEN COUNT(*) >= 100 THEN 'Mega'
            WHEN COUNT(*) >= 50  THEN 'Macro'
            WHEN COUNT(*) >= 20  THEN 'Mid'
            ELSE 'Micro' END AS activity_tier
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def f11_user_activity_age(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 epoch/interval arithmetic against a frozen run timestamp
    (reference computes account_age_days from CURRENT_TIMESTAMP,
    silver_etl.py:156-160; frozen here for oracle determinism) + P10 tier."""
    events = load_table(spark, sf_dir, "events")
    run_ts = F.lit(RUN_TS).cast("timestamp")
    cnt = F.count(F.lit(1))
    return (
        events.groupBy("user_id")
        .agg(
            cnt.alias("event_count"),
            ((F.unix_timestamp(run_ts) - F.unix_timestamp(F.min("ts")))
             .cast("double") / F.lit(86400.0)).alias("days_since_first_seen"),
            ((F.unix_timestamp(run_ts) - F.unix_timestamp(F.max("ts")))
             .cast("double") / F.lit(3600.0)).alias("hours_since_last_seen"),
            F.when(cnt >= 100, "Mega").when(cnt >= 50, "Macro")
            .when(cnt >= 20, "Mid").otherwise("Micro").alias("activity_tier"),
        )
        .orderBy("user_id")
    )


@register(
    "a8_null_profile",
    oracle="""
SELECT COUNT(*) AS row_count,
       COUNT(CASE WHEN event_id IS NULL THEN 1 END) AS event_id_nulls,
       COUNT(DISTINCT event_id) AS event_id_unique,
       COUNT(CASE WHEN ts IS NULL THEN 1 END) AS ts_nulls,
       COUNT(DISTINCT ts) AS ts_unique,
       COUNT(CASE WHEN user_id IS NULL THEN 1 END) AS user_id_nulls,
       COUNT(DISTINCT user_id) AS user_id_unique,
       COUNT(CASE WHEN event_type IS NULL THEN 1 END) AS event_type_nulls,
       COUNT(DISTINCT event_type) AS event_type_unique,
       COUNT(CASE WHEN value IS NULL THEN 1 END) AS value_nulls,
       COUNT(DISTINCT value) AS value_unique,
       COUNT(CASE WHEN props IS NULL THEN 1 END) AS props_nulls,
       COUNT(DISTINCT props) AS props_unique
FROM events
""",
)
def a8_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 data-profiling summary (null_count + n_unique per column)."""
    events = load_table(spark, sf_dir, "events")
    return null_profile(events)


@register(
    "p6_normalized_documents",
    oracle="""
SELECT doc_id,
       CASE WHEN TRIM(text) = '' THEN NULL ELSE text END AS text,
       CASE WHEN TRIM(lang) = '' THEN NULL ELSE lang END AS lang,
       CASE WHEN TRIM(source) = '' THEN NULL ELSE source END AS source,
       n_chars
FROM documents
""",
)
def p6_normalized_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 schema-driven blank->NULL over every string column."""
    docs = load_table(spark, sf_dir, "documents")
    return normalize_string_nulls(docs)


@register(
    "f12_engagement_ratio",
    oracle="""
WITH acct AS (
    SELECT user_id,
           COUNT(*) AS n_events,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS follows,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS engagement
    FROM events GROUP BY user_id
)
SELECT user_id, n_events, follows, engagement,
       CASE WHEN follows > 0 THEN engagement / follows
            ELSE 0.0 END AS engagement_ratio,
       engagement / NULLIF(follows, 0) AS engagement_ratio_nullif
FROM acct
ORDER BY user_id
""",
)
def f12_engagement_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 exact semantics (silver_etl.py:169-173): the reference's
    engagement_ratio yields 0 (NOT NULL) on a zero denominator - the
    when/otherwise form - while its SQL ratios use NULLIF -> NULL. Both
    variants side by side, since they differ and the difference is the
    documented behavior."""
    events = load_table(spark, sf_dir, "events")
    acct = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("follows"),
        dsum("value", "engagement"))
    return acct.select(
        "user_id", "n_events", "follows", "engagement",
        F.when(F.col("follows") > 0,
               F.col("engagement") / F.col("follows"))
        .otherwise(F.lit(0.0)).alias("engagement_ratio"),
        (F.col("engagement") / F.nullif(F.col("follows"), F.lit(0)))
        .alias("engagement_ratio_nullif"),
    ).orderBy("user_id")


@register(
    "dq_violation_summary",
    oracle="""
SELECT 'negative_value' AS rule,
       CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS violations,
       COUNT(*) AS total_rows
FROM events
UNION ALL
SELECT 'out_of_domain_event_type',
       CAST(SUM(CASE WHEN event_type NOT IN
                ('click','view','purchase','signup','error')
                THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(*)
FROM events
UNION ALL
SELECT 'null_or_nonpositive_user',
       CAST(SUM(CASE WHEN user_id IS NULL OR user_id <= 0
                THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(*)
FROM events
UNION ALL
SELECT 'empty_document_text',
       CAST(SUM(CASE WHEN TRIM(text) = '' OR text IS NULL
                THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(*)
FROM documents
ORDER BY rule
""",
)
def dq_violation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit: per-rule violation counts for exactly the
    rules the cleaning layer enforces (negative values -> NULL, domain
    validation, orphan users, empty documents) - the reference applies
    these fixes silently (transformer data-quality steps); a real
    pipeline also wants them COUNTED before fixing, as the
    reject-monitoring side channel. One pass per table via conditional
    aggregation (A9), unioned."""
    events = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")

    def rule(df, name, cond):
        return df.agg(
            F.lit(name).alias("rule"),
            F.sum(F.when(cond, 1).otherwise(0)).alias("violations"),
            F.count(F.lit(1)).alias("total_rows"))

    out = (
        rule(events, "negative_value", F.col("value") < 0)
        .unionByName(rule(
            events, "out_of_domain_event_type",
            ~F.col("event_type").isin(
                "click", "view", "purchase", "signup", "error")))
        .unionByName(rule(
            events, "null_or_nonpositive_user",
            F.col("user_id").isNull() | (F.col("user_id") <= 0)))
        .unionByName(rule(
            docs, "empty_document_text",
            F.col("text").isNull() | (F.trim("text") == "")))
    )
    return out.orderBy("rule")
