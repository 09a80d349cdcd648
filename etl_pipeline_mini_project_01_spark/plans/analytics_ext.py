"""Analytics extensions beyond the reference's aggregate inventory:
exact quantiles (interpolated percentile - bit-identical between Spark's
`percentile` and DuckDB's `quantile_cont`, both linear interpolation
over the sorted group) and RANGE-framed rolling windows (a true
event-time sliding frame, not a row-count frame).

Scale notes: exact percentile sorts within each group - right for
bounded group counts (per event_type here); for raw 100 TB columns the
drop-in is `approx_percentile` (t-digest sketch, no global sort), same
call-site shape as the exact/approx count-distinct pair (a11)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .parity import DEC, dsum, sql_dsum
from .registry import register


@register(
    "stats_value_quantiles",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       quantile_cont(value, 0.25) AS p25,
       quantile_cont(value, 0.50) AS p50,
       quantile_cont(value, 0.75) AS p75,
       quantile_cont(value, 0.95) AS p95
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def stats_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per event_type. Both engines compute
    lower + f*(upper-lower) at rank p*(n-1) over the sorted group, so
    doubles match bit-for-bit (verified empirically before registering)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.percentile("value", F.lit(0.25)).alias("p25"),
             F.percentile("value", F.lit(0.50)).alias("p50"),
             F.percentile("value", F.lit(0.75)).alias("p75"),
             F.percentile("value", F.lit(0.95)).alias("p95"))
        .orderBy("event_type")
    )


@register(
    "stats_quantile_sketch",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       quantile_cont(value, 0.50) AS p50_exact,
       quantile_cont(value, 0.95) AS p95_exact,
       TRUE AS sketch_within_band
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def stats_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB variant of exact quantiles (the `stats_value_quantiles`
    scale note made executable): `approx_percentile` builds a mergeable
    Greenwald-Khanna sketch in ONE pass with map-side partial merge - no
    per-group sort, bounded memory - where exact interpolated percentile
    must buffer the group. Sketch VALUES are merge-order-specific by
    nature, so (same contract as a11_approx_distinct) the checked surface
    emits the exact p50/p95 plus a boolean verdict that each sketch
    quantile lands inside the exact +/-1%-RANK band (exact percentiles at
    p+/-0.01; GK accuracy 10000 guarantees rank error <= 0.0001, so the
    band has 100x slack) - hash-checkable evidence of the accuracy
    contract without hashing sketch noise (oracle = exact + literal TRUE)."""
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile("value", F.lit(0.50)).alias("p50_exact"),
        F.percentile("value", F.lit(0.95)).alias("p95_exact"),
        F.percentile("value", F.lit(0.49)).alias("_p50_lo"),
        F.percentile("value", F.lit(0.51)).alias("_p50_hi"),
        F.percentile("value", F.lit(0.94)).alias("_p95_lo"),
        F.percentile("value", F.lit(0.96)).alias("_p95_hi"),
        F.approx_percentile("value", F.lit(0.50), F.lit(10000))
        .alias("_p50_sk"),
        F.approx_percentile("value", F.lit(0.95), F.lit(10000))
        .alias("_p95_sk"),
    )
    in_band = (F.col("_p50_sk").between(F.col("_p50_lo"), F.col("_p50_hi"))
               & F.col("_p95_sk").between(F.col("_p95_lo"),
                                          F.col("_p95_hi")))
    return (agg.select("event_type", "n", "p50_exact", "p95_exact",
                       in_band.alias("sketch_within_band"))
            .orderBy("event_type"))


@register(
    "rolling_7day_user_value",
    oracle="""
WITH daily AS (
    SELECT user_id,
           CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
           date_diff('day', DATE '1970-01-01',
                     CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS day_no,
           SUM(CAST(value AS DECIMAL(18,4))) AS daily_dec
    FROM events
    GROUP BY 1, 2, 3
)
SELECT user_id, d,
       CAST(daily_dec AS DOUBLE) AS daily_value,
       CAST(SUM(daily_dec) OVER (
           PARTITION BY user_id ORDER BY day_no
           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS rolling_7d_value,
       CAST(COUNT(*) OVER (
           PARTITION BY user_id ORDER BY day_no
           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
           AS active_days_in_window
FROM daily
ORDER BY user_id, d
""",
)
def rolling_7day_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed rolling 7-day engagement per user: daily decimal
    totals, then a calendar-day range frame (gaps count - an absent day
    still ages out of the window, which a ROWS frame gets wrong).
    One shuffle on user_id; frame arithmetic is per-partition."""
    events = load_table(spark, sf_dir, "events")
    daily = (events
             .groupBy("user_id",
                      F.to_date("ts").alias("d"),
                      F.datediff(F.to_date("ts"),
                                 F.lit("1970-01-01").cast("date"))
                      .alias("day_no"))
             .agg(F.sum(F.col("value").cast(DEC)).alias("daily_dec")))
    w = (Window.partitionBy("user_id").orderBy("day_no")
         .rangeBetween(-6, Window.currentRow))
    return (daily.select(
        "user_id", "d",
        F.col("daily_dec").cast("double").alias("daily_value"),
        F.sum("daily_dec").over(w).cast("double").alias("rolling_7d_value"),
        F.count(F.lit(1)).over(w).alias("active_days_in_window"))
        .orderBy("user_id", "d"))


@register(
    "w_rank_family",
    oracle=f"""
WITH totals AS (
    SELECT event_type, user_id,
           {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY event_type, user_id
)
SELECT event_type, user_id, total_value,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS dense_rnk,
       CAST(PERCENT_RANK() OVER w AS DOUBLE) AS pct_rank,
       CAST(CUME_DIST() OVER w AS DOUBLE) AS cume,
       CAST(NTILE(4) OVER w AS INT) AS quartile
FROM totals
WINDOW w AS (PARTITION BY event_type
             ORDER BY total_value DESC, user_id)
ORDER BY event_type, rnk, user_id
""",
)
def w_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete rank-function family (W1 deepened): rank, dense_rank,
    percent_rank, cume_dist, ntile(4) over per-type user totals, with an
    explicit tie-break so every engine orders identically. percent_rank =
    (rank-1)/(n-1) and cume_dist = rank_hi/n are identical IEEE divisions
    in both engines."""
    events = load_table(spark, sf_dir, "events")
    totals = (events.groupBy("event_type", "user_id")
              .agg(dsum("value", "total_value")))
    w = Window.partitionBy("event_type").orderBy(
        F.desc("total_value"), "user_id")
    return (totals.select(
        "event_type", "user_id", "total_value",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("dense_rnk"),
        F.percent_rank().over(w).cast("double").alias("pct_rank"),
        F.cume_dist().over(w).cast("double").alias("cume"),
        F.ntile(4).over(w).alias("quartile"))
        .orderBy("event_type", "rnk", "user_id"))


@register(
    "topk_per_group_docs",
    oracle="""
SELECT lang, doc_id, n_chars, rn
FROM (
    SELECT lang, doc_id, n_chars,
           ROW_NUMBER() OVER (PARTITION BY lang
                              ORDER BY n_chars DESC, doc_id) AS rn
    FROM documents
)
WHERE rn <= 3
ORDER BY lang, rn
""",
)
def topk_per_group_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 longest documents per language: the per-group top-k shape.
    Catalyst compiles the rank-filter into WindowGroupLimit (partial
    per-partition top-k BEFORE the shuffle, then final top-k) - the
    distributed heap optimization that makes per-group top-k scale
    without sorting whole partitions; asserted in plan guards."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), "doc_id")
    return (docs.select("lang", "doc_id", "n_chars",
                        F.row_number().over(w).alias("rn"))
            .filter(F.col("rn") <= 3)
            .orderBy("lang", "rn"))


@register(
    "stats_moments",
    oracle="""
WITH m AS (
    SELECT event_type,
           COUNT(*) AS n,
           SUM(CAST(value AS DECIMAL(18,4))) AS sx,
           SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4)))
               AS sx2,
           SUM(CAST(date_part('hour', ts) AS DECIMAL(18,4))) AS sy,
           SUM(CAST(date_part('hour', ts) AS DECIMAL(18,4))
               * CAST(date_part('hour', ts) AS DECIMAL(18,4))) AS sy2,
           SUM(CAST(value AS DECIMAL(18,4))
               * CAST(date_part('hour', ts) AS DECIMAL(18,4))) AS sxy
    FROM events
    GROUP BY event_type
)
SELECT event_type, n,
       CAST(sx AS DOUBLE) / n AS mean_value,
       (CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
           / (n - 1) AS var_value,
       sqrt((CAST(sx2 AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1))
           AS stddev_value,
       (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
         / sqrt((CAST(sx2 AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                * (CAST(sy2 AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n))
           AS corr_value_hour
FROM m
ORDER BY event_type
""",
)
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic second moments: variance/stddev/correlation from
    EXACT decimal sums (sum x, x^2, y, y^2, xy as decimals - order-
    insensitive), then identical IEEE double expressions on both engines.
    Spark's built-in stddev/corr merge float partials in partition order
    and are NOT cross-engine reproducible; this is the parity-safe form
    (and the classic map-side-combinable moments trick: one shuffle of
    5 numbers per group, however large the group)."""
    events = load_table(spark, sf_dir, "events")
    x = F.col("value").cast(DEC)
    y = F.hour("ts").cast(DEC)
    m = (events.groupBy("event_type")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(x).alias("sx"), F.sum(x * x).alias("sx2"),
              F.sum(y).alias("sy"), F.sum(y * y).alias("sy2"),
              F.sum(x * y).alias("sxy")))
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sx2 = F.col("sx2").cast("double")
    sy = F.col("sy").cast("double")
    sy2 = F.col("sy2").cast("double")
    sxy = F.col("sxy").cast("double")
    var_num = sx2 - sx * sx / n
    vary_num = sy2 - sy * sy / n
    return (m.select(
        "event_type", "n",
        (sx / n).alias("mean_value"),
        (var_num / (n - 1)).alias("var_value"),
        F.sqrt(var_num / (n - 1)).alias("stddev_value"),
        ((sxy - sx * sy / n) / F.sqrt(var_num * vary_num))
        .alias("corr_value_hour"))
        .orderBy("event_type"))
