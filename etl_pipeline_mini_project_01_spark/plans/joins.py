"""Join query set (SURVEY §2.3 J1-J7).

The reference's joins are all dimension lookups around one fact table
(star schema, silver_etl.py:385-395; gold/02 views) plus existence checks.
Spark-first notes:
  * every dim here is small -> broadcast-hash (verified via .explain in
    tests); only the fact side shuffles, and only when an aggregation
    follows;
  * the band join (J3) keeps its equi-part (model/type) as the hash key and
    evaluates the range as a post-join filter - exactly how Catalyst plans
    mixed equi/non-equi conditions;
  * anti/semi joins replace NOT EXISTS / IN-subquery (J4-J6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .parity import DEC, sql_dsum
from .registry import register

#: J3 fixture: score-band dimension (reference dim_sentiment's
#: score_min/score_max bands, silver/02:119-144). Literal, broadcast.
VALUE_BANDS: tuple[tuple[str, float, float], ...] = (
    ("low", 0.0, 50.0),
    ("mid", 50.0, 100.0),
    ("high", 100.0, 150.0),
    ("extreme", 150.0, 1e18),
)
_BANDS_SQL = "(VALUES " + ", ".join(
    f"('{n}', CAST({lo} AS DOUBLE), CAST({hi} AS DOUBLE))"
    for n, lo, hi in VALUE_BANDS) + ") AS bands(band_name, score_min, score_max)"


def _bands_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        list(VALUE_BANDS), "band_name string, score_min double, score_max double")


@register(
    "j7_star_join_region_revenue",
    oracle=f"""
SELECT r.r_name AS region_name,
       n.n_name AS nation_name,
       COUNT(*) AS line_count,
       COUNT(DISTINCT o.o_orderkey) AS order_count,
       COUNT(DISTINCT c.c_custkey) AS customer_count,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
           AS revenue,
       {sql_dsum('l.l_quantity')} AS total_qty
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
ORDER BY region_name, nation_name
""",
)
def j7_star_join_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: 5-way star join (fact -> orders -> customer -> nation -> region,
    the gold-view join shape). customer/nation/region broadcast.

    Two-level aggregation: lineitem first collapses to ORDER granularity
    (groupBy l_orderkey with map-side partial combine - the same orderkey
    shuffle the join would need anyway, but ~4x fewer rows come out of the
    exchange), then the dims join at order grain. That also turns
    COUNT(DISTINCT o_orderkey) into a plain COUNT(*) (each row IS one
    order), so the final agg carries ONE distinct (c_custkey) instead of
    two - Expand replicates x2 over ~N/4 rows instead of x3 over N.
    Decimal partial sums keep revenue/qty order-insensitive and exactly
    equal to the single-pass formulation."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey",
                                                        "o_custkey")
    # customer: NO hint (VERDICT r9 nit - it scales linearly; AQE
    # broadcasts it while small, degrades to a shuffle join at 100x).
    # nation/region keep theirs: genuinely constant-sized (25/5 rows).
    cust = (load_table(spark, sf_dir, "customer")
            .select("c_custkey", "c_nationkey"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    revenue = (F.col("l_extendedprice").cast("decimal(18,2)")
               * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)")))
    per_order = (li.groupBy("l_orderkey")
                 .agg(F.count(F.lit(1)).alias("_lines"),
                      F.sum(revenue).alias("_rev"),
                      F.sum(F.col("l_quantity").cast(DEC)).alias("_qty")))
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"),
                 F.col("n_name").alias("nation_name"))
        .agg(
            F.sum("_lines").alias("line_count"),
            F.count(F.lit(1)).alias("order_count"),
            F.countDistinct("c_custkey").alias("customer_count"),
            F.sum("_rev").cast("double").alias("revenue"),
            F.sum("_qty").cast("double").alias("total_qty"),
        )
        .orderBy("region_name", "nation_name")
    )


@register(
    "j3_band_join",
    oracle=f"""
SELECT e.event_id, e.event_type, CAST(e.value AS DOUBLE) AS value,
       bands.band_name
FROM events e
LEFT JOIN {_BANDS_SQL}
  ON e.value >= bands.score_min AND e.value < bands.score_max
""",
)
def j3_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: theta/band join against the score-band dim (silver_etl.py:
    390-395: score >= score_min AND score < score_max). The dim is
    broadcast, so the range predicate is a per-row scan of 4 rows - no
    shuffle, no cartesian blowup. Edge semantics preserved: value exactly
    at a band's max falls in the NEXT band (half-open intervals)."""
    events = load_table(spark, sf_dir, "events")
    bands = F.broadcast(_bands_df(spark))
    return (
        events.join(
            bands,
            (events.value >= bands.score_min) & (events.value < bands.score_max),
            "left")
        .select("event_id", "event_type", "value", "band_name")
    )


@register(
    "j1_change_detection",
    oracle="""
WITH current AS (
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer
),
incoming AS (
    SELECT c_custkey, c_name, c_nationkey,
           CASE WHEN c_custkey % 5 = 0
                THEN CAST(c_acctbal AS DOUBLE) + 100.0
                ELSE CAST(c_acctbal AS DOUBLE) END AS c_acctbal,
           c_mktsegment
    FROM customer WHERE c_custkey % 2 = 0
    UNION ALL
    SELECT 1000000 + c_custkey, 'NewCustomer#' || CAST(c_custkey AS VARCHAR),
           c_nationkey, CAST(c_acctbal AS DOUBLE), c_mktsegment
    FROM customer WHERE c_custkey % 100 = 7
)
SELECT i.c_custkey,
       CASE WHEN c.c_custkey IS NULL THEN 'new' ELSE 'changed' END AS change_type,
       i.c_acctbal AS new_acctbal,
       c.c_acctbal AS old_acctbal
FROM incoming i
LEFT JOIN current c ON i.c_custkey = c.c_custkey
WHERE c.c_custkey IS NULL OR i.c_acctbal <> c.c_acctbal
ORDER BY i.c_custkey
""",
)
def j1_change_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: SCD change detection - left join incoming snapshot to current
    dim, keep rows that are new OR have a changed tracked attribute
    (silver_etl.py:186-196). NULL-attribute semantics replicated: <> on
    NULL is UNKNOWN -> not detected (documented reference behavior).
    Incoming snapshot is synthesized deterministically: half the customers
    re-arrive, every 5th with a drifted balance, plus a few brand-new keys."""
    cust = load_table(spark, sf_dir, "customer")
    current = cust.select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
                          "c_mktsegment")
    returning = (cust.filter(F.col("c_custkey") % 2 == 0)
                 .withColumn("c_acctbal",
                             F.when(F.col("c_custkey") % 5 == 0,
                                    F.col("c_acctbal") + 100.0)
                             .otherwise(F.col("c_acctbal"))))
    brand_new = (cust.filter(F.col("c_custkey") % 100 == 7)
                 .select((F.col("c_custkey") + 1000000).alias("c_custkey"),
                         F.concat(F.lit("NewCustomer#"),
                                  F.col("c_custkey").cast("string")).alias("c_name"),
                         "c_nationkey", "c_acctbal", "c_mktsegment"))
    incoming = returning.unionByName(brand_new)
    # No broadcast hint: `current` derives from the full customer table
    # and GROWS with the corpus - a hint overrides AQE's size check and
    # is an OOM-by-construction at 100x (the last survivor of the r10
    # forced-broadcast sweep; plan-guarded in test_plan_properties'
    # test_no_forced_bigside_broadcast). AQE still broadcasts it at
    # small SF via the runtime size check.
    cur = current.select(F.col("c_custkey").alias("cur_key"),
                         F.col("c_acctbal").alias("old_acctbal"))
    return (
        incoming.join(cur, incoming.c_custkey == cur.cur_key, "left")
        .filter(F.col("cur_key").isNull()
                | (F.col("c_acctbal") != F.col("old_acctbal")))
        .select(
            "c_custkey",
            F.when(F.col("cur_key").isNull(), "new").otherwise("changed")
            .alias("change_type"),
            F.col("c_acctbal").alias("new_acctbal"),
            "old_acctbal",
        )
        .orderBy("c_custkey")
    )


@register(
    "j4_anti_join_missing_fk",
    oracle="""
SELECT e.user_id, COUNT(*) AS orphan_events
FROM events e
WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id
                  AND c.c_mktsegment = 'BUILDING')
GROUP BY e.user_id
ORDER BY e.user_id
""",
)
def j4_anti_join_missing_fk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: referential-integrity anti-join (silver_etl.py:452-459 missing-FK
    validation): events whose user has no BUILDING-segment customer row.
    No hint on the (customer-scaled) build side - AQE size-checks it."""
    events = load_table(spark, sf_dir, "events")
    dim = (load_table(spark, sf_dir, "customer")
           .filter(F.col("c_mktsegment") == "BUILDING")
           .select("c_custkey"))
    return (
        events.join(dim, events.user_id == dim.c_custkey, "left_anti")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("orphan_events"))
        .orderBy("user_id")
    )


@register(
    "j5_semi_join_cleanup",
    oracle="""
SELECT o.o_orderkey, o.o_custkey, CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
ORDER BY o.o_orderkey
""",
)
def j5_semi_join_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5/J6: left-semi join = EXISTS/IN-subquery rewrite (the reference's
    orphan-cleanup DELETE keeps rows whose key survives in the source,
    silver_etl.py:480-486): orders that still have returned lines."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


@register(
    "j2_dimension_lookup",
    oracle="""
SELECT e.event_id, e.user_id, e.event_type,
       c.c_name AS customer_name,
       c.c_mktsegment AS segment,
       n.n_name AS nation_name
FROM events e
LEFT JOIN customer c ON e.user_id = c.c_custkey
LEFT JOIN nation n   ON c.c_nationkey = n.n_nationkey
""",
)
def j2_dimension_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: chained left dimension lookups on the fact (silver_etl.py:
    385-395). nation keeps its broadcast hint (constant 25 rows);
    customer does NOT (VERDICT r9 nit - linear growth): AQE broadcasts
    it while it fits, so the fact still avoids a shuffle at dim sizes
    where that is actually safe."""
    events = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        events.join(cust, events.user_id == cust.c_custkey, "left")
        .join(nation, cust.c_nationkey == nation.n_nationkey, "left")
        .select("event_id", "user_id", "event_type",
                F.col("c_name").alias("customer_name"),
                F.col("c_mktsegment").alias("segment"),
                F.col("n_name").alias("nation_name"))
    )


@register(
    "skew_salted_aggregate",
    oracle=f"""
SELECT event_type,
       COUNT(*) AS n,
       {sql_dsum('value')} AS total,
       {sql_dsum('value')} / COUNT(*) AS avg_value
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def skew_salted_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation (operators/skew.py): event_type is
    the hot low-cardinality key (5 values x N rows - the worst case for a
    direct groupBy at scale); salting spreads each key over 8 partial
    groups, the final merge is 40 rows. Oracle = the direct groupBy:
    decimal sums make the two-phase result bit-identical."""
    from ..operators.skew import salted_sum_count
    events = load_table(spark, sf_dir, "events")
    return (salted_sum_count(events, "event_type", "value", salt_buckets=8)
            .orderBy("event_type"))
