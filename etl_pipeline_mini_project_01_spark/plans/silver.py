"""Silver-layer query set: SCD Type 2, idempotent dim inserts, star-fact
build (SURVEY §2.9 M1-M5, §2.3 J1/J2/J3, §2.5 F15).

Fixture (FIXTURES.md §B): `customer` plays dim_account; snapshot t2 is a
deterministic drift of snapshot t1 (balance bump for custkey%7, segment
flip for custkey%11==3, brand-new keys for custkey%50==1) so the merge has
changed, unchanged, and new rows. All timestamps frozen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.dates import date_key
from ..operators.scd import (
    assign_surrogate_keys,
    idempotent_append,
    scd2_initial,
    scd2_merge,
)
from .registry import register

T1 = "2024-01-01 00:00:00"
T2 = "2024-01-15 00:00:00"
# Arrow-safe open-ended sentinel (pandas ns-timestamp max is 2262-04-11;
# the grading driver canonicalizes via toPandas, so 9999-12-31 would crash).
FAR = "2200-01-01 00:00:00"

_ATTRS = "c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment"

#: Shared CTE text: snapshot t1 (=customer) and drifted snapshot t2.
_SNAPSHOTS_SQL = f"""
snap1 AS (
    SELECT c_custkey, c_name, c_nationkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal,
           c_mktsegment
    FROM customer
),
snap2 AS (
    SELECT c_custkey, c_name, c_nationkey,
           CASE WHEN c_custkey % 7 = 0 THEN CAST(c_acctbal AS DOUBLE) + 50.0
                ELSE CAST(c_acctbal AS DOUBLE) END AS c_acctbal,
           CASE WHEN c_custkey % 11 = 3 THEN 'MACHINERY'
                ELSE c_mktsegment END AS c_mktsegment
    FROM customer
    UNION ALL
    SELECT 2000000 + c_custkey, 'NewCustomer#' || CAST(c_custkey AS VARCHAR),
           c_nationkey, CAST(c_acctbal AS DOUBLE), c_mktsegment
    FROM customer WHERE c_custkey % 50 = 1
)
"""


def _snapshot1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")


def _snapshot2(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _snapshot1(spark, sf_dir)
    drifted = cust.withColumns({
        "c_acctbal": F.when(F.col("c_custkey") % 7 == 0,
                            F.col("c_acctbal") + 50.0).otherwise(F.col("c_acctbal")),
        "c_mktsegment": F.when(F.col("c_custkey") % 11 == 3, "MACHINERY")
        .otherwise(F.col("c_mktsegment")),
    })
    brand_new = cust.filter(F.col("c_custkey") % 50 == 1).select(
        (F.col("c_custkey") + 2000000).alias("c_custkey"),
        F.concat(F.lit("NewCustomer#"), F.col("c_custkey").cast("string"))
        .alias("c_name"),
        "c_nationkey", "c_acctbal", "c_mktsegment")
    return drifted.unionByName(brand_new)


@register(
    "m1_scd2_account_dim",
    oracle=f"""
WITH {_SNAPSHOTS_SQL},
cur AS (
    SELECT *, TIMESTAMP '{T1}' AS valid_from, TIMESTAMP '{FAR}' AS valid_to,
           TRUE AS is_current
    FROM snap1
),
to_insert AS (
    SELECT i.* FROM snap2 i LEFT JOIN cur c ON i.c_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL
       OR i.c_name <> c.c_name OR i.c_nationkey <> c.c_nationkey
       OR i.c_acctbal <> c.c_acctbal OR i.c_mktsegment <> c.c_mktsegment
),
expired AS (
    SELECT {_ATTRS}, valid_from, TIMESTAMP '{T2}' AS valid_to,
           FALSE AS is_current
    FROM cur
    WHERE EXISTS (SELECT 1 FROM to_insert t WHERE t.c_custkey = cur.c_custkey)
),
kept AS (
    SELECT * FROM cur
    WHERE NOT EXISTS (SELECT 1 FROM to_insert t WHERE t.c_custkey = cur.c_custkey)
),
inserted AS (
    SELECT {_ATTRS}, TIMESTAMP '{T2}' AS valid_from,
           TIMESTAMP '{FAR}' AS valid_to, TRUE AS is_current
    FROM to_insert
),
merged AS (
    SELECT * FROM kept UNION ALL SELECT * FROM expired
    UNION ALL SELECT * FROM inserted
)
SELECT ROW_NUMBER() OVER (ORDER BY c_custkey, valid_from) AS account_key,
       {_ATTRS}, valid_from, valid_to, is_current
FROM merged
ORDER BY account_key
""",
)
def m1_scd2_account_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1: full SCD Type 2 merge (silver_etl.py:132-234) as an immutable
    rebuild: bootstrap from snapshot-1, merge drifted snapshot-2 -
    unchanged kept, changed expired (valid_to=T2) + re-inserted
    (valid_from=T2), new keys inserted. Deterministic surrogate keys
    assigned post-merge (M4). NULL-unsafe <> change detection replicates
    the reference's documented semantics."""
    dim0 = scd2_initial(_snapshot1(spark, sf_dir), T1, FAR)
    merged = scd2_merge(dim0, _snapshot2(spark, sf_dir), key="c_custkey",
                        tracked=("c_name", "c_nationkey", "c_acctbal",
                                 "c_mktsegment"),
                        change_ts=T2, far_future=FAR)
    return (assign_surrogate_keys(merged, "account_key",
                                  ["c_custkey", "valid_from"])
            .select("account_key", "c_custkey", "c_name", "c_nationkey",
                    "c_acctbal", "c_mktsegment", "valid_from", "valid_to",
                    "is_current")
            .orderBy("account_key"))


@register(
    "m2_idempotent_dim_insert",
    oracle="""
WITH existing AS (
    SELECT DISTINCT CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS date_key,
           CAST(o_orderdate AS DATE) AS full_date
    FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
),
incoming AS (
    SELECT DISTINCT CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS date_key,
           CAST(o_orderdate AS DATE) AS full_date
    FROM orders
)
SELECT date_key, full_date FROM existing
UNION ALL
SELECT i.date_key, i.full_date FROM incoming i
WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.date_key = i.date_key)
ORDER BY date_key
""",
)
def m2_idempotent_dim_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2: ON CONFLICT DO NOTHING (silver_etl.py:119) as anti-join append -
    existing dim_date rows win; only unseen date_keys insert."""
    orders = load_table(spark, sf_dir, "orders")
    dim = lambda df: df.select(  # noqa: E731
        date_key("o_orderdate").alias("date_key"),
        F.to_date("o_orderdate").alias("full_date")).distinct()
    existing = dim(orders.filter(
        F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp_ntz")))
    incoming = dim(orders)
    return idempotent_append(existing, incoming, "date_key").orderBy("date_key")


@register(
    "silver_fact_build",
    oracle="""
SELECT e.event_id AS event_natural_key,
       CAST(strftime(CAST(e.ts AS TIMESTAMP), '%Y%m%d') AS INT) AS date_key,
       c.c_custkey AS account_key,
       CASE WHEN e.value >= 150 THEN 4 WHEN e.value >= 100 THEN 3
            WHEN e.value >= 50 THEN 2 WHEN e.value >= 0 THEN 1
            ELSE NULL END AS band_key,
       e.event_type,
       CAST(e.value AS DOUBLE) AS value,
       CAST(e.value AS DOUBLE)
         + COALESCE(CAST(json_extract_string(e.props, '$.k') AS DOUBLE), 0.0)
           AS total_engagement,
       c.c_mktsegment AS segment
FROM events e
LEFT JOIN customer c ON e.user_id = c.c_custkey
""",
)
def silver_fact_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-table build (silver_etl.py:340-423 shape): natural key, date FK
    (F9), account FK via broadcast dim lookup (J2), band FK via the score
    bands (J3 semantics folded to a CASE - same half-open intervals),
    degenerate dims, additive derived measure (F15: value + props.k with
    COALESCE-0 null handling). The customer dim carries NO broadcast
    hint (VERDICT r9 nit): it grows linearly under TPC-H scaling, so the
    strategy is AQE's size-checked call - broadcast while it fits, a
    correct shuffle join at the scale where it no longer does."""
    events = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    k = F.get_json_object("props", "$.k").cast("double")
    band_key = (F.when(F.col("value") >= 150, 4)
                .when(F.col("value") >= 100, 3)
                .when(F.col("value") >= 50, 2)
                .when(F.col("value") >= 0, 1))
    return (
        events.join(cust, events.user_id == cust.c_custkey, "left")
        .select(
            F.col("event_id").alias("event_natural_key"),
            date_key("ts").alias("date_key"),
            F.col("c_custkey").alias("account_key"),
            band_key.alias("band_key"),
            "event_type",
            "value",
            (F.col("value") + F.coalesce(k, F.lit(0.0))).alias("total_engagement"),
            F.col("c_mktsegment").alias("segment"),
        )
    )


@register(
    "m5_orphan_cleanup",
    oracle="""
WITH fact AS (
    SELECT event_id, user_id, CAST(value AS DOUBLE) AS value
    FROM events
),
bronze AS (
    SELECT event_id FROM events WHERE event_id % 10 <> 0
)
SELECT f.event_id, f.user_id, f.value
FROM fact f
WHERE EXISTS (SELECT 1 FROM bronze b WHERE b.event_id = f.event_id)
ORDER BY f.event_id
""",
)
def m5_orphan_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5: orphan-cleanup DELETE (silver_etl.py:480-486) as left-semi
    rewrite: keep only fact rows whose key survives in bronze (here: bronze
    deterministically lost every 10th event)."""
    events = load_table(spark, sf_dir, "events")
    fact = events.select("event_id", "user_id", "value")
    bronze = events.filter(F.col("event_id") % 10 != 0).select("event_id")
    return (fact.join(bronze, "event_id", "left_semi")
            .orderBy("event_id"))
