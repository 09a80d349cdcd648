"""SCALE_CURVE series for the silver/SCD2 star-build family (VERDICT
r11 #8: the one flagship family without its own curve).

Mirrors the m1_scd2_account_dim + silver_fact_build shapes on
synthesized inputs scaled 10x/100x/300x (same multipliers as the other
series, events-per-customer held at the harness ratio):

  * SCD2 MERGE: snapshot-1 bootstrap, drifted snapshot-2 (1/7 balance
    drift + 1/11 segment drift + 1/50 brand-new keys), scd2_merge +
    deterministic surrogate keys. The surrogate window is a documented
    GLOBAL single-partition sort - fine for bounded-cardinality dims,
    and this series is the measurement that claim rides on.
  * FACT BUILD: events left-join the dim (no broadcast hint - AQE's
    size-checked call), band CASE, JSON-extract derived measure -
    consumed via a noop write (nothing lands on the driver).

Usage: python tools/silver_scd_curve.py [out.json]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from etl_pipeline_mini_project_01_spark.operators.scd import (  # noqa: E402
    assign_surrogate_keys,
    scd2_initial,
    scd2_merge,
)
from etl_pipeline_mini_project_01_spark.session import get_spark  # noqa: E402

#: (customers, events) per point - the sf0.1 harness ratio is ~1:40
POINTS = {"10x": (1_500, 60_000), "100x": (15_000, 600_000),
          "300x": (45_000, 1_800_000)}
T1, T2 = "2024-01-01 00:00:00", "2024-01-15 00:00:00"


def _wall(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def _consume(df) -> int:
    from pyspark.sql import Observation

    obs = Observation()
    (df.observe(obs, F.count(F.lit(1)).alias("rows"))
       .write.format("noop").mode("overwrite").save())
    return int(obs.get["rows"])


def _snap1(spark, n):
    return (spark.range(n)
            .select(F.col("id").alias("c_custkey"),
                    F.concat(F.lit("Customer#"), F.col("id").cast("string"))
                    .alias("c_name"),
                    (F.col("id") % 25).cast("int").alias("c_nationkey"),
                    (F.col("id") % 10_000).cast("double").alias("c_acctbal"),
                    F.element_at(F.array(F.lit("BUILDING"), F.lit("AUTOMOBILE"),
                                         F.lit("MACHINERY"), F.lit("HOUSEHOLD"),
                                         F.lit("FURNITURE")),
                                 (F.col("id") % 5 + 1).cast("int"))
                    .alias("c_mktsegment")))


def _snap2(spark, n):
    cust = _snap1(spark, n)
    drifted = cust.withColumns({
        "c_acctbal": F.when(F.col("c_custkey") % 7 == 0,
                            F.col("c_acctbal") + 50.0)
        .otherwise(F.col("c_acctbal")),
        "c_mktsegment": F.when(F.col("c_custkey") % 11 == 3, "MACHINERY")
        .otherwise(F.col("c_mktsegment"))})
    new = cust.filter(F.col("c_custkey") % 50 == 1).select(
        (F.col("c_custkey") + 2_000_000).alias("c_custkey"),
        F.concat(F.lit("New#"), F.col("c_custkey").cast("string"))
        .alias("c_name"),
        "c_nationkey", "c_acctbal", "c_mktsegment")
    return drifted.unionByName(new)


def _events(spark, m, n_cust):
    return (spark.range(m)
            .select(F.col("id").alias("event_id"),
                    (F.col("id") % n_cust).alias("user_id"),
                    F.timestamp_micros(
                        (F.lit(1_704_067_200_000_000)
                         + F.col("id") * 60_000_000).cast("bigint"))
                    .alias("ts"),
                    F.element_at(F.array(F.lit("view"), F.lit("click"),
                                         F.lit("share")),
                                 (F.col("id") % 3 + 1).cast("int"))
                    .alias("event_type"),
                    ((F.col("id") * 37) % 200).cast("double").alias("value"),
                    F.concat(F.lit('{"k": '),
                             ((F.col("id") % 13)).cast("string"),
                             F.lit("}")).alias("props")))


def main() -> None:
    spark = get_spark("silver-scd-curve")
    out: dict[str, dict] = {}
    for label, (n_cust, n_ev) in POINTS.items():
        dim0 = scd2_initial(_snap1(spark, n_cust), T1)
        snap2 = _snap2(spark, n_cust)

        merged_rows = {}

        def _merge():
            merged = scd2_merge(dim0, snap2, key="c_custkey",
                                tracked=("c_name", "c_nationkey",
                                         "c_acctbal", "c_mktsegment"),
                                change_ts=T2)
            dim = assign_surrogate_keys(merged, "account_key",
                                        ["c_custkey", "valid_from"])
            merged_rows["n"] = _consume(dim)

        events = _events(spark, n_ev, n_cust)
        cur = (scd2_merge(dim0, snap2, key="c_custkey",
                          tracked=("c_name", "c_nationkey", "c_acctbal",
                                   "c_mktsegment"), change_ts=T2)
               .filter(F.col("is_current")))
        k = F.get_json_object("props", "$.k").cast("double")
        band = (F.when(F.col("value") >= 150, 4)
                .when(F.col("value") >= 100, 3)
                .when(F.col("value") >= 50, 2)
                .when(F.col("value") >= 0, 1))
        fact = (events.join(cur, events.user_id == cur.c_custkey, "left")
                .select(F.col("event_id").alias("event_natural_key"),
                        F.date_format("ts", "yyyyMMdd").cast("int")
                        .alias("date_key"),
                        F.col("c_custkey").alias("account_key"),
                        band.alias("band_key"), "event_type", "value",
                        (F.col("value") + F.coalesce(k, F.lit(0.0)))
                        .alias("total_engagement"),
                        F.col("c_mktsegment").alias("segment")))

        fact_rows = {}

        def _fact():
            fact_rows["n"] = _consume(fact)

        _merge(), _fact()                    # warm-up pass (codegen)
        out[label] = {
            "customers": n_cust, "events": n_ev,
            "scd2_merge_surrogate_sec": _wall(_merge),
            "dim_rows_out": merged_rows["n"],
            "fact_build_sec": _wall(_fact),
            "fact_rows_out": fact_rows["n"],
        }
        print(label, json.dumps(out[label]), flush=True)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
