"""Planted-skew star-join evidence (VERDICT r4 #6): the J7/G-family
join path must survive a degenerate fact key. AQE's skew-join split
(spark.sql.adaptive.skewJoin, on in session.py's conf) is the mechanism
that keeps stragglers bounded at 100 TB - this test PLANTS >=50% of a
fact on one key, joins it to a dimension through the same
SortMergeJoin shape the star queries take (broadcast disabled to force
the shuffle path a 100 TB dim would take), and asserts both the plan
marker (skew=true) and the measured per-task balance via
spark_partition_id() row counts over the join output - the local
equivalent of "no task reads >2x the median partition".

A control run with skewJoin disabled proves the plant is real: the
degenerate key's rows land in ONE task-partition (>=40% of the fact).
"""

from __future__ import annotations

from contextlib import contextmanager
from statistics import median

from pyspark.sql import functions as F

N_FACT = 200_000
N_KEYS = 997  # non-skew keys; key 0 carries every even row (~50%)


@contextmanager
def _confs(spark, **kv):
    saved = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        saved[key] = spark.conf.get(key, None)
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, prior in saved.items():
            if prior is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prior)


def _skewed_star(spark):
    fact = (spark.range(N_FACT)
            .select(F.when(F.col("id") % 2 == 0, F.lit(0))
                    .otherwise(F.col("id") % N_KEYS + 1).alias("key"),
                    # ~50 shuffle bytes/row so the skewed partition
                    # clears the (lowered) skew threshold in BYTES.
                    F.md5(F.col("id").cast("string")).alias("payload")))
    dim = (spark.range(N_KEYS + 1)
           .select(F.col("id").alias("key"),
                   F.concat(F.lit("attr_"), F.col("id")).alias("attr")))
    return fact.join(dim, "key").select("key", "payload", "attr")


def _partition_rows(joined) -> tuple[list[int], str]:
    """(rows per join-output partition, AQE FINAL plan of that run).
    spark_partition_id() is evaluated on the join output before the
    counting shuffle, so each value counts one join task's rows. Two
    measurement traps, both hit while building this test: (a) the plan
    string must come from the EXECUTED DataFrame - AQE finalizes (and
    annotates skew=true) per execution, so .toString() off an
    uncollected plan says isFinalPlan=false; (b) the aggregate must
    TOUCH the wide columns (max(length(...))), else Catalyst prunes
    them down to the bare join key, whose constant-valued skewed
    partition then lz4-compresses below the skew threshold and the
    detector (correctly) sees no byte-skew to split."""
    counts = (joined.withColumn("pid", F.spark_partition_id())
              .groupBy("pid").agg(
                  F.count(F.lit(1)).alias("n"),
                  F.max(F.length("payload")).alias("_keep_payload"),
                  F.max(F.length("attr")).alias("_keep_attr")))
    sizes = [r["n"] for r in counts.collect()]
    plan = counts._jdf.queryExecution().executedPlan().toString()
    return sizes, plan


def test_aqe_skew_split_bounds_partition_sizes(spark):
    with _confs(
        spark,
        **{"spark.sql.autoBroadcastJoinThreshold": "-1",
           "spark.sql.adaptive.skewJoin.enabled": "true",
           "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
           "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
               "128k",
           "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128k"}):
        sizes, plan = _partition_rows(_skewed_star(spark))

    assert sum(sizes) == N_FACT
    assert "skew=true" in plan, plan[:2000]
    # The degenerate key (~100k rows) must have been split: no
    # post-split task-partition may dominate - the 2x-median bound the
    # 100 TB straggler budget asks for (floor guards tiny-partition
    # noise on the non-skew keys).
    med = median(sizes)
    assert max(sizes) <= max(2 * med, 4_000), (
        f"max {max(sizes)} vs median {med} over {len(sizes)} partitions")
    assert max(sizes) < 0.4 * N_FACT


def test_control_without_skew_split_has_straggler(spark):
    """Plant validity: with the skew handler OFF, the same join puts the
    degenerate key's entire ~50% of the fact into ONE task - the
    straggler the feature exists to prevent (and the reason the bound
    above is a real assertion, not vacuously true)."""
    with _confs(
        spark,
        **{"spark.sql.autoBroadcastJoinThreshold": "-1",
           "spark.sql.adaptive.skewJoin.enabled": "false",
           "spark.sql.adaptive.coalescePartitions.enabled": "false"}):
        sizes, _ = _partition_rows(_skewed_star(spark))

    assert sum(sizes) == N_FACT
    assert max(sizes) >= 0.4 * N_FACT, sizes
