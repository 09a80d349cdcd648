"""Custom stateful streaming operator: per-user running engagement totals
via applyInPandasWithState (north-star: stateful ops Spark's built-in
window aggregations can't express - running state carried across
micro-batches with explicit timeout control).

State design: one row of (n_events, total_value) per user key, updated
per micro-batch; at scale state lives in the per-partition state store
(RocksDB on a real cluster), keyed by the shuffle hash of user_id.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from .windows import read_events_stream

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])

STATE_SCHEMA = StructType([
    StructField("n_events", LongType()),
    StructField("total_e4", LongType()),
])


def _update_user_totals(key: tuple[Any, ...],
                        pdfs: Iterator[pd.DataFrame],
                        state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n_events, total_e4 = state.get
    else:
        n_events, total_e4 = 0, 0
    for pdf in pdfs:
        n_events += len(pdf)
        # State carries the total as a DECIMAL(,4)-scaled integer: exact,
        # so the accumulated value is independent of batch boundaries and
        # partition order, and the emitted double (one IEEE division) is
        # bit-identical to a decimal-sum SQL twin - a float += here would
        # drift by accumulation order and flap the oracle hash.
        total_e4 += int(pdf["value"].fillna(0.0).mul(10000.0).round().sum())
    state.update((n_events, total_e4))
    yield pd.DataFrame({
        "user_id": [user_id],
        "n_events": [n_events],
        "total_value": [total_e4 / 10000.0],
    })


def running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming DataFrame of per-user running totals (update mode)."""
    events = read_events_stream(spark, sf_dir)
    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                _update_user_totals,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


def run_stateful_to_completion(spark: SparkSession, sf_dir: str,
                               query_name: str = "stateful_totals") -> DataFrame:
    """Execute over all available input; returns the latest state per user
    (the last update emitted for each key)."""
    result = running_user_totals(spark, sf_dir)
    q = (result.writeStream
         .format("memory")
         .queryName(query_name)
         .outputMode("update")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    # Update mode appends one row per key per batch; keep the last emit.
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    raw = spark.table(query_name).withColumn(
        "__order", F.monotonically_increasing_id())
    w = Window.partitionBy("user_id").orderBy(F.desc("__order"))
    return (raw.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__order"))
