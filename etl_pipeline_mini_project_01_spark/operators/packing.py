"""Token-budget shard packing (sequence packing's corpus-level cousin):
assign documents, in a deterministic key order, to consecutive training
shards of ~budget tokens each.

The naive formulation is a GLOBAL running sum - `Window.orderBy(key)`
with no partition key - which Spark executes on a SINGLE partition: the
classic scale killer (SURVEY §4.4). This operator computes the same
prefix sum the distributed way:

  1. range-partition by the key (P partitions, each sorted);
  2. per-partition running sums via a window PARTITIONED by
     spark_partition_id() - parallel, no global exchange;
  3. per-partition totals (P rows - control-plane small) become
     per-partition offsets via a cumulative sum over the tiny totals
     relation, broadcast back;
  4. global_prefix = partition_offset + local_running_sum.

Shard semantics: shard id = floor(prefix_before_doc / budget) - a doc
that crosses a shard boundary lands in the earlier shard, so shards can
exceed the budget by at most one document (the standard best-effort
packing contract; exact bin packing is inherently sequential). The
assignment is deterministic in (key order, token counts) and INDEPENDENT
of the partition count - asserted in tests/test_packing.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_into_shards(df: DataFrame, budget: int, key_col: str = "doc_id",
                     token_col: str = "n_tokens",
                     num_partitions: int = 8,
                     carry_cols: tuple[str, ...] = (),
                     group_col: str | None = None) -> DataFrame:
    """Returns df's (key_col, token_col[, *carry_cols]) plus `shard`
    (dense from 0) and `prefix_tokens` (tokens before this doc in key
    order). `carry_cols` ride along untouched (they play no part in the
    ordering or the sums).

    With `group_col`, the prefix sum and shard numbering restart per
    group (e.g. per train/val/test split) but everything still runs in
    ONE pass over the data: range-partition on (group, key), per-
    (group, partition) local sums, and a (groups x P)-row offsets
    relation - so a multi-split corpus is packed without re-reading
    it once per split."""
    groups = (group_col,) if group_col else ()
    base = (df.select(*groups, key_col, token_col, *carry_cols)
            .repartitionByRange(num_partitions,
                                *[F.col(c) for c in (*groups, key_col)]))
    with_pid = base.withColumn("_pid", F.spark_partition_id())
    w_local = (Window.partitionBy(*groups, "_pid").orderBy(key_col)
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = with_pid.withColumn("_local_sum",
                                F.sum(token_col).over(w_local))
    # PIN one materialization of the ranged relation. `local` feeds both
    # the data side and the `totals` aggregate below; without this they
    # are two separate executions of the same lineage, and the range
    # exchange's SAMPLED boundaries need not agree between them when the
    # upstream partitioning is AQE-shaped (observed at sf0.1 under the
    # full mix chain: _pid disagreed between the join sides, corrupting
    # the offsets). Any real prefix-sum implementation materializes the
    # partitioned pass; at cluster scale swap localCheckpoint for a
    # DISK_ONLY persist or a staged write. Deliberately EAGER (the
    # default): plan construction runs one Spark job up front, but a
    # lazy checkpoint would let two downstream stages race to compute
    # the uncheckpointed lineage - re-opening the exact boundary-
    # resampling nondeterminism this pin exists to close. Callers'
    # "one lazy plan" claims are qualified accordingly (operators/mix.py).
    local = local.localCheckpoint()
    # (groups x P)-row totals relation: cumulative offsets over partition
    # ids within each group.
    # sum of the token column, NOT max of the running sum: identical
    # for the valid (non-negative counts) domain, but max would
    # silently corrupt offsets if a negative count ever slipped in
    totals = (local.groupBy(*groups, "_pid")
              .agg(F.sum(token_col).alias("_ptotal")))
    w_off = (Window.partitionBy(*groups).orderBy("_pid")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = totals.withColumn(
        "_offset", F.coalesce(F.sum("_ptotal").over(w_off), F.lit(0)))
    # The narrow-partition window above runs over (groups x P) rows (the
    # number of partitions), never over the data - that is the whole trick.
    packed = (local.join(F.broadcast(offsets.select(*groups, "_pid",
                                                    "_offset")),
                         [*groups, "_pid"])
              .withColumn("prefix_tokens",
                          (F.col("_offset") + F.col("_local_sum")
                           - F.col(token_col)).cast("bigint"))
              .withColumn("shard",
                          F.floor(F.col("prefix_tokens") / budget)
                          .cast("bigint")))
    return packed.select(*groups, key_col, token_col, *carry_cols,
                         "prefix_tokens", "shard")
