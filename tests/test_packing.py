"""Distributed prefix-sum shard packing: must equal the naive global
window exactly, stay within the best-effort budget contract, and be
independent of the partition count (the property that makes it the
scale-safe replacement for a single-partition global window)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from conftest import SF_DIR

from etl_pipeline_mini_project_01_spark.catalog import load_table
from etl_pipeline_mini_project_01_spark.functions.text import word_array
from etl_pipeline_mini_project_01_spark.operators.packing import (
    pack_into_shards,
)

BUDGET = 500


def _docs(spark):
    return (load_table(spark, SF_DIR, "documents")
            .select("doc_id", F.size(word_array("text")).alias("n_tokens")))


def _naive(docs):
    """Single-partition global window - the formulation being replaced."""
    w = (Window.orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (docs.withColumn(
        "prefix_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("bigint"))
        .withColumn("shard", F.floor(F.col("prefix_tokens") / BUDGET)
                    .cast("bigint"))
        .select("doc_id", "n_tokens", "prefix_tokens", "shard"))


def test_packing_equals_naive_global_window(spark):
    docs = _docs(spark)
    got = {(r.doc_id, r.prefix_tokens, r.shard)
           for r in pack_into_shards(docs, BUDGET).collect()}
    want = {(r.doc_id, r.prefix_tokens, r.shard)
            for r in _naive(docs).collect()}
    assert got == want


def test_packing_independent_of_partition_count(spark):
    docs = _docs(spark)
    a = {(r.doc_id, r.shard)
         for r in pack_into_shards(docs, BUDGET, num_partitions=2).collect()}
    b = {(r.doc_id, r.shard)
         for r in pack_into_shards(docs, BUDGET,
                                   num_partitions=13).collect()}
    assert a == b


def test_shards_respect_best_effort_budget(spark):
    out = pack_into_shards(_docs(spark), BUDGET).cache()
    per_shard = (out.groupBy("shard")
                 .agg(F.sum("n_tokens").alias("tokens"),
                      F.max("n_tokens").alias("max_doc"))
                 .collect())
    max_shard = max(r.shard for r in per_shard)
    for r in per_shard:
        # crossing doc may overflow by at most itself; only the LAST
        # shard may run under budget
        assert r.tokens <= BUDGET + r.max_doc
        if r.shard < max_shard:
            assert r.tokens >= BUDGET - r.max_doc
    # dense shard ids from 0
    assert sorted(r.shard for r in per_shard) == list(
        range(max_shard + 1))
    out.unpersist()


def test_packing_plan_has_no_data_sized_global_window(spark):
    """The only single-partition window may run over the P-row totals
    relation - the full data path must stay hash/range-partitioned."""
    plan = (pack_into_shards(_docs(spark), BUDGET)
            ._jdf.queryExecution().executedPlan().toString())
    # data-path windows are partitioned by _pid
    assert "Window [sum" in plan
    # the offsets join must be a broadcast of the tiny totals relation
    assert "BroadcastHashJoin" in plan


def test_grouped_packing_equals_per_group_packing(spark):
    """group_col packing (one pass) must equal packing each group
    independently (what the per-split filter-union used to do), with
    prefix sums and shard numbering restarting per group."""
    docs = (_docs(spark)
            .withColumn("grp", (F.col("doc_id") % 3).cast("string")))
    grouped = pack_into_shards(
        docs, BUDGET, key_col="doc_id", token_col="n_tokens",
        num_partitions=4, group_col="grp").orderBy("doc_id").collect()
    independent = []
    for g in ("0", "1", "2"):
        rows = pack_into_shards(
            docs.filter(F.col("grp") == g), BUDGET, key_col="doc_id",
            token_col="n_tokens", num_partitions=4).collect()
        independent.extend((r.doc_id, r.prefix_tokens, r.shard)
                           for r in rows)
    assert sorted((r.doc_id, r.prefix_tokens, r.shard) for r in grouped) \
        == sorted(independent)
    # Every group restarts at prefix 0 / shard 0.
    firsts = {}
    for r in grouped:
        firsts.setdefault(r.grp, r)
    for r in firsts.values():
        assert r.prefix_tokens == 0 and r.shard == 0


def test_grouped_packing_partition_count_independent(spark):
    docs = (_docs(spark)
            .withColumn("grp", (F.col("doc_id") % 2).cast("string")))
    outs = [
        sorted((r.doc_id, r.prefix_tokens, r.shard)
               for r in pack_into_shards(
                   docs, BUDGET, key_col="doc_id", token_col="n_tokens",
                   num_partitions=p, group_col="grp").collect())
        for p in (1, 3, 16)
    ]
    assert outs[0] == outs[1] == outs[2]
