"""End-to-end training-mix invariants: the composed chain must preserve
every per-stage guarantee simultaneously - keeper-only dedup, zero
contaminated survivors, no cluster straddling splits, budget-bounded
dense shards per split, and full determinism under repartitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR

from etl_pipeline_mini_project_01_spark.catalog import load_table
from etl_pipeline_mini_project_01_spark.operators.decontaminate import (
    contamination_scores,
)
from etl_pipeline_mini_project_01_spark.operators.mix import (
    assemble_training_shards,
)
from etl_pipeline_mini_project_01_spark.plans.curation import dedup_clusters

BUDGET = 2_000
N = 5


def _inputs(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    # benchmark: verbatim windows from a slice of docs (same construction
    # as test_decontaminate)
    toks = docs.select(
        "doc_id", F.filter(F.split(F.lower("text"), r"\s+"),
                           lambda t: t != "").alias("w"))
    benchmark = (toks.filter((F.crc32(F.col("doc_id").cast("string")) % 11
                              == 0) & (F.size("w") >= N))
                 .select(F.array_join(F.slice("w", 1, N + 2), " ")
                         .alias("text")))
    return docs, benchmark


def test_mix_invariants_end_to_end(spark):
    docs, benchmark = _inputs(spark)
    out = assemble_training_shards(docs, benchmark, budget=BUDGET,
                                   num_partitions=4).cache()
    rows = out.collect()
    assert rows

    # 1. keeper-only: every emitted doc is its own cluster keeper, one
    #    row per cluster at most
    assert all(r.doc_id == r.cluster_id for r in rows)
    clusters = {r.cluster_id: r for r in rows}
    assert len(clusters) == len(rows)

    # 2. dedup actually dropped something: fixture has multi-doc clusters
    truth_clusters = dedup_clusters(spark, SF_DIR).collect()
    non_keepers = [r for r in truth_clusters if not r.is_keeper]
    assert non_keepers, "fixture should have duplicate clusters"
    emitted = {r.doc_id for r in rows}
    assert emitted.isdisjoint({r.doc_id for r in non_keepers})

    # 3. zero contaminated survivors
    contaminated = {
        r.doc_id
        for r in contamination_scores(docs, benchmark, n=13).collect()
        if r.hit_ngrams > 0}
    assert emitted.isdisjoint(contaminated)

    # 4. budget-bounded dense shards per split; prefix sums consistent
    for split in {r.split for r in rows}:
        srows = sorted((r for r in rows if r.split == split),
                       key=lambda r: r.order_key)
        prefix = 0
        for r in srows:
            assert r.prefix_tokens == prefix
            assert r.shard == prefix // BUDGET
            prefix += r.n_tokens
        shards = {}
        for r in srows:
            shards.setdefault(r.shard, []).append(r)
        assert sorted(shards) == list(range(len(shards)))
        for sid, members in shards.items():
            tokens = sum(m.n_tokens for m in members)
            assert tokens <= BUDGET + max(m.n_tokens for m in members)
    out.unpersist()


def test_mix_deterministic_under_repartition(spark):
    docs, benchmark = _inputs(spark)
    a = {tuple(r) for r in assemble_training_shards(
        docs, benchmark, budget=BUDGET, num_partitions=3).collect()}
    b = {tuple(r) for r in assemble_training_shards(
        docs.repartition(17), benchmark, budget=BUDGET,
        num_partitions=9).collect()}
    assert a == b


def test_mix_without_benchmark_keeps_all_keepers(spark):
    docs, _ = _inputs(spark)
    out = assemble_training_shards(docs, None, budget=BUDGET)
    keepers = {r.doc_id for r in dedup_clusters(spark, SF_DIR).collect()
               if r.is_keeper}
    assert {r.doc_id for r in out.collect()} == keepers
