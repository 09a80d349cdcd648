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


def test_temperature_mix_rates_match_python_model(spark):
    """sqrt-temperature thresholds: floor(scale * sqrt(min_n / n_s)) per
    domain, rarest domain kept at exactly `scale` (100%)."""
    import math

    from etl_pipeline_mini_project_01_spark.operators.mix import (
        temperature_mix_rates,
    )

    docs = load_table(spark, SF_DIR, "documents")
    counts = {r.source: r.n for r in
              docs.groupBy(F.col("source")).agg(
                  F.count(F.lit(1)).alias("n")).collect()}
    min_n = min(counts.values())
    want = {d: math.floor(10_000 * math.sqrt(min_n / n))
            for d, n in counts.items()}
    got = {r.domain: r.keep_per_scale
           for r in temperature_mix_rates(docs).collect()}
    assert got == want
    assert got[min(counts, key=counts.get)] == 10_000


def test_temperature_sample_deterministic_and_rebalancing(spark):
    """The sample equals the per-doc hash-threshold model exactly, is
    partition-layout independent, and flattens the head: every domain's
    realized share moves toward the rarest domain's."""
    import hashlib

    from etl_pipeline_mini_project_01_spark.operators.mix import (
        temperature_mix_rates,
        temperature_sample,
    )

    docs = load_table(spark, SF_DIR, "documents")
    rates = {r.domain: r.keep_per_scale
             for r in temperature_mix_rates(docs).collect()}

    def bucket(doc_id):
        h = hashlib.md5(f"tmix|{doc_id}".encode()).hexdigest()[:8]
        return int(h, 16) % 10_000

    rows = docs.select("doc_id", "source").collect()
    want = {r.doc_id for r in rows if bucket(r.doc_id) < rates[r.source]}
    got = {r.doc_id for r in temperature_sample(docs).collect()}
    assert got == want
    again = {r.doc_id
             for r in temperature_sample(docs.repartition(13)).collect()}
    assert again == want

    # Rebalance direction, asserted on the THRESHOLDS (deterministic -
    # realized keep counts on a 500-doc fixture can hit 100% by hash
    # luck) and on the SKEWED domain column: `source` is uniform in the
    # fixture (25 docs each - mixing is correctly a no-op there, every
    # rate 10_000), `lang` is en-heavy, so en must be down-weighted and
    # the rarest lang kept at exactly 100%.
    assert set(rates.values()) == {10_000}
    lang_rates = {r.domain: r.keep_per_scale
                  for r in temperature_mix_rates(
                      docs, domain_col="lang").collect()}
    lang_n = {}
    for r in docs.select("lang").collect():
        lang_n[r.lang] = lang_n.get(r.lang, 0) + 1
    assert lang_rates[max(lang_n, key=lang_n.get)] < 10_000
    assert lang_rates[min(lang_n, key=lang_n.get)] == 10_000
