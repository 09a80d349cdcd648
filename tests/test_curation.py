"""Semantic invariants of the curation family (plans/curation.py).
Oracle parity is covered by test_oracle_parity's parametrization; these
assert the properties parity alone can't see (keeper uniqueness,
transitivity, split fractions, redaction completeness)."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR

from etl_pipeline_mini_project_01_spark.plans.curation import (
    _near_dup_edges,
    dedup_clusters,
    pii_redaction,
    sample_stratified,
    split_train_val_test,
    tfidf_top_terms,
)
from etl_pipeline_mini_project_01_spark.catalog import load_table


def test_clusters_one_keeper_per_cluster(spark):
    out = dedup_clusters(spark, SF_DIR).cache()
    per_cluster = (out.groupBy("cluster_id")
                   .agg(F.sum(F.col("is_keeper").cast("int")).alias("keepers")))
    assert per_cluster.where("keepers <> 1").isEmpty()
    # cluster label is the component minimum -> never above the member id
    assert out.where("cluster_id > doc_id").isEmpty()
    out.unpersist()


def test_clusters_respect_near_dup_edges(spark):
    """Every near-dup pair must land in the same cluster (the defining
    property of connected components over the pair graph)."""
    docs = load_table(spark, SF_DIR, "documents")
    edges = _near_dup_edges(docs)
    clusters = dedup_clusters(spark, SF_DIR).select("doc_id", "cluster_id")
    a = clusters.withColumnRenamed("doc_id", "src").withColumnRenamed(
        "cluster_id", "c_src")
    b = clusters.withColumnRenamed("doc_id", "dst").withColumnRenamed(
        "cluster_id", "c_dst")
    joined = edges.join(a, "src").join(b, "dst")
    assert joined.where("c_src <> c_dst").isEmpty()


def test_split_partitions_the_corpus(spark):
    out = split_train_val_test(spark, SF_DIR).cache()
    docs = load_table(spark, SF_DIR, "documents")
    assert out.count() == docs.count()  # total function: every doc assigned
    assert out.where("bucket < 0 OR bucket >= 100").isEmpty()
    bad = out.where(
        "(bucket < 80 AND split <> 'train') OR "
        "(bucket >= 80 AND bucket < 90 AND split <> 'val') OR "
        "(bucket >= 90 AND split <> 'test')")
    assert bad.isEmpty()
    n = out.count()
    fracs = {r["split"]: r["c"] / n
             for r in out.groupBy("split").agg(F.count("*").alias("c")).collect()}
    # 80/10/10 within binomial noise on a 500-doc corpus
    assert abs(fracs.get("train", 0) - 0.8) < 0.08
    assert abs(fracs.get("val", 0) - 0.1) < 0.06
    assert abs(fracs.get("test", 0) - 0.1) < 0.06
    out.unpersist()


def test_split_is_deterministic(spark):
    h1 = split_train_val_test(spark, SF_DIR).collect()
    h2 = split_train_val_test(spark, SF_DIR).collect()
    assert h1 == h2


def test_stratified_sample_rates(spark):
    docs = load_table(spark, SF_DIR, "documents")
    totals = {r["lang"]: r["c"]
              for r in docs.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    kept = {r["lang"]: r["c"]
            for r in sample_stratified(spark, SF_DIR)
            .groupBy("lang").agg(F.count("*").alias("c")).collect()}
    for lang, total in totals.items():
        rate = kept.get(lang, 0) / total
        target = 0.10 if lang == "en" else 0.50
        # 3-sigma binomial tolerance for the stratum size
        sigma = (target * (1 - target) / total) ** 0.5
        assert abs(rate - target) < max(3 * sigma, 0.05), (lang, rate, target)


def test_pii_redaction_is_complete(spark):
    out = pii_redaction(spark, SF_DIR).cache()
    # the injected trailer guarantees at least one of each PII kind
    assert out.where("n_emails < 1 OR n_urls < 1 OR n_handles < 1").isEmpty()
    leftovers = out.where(
        "redacted RLIKE '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\\\.[A-Za-z]{2,}'"
        " OR redacted RLIKE 'https?://'")
    assert leftovers.isEmpty()
    assert out.where("redacted NOT LIKE '%<EMAIL>%'").isEmpty()
    out.unpersist()


def test_tfidf_rank_shape(spark):
    out = tfidf_top_terms(spark, SF_DIR).cache()
    assert out.where("rank < 1 OR rank > 3").isEmpty()
    per_doc = out.groupBy("doc_id").agg(
        F.count("*").alias("c"),
        F.collect_set("rank").alias("ranks"))
    # ranks are dense from 1 with no gaps or dups
    assert per_doc.where("c <> size(ranks)").isEmpty()
    assert per_doc.where("array_min(ranks) <> 1").isEmpty()
    out.unpersist()


def test_funnel_is_monotone(spark):
    from etl_pipeline_mini_project_01_spark.plans.curation import (
        curation_funnel,
    )
    rows = {r["stage"]: r["docs"]
            for r in curation_funnel(spark, SF_DIR).collect()}
    assert (rows["1_raw"] >= rows["2_after_exact_dedup"]
            >= rows["3_after_near_dedup"] >= rows["4_after_quality"]
            >= rows["5_retained_train"])
    assert rows["1_raw"] > 0 and rows["4_after_quality"] > 0


def test_ledger_retained_consistent_with_flags(spark):
    from etl_pipeline_mini_project_01_spark.plans.curation import (
        curation_docs_ledger,
    )
    led = curation_docs_ledger(spark, SF_DIR)
    bad = led.where(
        "retained <> (exact_keeper AND near_keeper AND passes_quality)")
    assert bad.isEmpty()


def _chain_edges(spark, n):
    """Symmetric edge list of the path graph 1-2-...-n (diameter n-1)."""
    pairs = [(i, i + 1) for i in range(1, n)]
    e = spark.createDataFrame(pairs, "src bigint, dst bigint")
    return e.union(e.select(F.col("dst").alias("src"),
                            F.col("src").alias("dst")))


def test_star_cc_handles_long_chain(spark):
    """Large-star/small-star converges on a diameter-59 path graph in
    O(log^2 n) rounds - the case hash-to-min's default 20-round bound
    cannot reach - and labels the whole chain with its minimum."""
    import pytest

    from etl_pipeline_mini_project_01_spark.plans.curation import (
        connected_components,
    )

    edges = _chain_edges(spark, 60)
    labels = connected_components(edges, algorithm="star")
    rows = labels.collect()
    assert len(rows) == 60
    assert all(r.label == 1 for r in rows)
    # hash-to-min needs ~diameter rounds: must now FAIL LOUDLY instead of
    # silently emitting unconverged labels (ADVICE r2).
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_rounds=5, algorithm="hash_to_min")
    # and with the bound raised past the diameter, both variants agree.
    ok = connected_components(edges, max_rounds=60,
                              algorithm="hash_to_min").collect()
    assert {(r.doc_id, r.label) for r in ok} == {(r.doc_id, r.label)
                                                for r in rows}


def test_star_cc_cross_validates_hash_to_min_random_graph(spark):
    """The two CC implementations must agree label-for-label on a
    deterministic pseudo-random graph (120 nodes, 150 md5-derived
    edges - mixes singletons, small clusters, and larger blobs)."""
    import hashlib

    from etl_pipeline_mini_project_01_spark.plans.curation import (
        connected_components,
    )

    def h(i, salt):
        return int(hashlib.md5(f"{salt}|{i}".encode()).hexdigest()[:8], 16)

    pairs = [(h(i, "a") % 120 + 1, h(i, "b") % 120 + 1) for i in range(150)]
    pairs = [(a, b) for a, b in pairs if a != b]
    e = spark.createDataFrame(pairs, "src bigint, dst bigint")
    edges = e.union(e.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst")))
    star = {(r.doc_id, r.label)
            for r in connected_components(edges, algorithm="star").collect()}
    h2m = {(r.doc_id, r.label)
           for r in connected_components(edges, max_rounds=150,
                                         algorithm="hash_to_min").collect()}
    assert star == h2m
    assert len(star) == len({d for d, _ in star})  # one label per node


def test_star_cc_multiple_components(spark):
    from etl_pipeline_mini_project_01_spark.plans.curation import (
        connected_components,
    )

    pairs = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)]
    e = spark.createDataFrame(pairs, "src bigint, dst bigint")
    edges = e.union(e.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst")))
    got = {(r.doc_id, r.label)
           for r in connected_components(edges, algorithm="star").collect()}
    want = {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10),
            (20, 20), (21, 20), (22, 20), (23, 20)}
    assert got == want


def test_cc_reliable_checkpoint_matches_local(spark, tmp_path):
    """r15 (VERDICT r14 #7): with a checkpoint_dir, CC pins every
    reliable_every-th round to RELIABLE storage - labels must be
    identical to the localCheckpoint-only default on BOTH algorithms
    (the pin changes fault-tolerance, never values), and the reliable
    path must actually write under the directory."""
    import os

    from etl_pipeline_mini_project_01_spark.plans.curation import (
        connected_components,
    )

    edges_rows = [(i, i + 1) for i in range(0, 40, 2)] \
        + [(100, 103), (103, 107), (107, 111)]
    sym = edges_rows + [(b, a) for a, b in edges_rows]
    edges = spark.createDataFrame(sym, "src bigint, dst bigint")

    base = {(r["doc_id"], r["label"]) for r in
            connected_components(edges, algorithm="star").collect()}
    ckdir = str(tmp_path / "cc_reliable")
    rel = {(r["doc_id"], r["label"]) for r in
           connected_components(edges, algorithm="star",
                                checkpoint_dir=ckdir,
                                reliable_every=1).collect()}
    assert rel == base
    assert any(files for _, _, files in os.walk(ckdir)), \
        "reliable checkpoint dir never written"
    h_base = {(r["doc_id"], r["label"]) for r in
              connected_components(edges, max_rounds=60,
                                   algorithm="hash_to_min").collect()}
    h_rel = {(r["doc_id"], r["label"]) for r in
             connected_components(edges, max_rounds=60,
                                  algorithm="hash_to_min",
                                  checkpoint_dir=ckdir,
                                  reliable_every=2).collect()}
    assert h_rel == h_base == base
