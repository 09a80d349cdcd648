"""Leakage-safe split contract: split is a pure function of cluster_id
(never straddles a near-dup cluster), unlabeled docs fall back to
singleton clusters, and the doc-id-hash split it replaces demonstrably
DOES straddle clusters on the same fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR

from etl_pipeline_mini_project_01_spark.catalog import load_table
from etl_pipeline_mini_project_01_spark.plans.curation import (
    cluster_safe_split,
    dedup_clusters,
    md5_32,
)


def _fixture(spark):
    docs = load_table(spark, SF_DIR, "documents")
    labels = dedup_clusters(spark, SF_DIR).select("doc_id", "cluster_id")
    return docs, labels


def test_no_cluster_straddles_splits(spark):
    docs, labels = _fixture(spark)
    out = cluster_safe_split(docs, labels).cache()
    per_cluster = (out.groupBy("cluster_id")
                   .agg(F.countDistinct("split").alias("n_splits"),
                        F.count(F.lit(1)).alias("n_docs"))
                   .collect())
    multi = [r for r in per_cluster if r.n_docs > 1]
    assert len(multi) >= 5, "fixture should contain multi-doc clusters"
    assert all(r.n_splits == 1 for r in per_cluster)
    # every doc assigned, to a real split
    assert out.count() == docs.count()
    assert {r.split for r in out.select("split").distinct().collect()} \
        <= {"train", "val", "test"}
    out.unpersist()


def test_doc_hash_split_would_leak_on_same_fixture(spark):
    """The comparison that justifies the operator: hashing doc_id (the
    plain split) places members of at least one near-dup cluster in
    different splits. Deterministic: fixed fixture, fixed hash."""
    docs, labels = _fixture(spark)
    doc_bucket = F.pmod(
        md5_32(F.concat(F.lit("csplit|"), F.col("doc_id").cast("string"))),
        F.lit(100))
    doc_split = (docs.select("doc_id", F.when(doc_bucket < 80, "train")
                             .when(doc_bucket < 90, "val")
                             .otherwise("test").alias("split"))
                 .join(labels, "doc_id"))
    straddling = (doc_split.groupBy("cluster_id")
                  .agg(F.countDistinct("split").alias("n"))
                  .filter(F.col("n") > 1).count())
    assert straddling > 0


def test_unlabeled_docs_fall_back_to_singletons(spark):
    docs = spark.createDataFrame(
        [("a",), ("b",), ("c",)], "doc_id string")
    labels = spark.createDataFrame(
        [("a", "a"), ("b", "a")], "doc_id string, cluster_id string")
    rows = {r.doc_id: r for r in cluster_safe_split(docs, labels).collect()}
    assert rows["a"].split == rows["b"].split  # same cluster, same split
    assert rows["c"].cluster_id == "c"  # left-join miss -> own id


def test_split_is_stable_under_repartition(spark):
    docs, labels = _fixture(spark)
    a = {(r.doc_id, r.split)
         for r in cluster_safe_split(docs, labels).collect()}
    b = {(r.doc_id, r.split)
         for r in cluster_safe_split(docs.repartition(13),
                                     labels.repartition(7)).collect()}
    assert a == b


def test_bad_fractions_raise(spark):
    docs, labels = _fixture(spark)
    with pytest.raises(ValueError):
        cluster_safe_split(docs, labels, train_pct=90, val_pct=10)


def test_cluster_split_audit_reports_zero_straddles(spark):
    """The registered audit row (cluster_split_audit) must cover all
    documents, name every split, and prove zero straddling clusters."""
    from conftest import SF_DIR

    from etl_pipeline_mini_project_01_spark.catalog import load_table
    from etl_pipeline_mini_project_01_spark.plans.registry import (
        QUERIES,
        load_all_plans,
    )

    load_all_plans()
    rows = QUERIES["cluster_split_audit"](spark, SF_DIR).collect()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert {r.split for r in rows} == {"train", "val", "test"}
    assert sum(r.n_docs for r in rows) == n_docs
    assert all(r.straddling_clusters == 0 for r in rows)
    assert all(r.n_clusters <= r.n_docs for r in rows)
