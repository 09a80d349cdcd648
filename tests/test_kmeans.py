"""k-means over embeddings (operators/kmeans.py): determinism across
partition counts (the property the integer-exact design buys), basic
Lloyd's sanity (assignments move toward their own centroid), and a
quality floor against the embeddings table's ground-truth labels."""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR

from etl_pipeline_mini_project_01_spark.catalog import load_table
from etl_pipeline_mini_project_01_spark.operators.kmeans import kmeans_assign


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


def test_partition_count_invariant(spark, emb):
    outs = []
    for p in (1, 7):
        outs.append(sorted(
            (r.vec_id, r.cluster)
            for r in kmeans_assign(emb.repartition(p), k=4, iters=2)
            .collect()))
    assert outs[0] == outs[1]


def test_all_rows_assigned_one_cluster_each(spark, emb):
    n = emb.count()
    out = kmeans_assign(emb, k=4, iters=1)
    assert out.count() == n
    assert out.select("vec_id").distinct().count() == n
    k_seen = [r.cluster for r in out.select("cluster").distinct().collect()]
    assert set(k_seen) <= set(range(4))


def test_iterations_do_not_increase_inertia(spark, emb):
    """Lloyd's monotonicity: total within-cluster squared distance after
    2 updates must be <= after 0 updates (both measured against the
    respective assignment's own mean centroids)."""
    def inertia(iters):
        out = (kmeans_assign(emb, k=4, iters=iters)
               .join(emb, "vec_id")
               .select("cluster", "embedding"))
        rows = out.collect()
        by = defaultdict(list)
        for r in rows:
            by[r.cluster].append(list(r.embedding))
        total = 0.0
        for vecs in by.values():
            dim = len(vecs[0])
            mu = [sum(v[i] for v in vecs) / len(vecs) for i in range(dim)]
            total += sum(sum((v[i] - mu[i]) ** 2 for i in range(dim))
                         for v in vecs)
        return total

    assert inertia(2) <= inertia(0) + 1e-9


def test_cluster_label_purity_beats_random(spark, emb):
    """The fixture embeddings carry a ground-truth `label`; k-means with
    k = n_labels must produce clusters whose majority-label purity beats
    the uniform-random floor by a wide margin."""
    n_labels = emb.select("label").distinct().count()
    out = (kmeans_assign(emb, k=max(2, n_labels), iters=2)
           .join(emb.select("vec_id", "label"), "vec_id"))
    rows = out.collect()
    by = defaultdict(list)
    for r in rows:
        by[r.cluster].append(r.label)
    majority = sum(Counter(v).most_common(1)[0][1] for v in by.values())
    purity = majority / len(rows)
    assert purity >= 1.5 / n_labels, (
        f"purity {purity:.3f} vs random {1 / n_labels:.3f}"
    )
