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


def test_kernels_bit_identical(spark, emb):
    """The Arrow-batched numpy kernel must agree with the interpreted
    fold EXACTLY - same centroids (the fit consumes assignments) and
    bit-equal centroid distances - because both accumulate squared
    diffs in dim order from 0.0 with the same IEEE float64 ops."""
    from etl_pipeline_mini_project_01_spark.operators.kmeans import (
        kmeans_fit,
        kmeans_transform,
    )

    sub = emb.limit(120)
    cents_v, dim_v = kmeans_fit(sub, k=3, iters=2, kernel="vectorized")
    cents_f, dim_f = kmeans_fit(sub, k=3, iters=2, kernel="fold")
    assert (dim_v, cents_v) == (dim_f, cents_f)

    tv = sorted((r.vec_id, r.cluster, r.centroid_dist) for r in
                kmeans_transform(sub, cents_v, dim_v,
                                 kernel="vectorized").collect())
    tf = sorted((r.vec_id, r.cluster, r.centroid_dist) for r in
                kmeans_transform(sub, cents_f, dim_f,
                                 kernel="fold").collect())
    assert tv == tf  # exact float equality, not approx


def test_matmul_kernel_matches_vectorized(spark, emb):
    """The large-k dgemm kernel must produce the same model, the same
    assignments, and (because the winner's distance is recomputed in
    fold order) bit-equal centroid_dist on the fixture - the expanded
    form only risks divergence on argmin razor-ties, absent here."""
    from etl_pipeline_mini_project_01_spark.operators.kmeans import (
        kmeans_fit,
        kmeans_transform,
    )

    cents_v, dim = kmeans_fit(emb, k=5, iters=2, kernel="vectorized")
    cents_m, dim_m = kmeans_fit(emb, k=5, iters=2, kernel="matmul")
    assert (dim, cents_v) == (dim_m, cents_m)

    tv = sorted((r.vec_id, r.cluster, r.centroid_dist) for r in
                kmeans_transform(emb, cents_v, dim,
                                 kernel="vectorized").collect())
    tm = sorted((r.vec_id, r.cluster, r.centroid_dist) for r in
                kmeans_transform(emb, cents_m, dim,
                                 kernel="matmul").collect())
    assert tv == tm  # exact float equality, not approx


def test_semdedup_matmul_kernel_same_verdicts(spark, emb):
    """semdedup(kernel='matmul') - dgemm assignment + the unchanged
    fold-order pair stage - must emit identical verdicts to the
    default."""
    from etl_pipeline_mini_project_01_spark.operators.semdedup import (
        semdedup,
    )

    base = sorted((r.vec_id, r.cluster, r.kept) for r in
                  semdedup(emb, k=4, iters=2, threshold=0.35).collect())
    fast = sorted((r.vec_id, r.cluster, r.kept) for r in
                  semdedup(emb, k=4, iters=2, threshold=0.35,
                           kernel="matmul").collect())
    assert base == fast


def test_seeding_handles_sparse_noncontiguous_ids(spark, emb):
    """md5-keyed seeding must not assume ids 0..k-1 exist (VERDICT r3
    weak #3): shifting/spreading the id space still fits and assigns
    every row."""
    sparse = emb.withColumn("vec_id", F.col("vec_id") * 7 + 1_000_003)
    out = kmeans_assign(sparse, k=4, iters=1)
    n = sparse.count()
    assert out.count() == n
    assert out.select("vec_id").distinct().count() == n


def test_seeding_is_id_distribution_keyed_not_positional(spark, emb):
    """Same rows under different partitionings -> identical seeds ->
    identical model (collect order must not leak into the model)."""
    from etl_pipeline_mini_project_01_spark.operators.kmeans import kmeans_fit

    a, _ = kmeans_fit(emb.repartition(1), k=4, iters=1)
    b, _ = kmeans_fit(emb.repartition(9), k=4, iters=1)
    assert a == b


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


def test_twolevel_partition_count_invariant(spark, emb):
    from etl_pipeline_mini_project_01_spark.operators.kmeans import (
        kmeans_assign_twolevel,
    )

    outs = []
    for p in (1, 7):
        outs.append(sorted(
            (r.vec_id, r.coarse, r.fine, r.leaf, r.leaf_size)
            for r in kmeans_assign_twolevel(
                emb.repartition(p), k1=3, k2=2).collect()))
    assert outs[0] == outs[1]


def test_twolevel_covers_all_rows_with_consistent_leaves(spark, emb):
    from etl_pipeline_mini_project_01_spark.operators.kmeans import (
        kmeans_assign_twolevel,
    )

    k1, k2 = 4, 3
    rows = kmeans_assign_twolevel(emb, k1=k1, k2=k2).collect()
    assert len(rows) == emb.count()
    sizes = {}
    for r in rows:
        assert 0 <= r.coarse < k1 and 0 <= r.fine < k2
        assert r.leaf == r.coarse * k2 + r.fine
        sizes.setdefault(r.leaf, set()).add(r.leaf_size)
    # leaf_size is a window count: constant within the leaf, sums to n
    assert all(len(s) == 1 for s in sizes.values())
    assert sum(next(iter(s)) for s in sizes.values()) == len(rows)


def test_twolevel_matmul_kernel_matches_default(spark, emb):
    from etl_pipeline_mini_project_01_spark.operators.kmeans import (
        kmeans_assign_twolevel,
    )

    base = sorted((r.vec_id, r.coarse, r.fine) for r in
                  kmeans_assign_twolevel(emb, k1=3, k2=2).collect())
    fast = sorted((r.vec_id, r.coarse, r.fine) for r in
                  kmeans_assign_twolevel(emb, k1=3, k2=2,
                                         kernel="matmul").collect())
    assert base == fast


def test_topn_matches_pure_python_replay(spark, emb):
    """The distributed probe-list kernel (kmeans_transform_topn) must
    reproduce the exact (dist, cid)-ordered top-n the retired driver
    loop computed: floor-scaled xd, fold-order accumulation from 0.0,
    ties -> lowest cid (VERDICT r4 'done' criterion for the IVF fix)."""
    import math

    from etl_pipeline_mini_project_01_spark.operators.kmeans import (
        kmeans_fit,
        kmeans_transform_topn,
    )

    sub = emb.limit(100)
    cents, dim = kmeans_fit(sub, k=5, iters=1)
    got = sorted((r.vec_id, r.probe_rank, r.cluster) for r in
                 kmeans_transform_topn(sub, cents, dim, n=3).collect())

    expect = []
    for r in sub.select("vec_id", "embedding").collect():
        xd = [math.floor(float(v) * (1 << 20)) / (1 << 20)
              for v in r.embedding]
        ds = []
        for cid, c in enumerate(cents):
            acc = 0.0
            for i in range(dim):
                d = xd[i] - c[i]
                acc = acc + d * d
            ds.append((acc, cid))
        ds.sort()
        expect += [(int(r.vec_id), rank, cid)
                   for rank, (_, cid) in enumerate(ds[:3])]
    assert got == sorted(expect)


def test_topn_plan_is_map_side_only(spark, emb):
    """The probe-list assignment must stay a scan -> ArrowEvalPython ->
    posexplode chain: no Exchange (the whole point of replacing the
    driver loop is one shuffle-free distributed pass), no row-at-a-time
    BatchEvalPython."""
    from etl_pipeline_mini_project_01_spark.operators.kmeans import (
        kmeans_fit,
        kmeans_transform_topn,
    )

    cents, dim = kmeans_fit(emb, k=4, iters=1)
    plan = (kmeans_transform_topn(emb, cents, dim, n=2)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_topn_matmul_kernel_matches_default(spark, emb):
    got = None
    from etl_pipeline_mini_project_01_spark.operators.kmeans import (
        kmeans_fit,
        kmeans_transform_topn,
    )

    cents, dim = kmeans_fit(emb, k=6, iters=1)
    for kernel in ("vectorized", "matmul"):
        out = sorted((r.vec_id, r.probe_rank, r.cluster) for r in
                     kmeans_transform_topn(emb, cents, dim, n=6,
                                           kernel=kernel).collect())
        assert got is None or out == got
        got = out


def test_twolevel_transform_handles_empty_fine_cluster(spark, emb):
    """Frozen-model safety (ADVICE r4): applying a two-level model to
    data that routes into a coarse cluster with NO fine centroids must
    not crash - the row falls back to fine=0 with the distance measured
    against the coarse centroid itself."""
    import math

    from etl_pipeline_mini_project_01_spark.operators.kmeans import (
        kmeans_fit_twolevel,
        kmeans_transform_twolevel,
    )

    coarse, fine, dim = kmeans_fit_twolevel(emb, k1=3, k2=2)
    # Simulate a coarse cluster that was empty at fit time: strip its
    # sub-centroids, then transform rows that land there.
    gutted = [fine[0], fine[1], []]
    out = {r.vec_id: r for r in
           kmeans_transform_twolevel(emb, coarse, gutted, dim).collect()}
    assert len(out) == emb.count()
    hit = [r for r in out.values() if r.coarse == 2]
    assert hit, "fixture must route some rows to the gutted cluster"
    for r in hit:
        assert r.fine == 0
    # Spot-check one fallback distance against the coarse centroid.
    probe = hit[0]
    vec = (emb.filter(F.col("vec_id") == probe.vec_id)
           .select("embedding").collect()[0].embedding)
    xd = [math.floor(float(v) * (1 << 20)) / (1 << 20) for v in vec]
    acc = 0.0
    for i in range(dim):
        d = xd[i] - coarse[2][i]
        acc = acc + d * d
    assert probe.fine_dist == acc


def test_twolevel_refines_coarse_inertia(spark, emb):
    """Splitting each coarse cluster into k2 leaves must not increase
    total within-cluster squared distance: the fine argmin minimizes
    over sub-centroids that include each coarse cluster's own mass."""
    import numpy as np

    from etl_pipeline_mini_project_01_spark.operators.kmeans import (
        kmeans_assign,
        kmeans_assign_twolevel,
    )

    def inertia(assign_df, key):
        joined = assign_df.join(emb, "vec_id").select(key, "embedding")
        groups = defaultdict(list)
        for r in joined.collect():
            groups[r[key]].append(np.array(r.embedding, dtype=float))
        tot = 0.0
        for vs in groups.values():
            mat = np.stack(vs)
            tot += ((mat - mat.mean(axis=0)) ** 2).sum()
        return tot

    flat = inertia(kmeans_assign(emb, k=3, iters=1), "cluster")
    two = inertia(kmeans_assign_twolevel(emb, k1=3, k2=3,
                                         iters1=1, iters2=1), "leaf")
    assert two <= flat * 1.0001
