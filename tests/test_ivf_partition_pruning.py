"""VERDICT r5 #2: the IVF partition-pruning claim as a demonstrated
layout. The corpus is WRITTEN partitioned by its coarse cluster id
(operators/ivf_layout.py), and the probe scan is proven - via the
FileSourceScan's PartitionFilters and its numPartitions metric - to
read ONLY the nprobe probed partitions, both at planning time (literal
IN) and at runtime (dynamic partition pruning through the candidate
join). Referenced from SCALE.md's ANN section."""

from __future__ import annotations

import re
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR

from etl_pipeline_mini_project_01_spark.catalog import load_table
from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
    ivf_probe_pruned,
    probe_clusters,
    write_ivf_layout,
)
from etl_pipeline_mini_project_01_spark.operators.kmeans import (
    kmeans_fit,
    kmeans_transform,
    kmeans_transform_topn,
)

K, ITERS, NPROBE, TOPK = 8, 1, 2, 5


@pytest.fixture(scope="module")
def layout(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    cents, dim = kmeans_fit(emb, k=K, iters=ITERS)
    path = tempfile.mkdtemp(prefix="ivf_layout_") + "/embeddings"
    write_ivf_layout(emb, cents, dim, path)
    yield emb, cents, dim, path
    shutil.rmtree(path, ignore_errors=True)


def _scan_metrics(df):
    """Execute and return (metrics dict, plan string) of the parquet
    FileSourceScan leaf."""
    df.collect()
    jplan = df._jdf.queryExecution().executedPlan()
    leaves = jplan.collectLeaves()
    for i in range(leaves.size()):
        node = leaves.apply(i)
        if "Scan" in node.nodeName():
            out, it = {}, node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                out[kv._1()] = kv._2().value()
            return out, jplan.toString()
    raise AssertionError("no scan leaf found")


def test_probe_scan_reads_only_nprobe_partitions(spark, layout):
    """The serving path: literal IN on the probed ids -> the scan's
    PartitionFilters carry the list and the executed scan's
    numPartitions metric equals nprobe - the other k - nprobe
    directories are never listed, which is the property that makes the
    probe O(corpus/k * nprobe) I/O at 100 TB."""
    emb, cents, dim, path = layout
    qv = [float(v) for v in
          emb.filter("vec_id = 1").select("embedding").first()[0]]
    df = ivf_probe_pruned(spark, path, qv, cents, NPROBE, TOPK)
    metrics, plan = _scan_metrics(df)
    m = re.search(r"PartitionFilters: \[[^\]]*\]", plan)
    assert m and "cluster" in m.group(0) and "IN" in m.group(0), plan
    assert metrics["numPartitions"] == NPROBE
    # and the plan's top-k is a heap merge, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_probe_results_match_unpartitioned_computation(spark, layout):
    """Pruning must not change answers: the pruned top-k equals the
    same cosine top-k computed from the original (unpartitioned)
    relation restricted to the probed clusters."""
    emb, cents, dim, path = layout
    qv = [float(v) for v in
          emb.filter("vec_id = 1").select("embedding").first()[0]]
    got = [(r.vec_id, r.cluster, r.cosine)
           for r in ivf_probe_pruned(spark, path, qv, cents,
                                     NPROBE, TOPK).collect()]
    probes = probe_clusters(qv, cents, NPROBE)
    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        _cosine_to_literal,
    )
    import numpy as np
    ref = (kmeans_transform(emb, cents, dim)
           .join(emb.select("vec_id", "embedding"), "vec_id")
           .filter(F.col("cluster").isin(probes))
           .select("vec_id", "cluster",
                   _cosine_to_literal(np.asarray(qv)).alias("cosine"))
           .orderBy(F.desc("cosine"), "vec_id")
           .limit(TOPK))
    want = [(r.vec_id, r.cluster, r.cosine) for r in ref.collect()]
    assert got == want and len(got) == TOPK


def test_driver_probe_list_matches_distributed_kernel(spark, layout):
    """probe_clusters (driver-side serving math) must rank exactly like
    kmeans_transform_topn's distributed vectorized kernel - same fold
    order, same stable ties."""
    emb, cents, dim, path = layout
    rows = emb.filter("vec_id < 8").select("vec_id", "embedding").collect()
    dist = kmeans_transform_topn(emb.filter("vec_id < 8"), cents, dim,
                                 n=NPROBE)
    by_q = {}
    for r in dist.collect():
        by_q.setdefault(r.vec_id, {})[r.probe_rank] = r.cluster
    for r in rows:
        want = [by_q[r.vec_id][i] for i in range(NPROBE)]
        assert probe_clusters(list(r.embedding), cents, NPROBE) == want


def test_batch_probe_matches_serving_probe(spark, layout):
    """ivf_probe_pruned_batch (DPP path) must rank exactly like the
    serving path for the same query - same probed clusters, same
    (vec_id, rank) lists - and its plan must carry the runtime
    partition filter with no cartesian fallback."""
    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        ivf_probe_pruned_batch,
    )
    emb, cents, dim, path = layout
    queries = emb.filter(F.col("vec_id") < 3).select("vec_id", "embedding")
    batch = ivf_probe_pruned_batch(spark, path, queries, cents, dim,
                                   NPROBE, TOPK, probe_lists="plan")
    batch.collect()
    plan = batch._jdf.queryExecution().executedPlan().toString()
    # manifested layout (r9): plan mode prunes from the committed file
    # manifest - the scan carries the literal probed union; the DPP
    # fallback for manifest-less layouts is pinned separately in
    # test_plan_mode_dpp_fallback_without_manifest.
    assert re.search(r"PartitionFilters: \[cluster#\d+ IN \(", plan), plan
    assert "CartesianProduct" not in plan
    got = {(r.query_id, r.rank): r.vec_id for r in batch.collect()}
    for q in (0, 1, 2):
        qv = [float(v) for v in
              emb.filter(f"vec_id = {q}").select("embedding").first()[0]]
        # Serving takes a raw vector (no id), so its top-k includes the
        # query row itself; the batch path excludes self by id. Probe
        # one deeper and drop the self row before comparing.
        serving = ivf_probe_pruned(spark, path, qv, cents, NPROBE,
                                   TOPK + 1)
        want = [r.vec_id for r in serving.collect()
                if r.vec_id != q][:TOPK]
        assert [got[(q, i + 1)] for i in range(len(want))] == want


def test_batch_probe_literal_mode_equals_plan_mode(spark, layout):
    """probe_lists='literal' (the small-batch serving shape: probe
    lists collect()ed - control-plane, n_queries x nprobe - and pushed
    as a literal IN) must return the EXACT rows of the default plan/DPP
    mode, and its executed layout scan must show PLANNING-TIME pruning:
    PartitionFilters carries `cluster IN (<exactly the probed union>)`,
    so the file index never lists the other directories regardless of
    any runtime pruning Spark chooses to stack on top."""
    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        ivf_probe_pruned_batch,
    )
    emb, cents, dim, path = layout
    queries = emb.filter(F.col("vec_id") < 3).select("vec_id", "embedding")
    plan_mode = ivf_probe_pruned_batch(spark, path, queries, cents, dim,
                                       NPROBE, TOPK, probe_lists="plan")
    lit_mode = ivf_probe_pruned_batch(spark, path, queries, cents, dim,
                                      NPROBE, TOPK, probe_lists="literal")

    def _rows(df):
        return sorted((r.query_id, r.vec_id, int(r.cluster),
                       repr(r.cosine), r.rank) for r in df.collect())

    assert _rows(lit_mode) == _rows(plan_mode)

    union = {int(c) for q in (0, 1, 2)
             for c in probe_clusters(
                 [float(v) for v in emb.filter(f"vec_id = {q}")
                  .select("embedding").first()[0]], cents, NPROBE)}
    plan = lit_mode._jdf.queryExecution().executedPlan().toString()
    pushed = re.search(r"PartitionFilters: \[cluster#\d+ IN \(([\d,]+)\)",
                       plan)
    assert pushed, plan
    assert {int(x) for x in pushed.group(1).split(",")} == union


def test_auto_probe_mode_picks_by_batch_size(spark, layout):
    """probe_lists='auto' (the default, VERDICT r6 #6): at or below
    `literal_max` query rows the batch takes the literal path
    (planning-time `cluster IN (...)` partition filter, no kernel job
    before the scan); above it, the plan/DPP path. Same rows either
    side of the threshold - the mode is a physical choice only."""
    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        ivf_probe_pruned_batch,
    )
    emb, cents, dim, path = layout
    queries = emb.filter(F.col("vec_id") < 3).select("vec_id", "embedding")

    def _rows(df):
        return sorted((r.query_id, r.vec_id, int(r.cluster),
                       repr(r.cosine), r.rank) for r in df.collect())

    below = ivf_probe_pruned_batch(spark, path, queries, cents, dim,
                                   NPROBE, TOPK, literal_max=3)
    above = ivf_probe_pruned_batch(spark, path, queries, cents, dim,
                                   NPROBE, TOPK, literal_max=2)
    assert _rows(below) == _rows(above)

    below.collect()
    plan_b = below._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[cluster#\d+ IN \(", plan_b), \
        plan_b                                  # literal mode fired
    above.collect()
    plan_a = above._jdf.queryExecution().executedPlan().toString()
    # plan mode over a MANIFESTED layout (r9): file discovery is
    # manifest-bounded, so the scan carries the literal probed union
    # too - but the probe planning ran distributed (no query collect).
    assert re.search(r"PartitionFilters: \[cluster#\d+ IN \(", plan_a), \
        plan_a                                  # manifest pruning fired


def test_build_routes_one_file_per_cluster(spark, layout):
    """The VERDICT-r6 build fix: `repartition` on the cluster id before
    `partitionBy` routes each posting list to one write task, so each
    cluster directory holds exactly ONE parquet file (the old build
    emitted a file per task per cluster - W x k small files, and the
    super-linear 300x wall). files_per_cluster=2 salts each list across
    at most two files for the posting-list-exceeds-one-task scale."""
    import glob
    import os

    emb, cents, dim, path = layout
    for fpc, bound in ((1, 1), (2, 2)):
        p = tempfile.mkdtemp(prefix="ivf_files_") + "/emb"
        write_ivf_layout(emb, cents, dim, p, files_per_cluster=fpc)
        dirs = glob.glob(p + "/cluster=*")
        assert dirs
        for d in dirs:
            n = len(glob.glob(os.path.join(d, "*.parquet")))
            assert 1 <= n <= bound, (d, n)
        # same content as the fixture layout regardless of routing
        got = sorted((r.vec_id, int(r.cluster))
                     for r in spark.read.parquet(p)
                     .select("vec_id", "cluster").collect())
        want = sorted((r.vec_id, int(r.cluster))
                      for r in spark.read.parquet(path)
                      .select("vec_id", "cluster").collect())
        assert got == want
        shutil.rmtree(os.path.dirname(p), ignore_errors=True)


def test_dynamic_partition_pruning_fires_on_candidate_join(spark, layout):
    """The batch path when probe ids are a PLAN, not literals: joining
    the layout against the broadcast (filtered) candidate relation on
    the partition column plans a dynamicpruningexpression partition
    filter - the scan prunes with the runtime broadcast values instead
    of listing every cluster directory."""
    emb, cents, dim, path = layout
    corpus = spark.read.parquet(path)
    queries = emb.filter(F.col("vec_id") < 4).select("vec_id", "embedding")
    cand = (kmeans_transform_topn(queries, cents, dim, n=NPROBE)
            .select(F.col("vec_id").alias("query_id"), "cluster"))
    j = corpus.join(F.broadcast(cand), "cluster")
    j.collect()
    plan = j._jdf.queryExecution().executedPlan().toString()
    filters = re.findall(r"PartitionFilters: \[[^\]]*\]", plan)
    assert any("dynamicpruning" in f for f in filters), plan


def test_append_delta_visible_with_pruning_intact(spark):
    """append_to_ivf_layout (the daily-ingest seam): delta rows land
    in their frozen-model cluster directories via partition append,
    standing rows' files and cluster ids are untouched, and a probe
    for a delta vector still prunes AND finds the new row."""
    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        append_to_ivf_layout,
    )
    emb = load_table(spark, SF_DIR, "embeddings")
    standing = emb.filter("vec_id >= 10")
    delta = emb.filter("vec_id < 10")
    cents, dim = kmeans_fit(standing, k=K, iters=ITERS)
    root = tempfile.mkdtemp(prefix="ivf_append_")
    path = root + "/emb"
    write_ivf_layout(standing, cents, dim, path)
    before = {r.vec_id: int(r.cluster) for r in
              spark.read.parquet(path)
              .select("vec_id", "cluster").collect()}
    append_to_ivf_layout(delta, cents, dim, path)
    after = {r.vec_id: int(r.cluster) for r in
             spark.read.parquet(path)
             .select("vec_id", "cluster").collect()}

    assert all(after[v] == c for v, c in before.items())
    frozen = {r.vec_id: int(r.cluster) for r in
              kmeans_transform(delta, cents, dim).collect()}
    assert {v: after[v] for v in frozen} == frozen
    assert len(after) == len(before) + len(frozen)

    qv = [float(x) for x in
          delta.filter("vec_id = 0").select("embedding").first()[0]]
    hits = ivf_probe_pruned(spark, path, qv, cents, NPROBE, 1).collect()
    # identical vector -> cosine 1.0, ties break to the lowest vec_id
    assert hits and hits[0].vec_id == 0
    shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------
# Two-level (hierarchical) layout - the r7 index-BUILD scale fix
# ---------------------------------------------------------------------

K1, K2 = 3, 3


@pytest.fixture(scope="module")
def hier_layout(spark):
    from etl_pipeline_mini_project_01_spark.operators.kmeans import (
        kmeans_fit_twolevel,
    )
    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        write_ivf_layout_twolevel,
    )
    emb = load_table(spark, SF_DIR, "embeddings")
    cc, fi, dim = kmeans_fit_twolevel(emb, K1, K2, 1, 1)
    path = tempfile.mkdtemp(prefix="ivf_hier_") + "/embeddings"
    write_ivf_layout_twolevel(emb, cc, fi, K2, dim, path)
    yield emb, cc, fi, dim, path
    shutil.rmtree(path, ignore_errors=True)


def test_hier_probe_prunes_with_literal_partition_filter(spark,
                                                         hier_layout):
    """The two-level probe pushes its leaf list as a planning-time
    literal IN: the scan's PartitionFilters carry it, the executed
    numPartitions equals the probed-leaf count, and the candidate join
    never degenerates to a cartesian/BNLJ."""
    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        ivf_probe_pruned_batch_twolevel,
        probe_clusters_twolevel,
    )
    emb, cc, fi, dim, path = hier_layout
    queries = (emb.filter("vec_id < 4")
               .select("vec_id", "embedding").localCheckpoint())
    # AQE wraps the executed plan in AdaptiveSparkPlan, hiding the scan
    # leaf from collectLeaves; the pruning property under test is
    # planning-time (the literal IN), so measure it non-adaptively.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = ivf_probe_pruned_batch_twolevel(
            spark, path, queries, cc, fi, K2, dim,
            nprobe=NPROBE, k=TOPK, nprobe_coarse=2)
        metrics, plan = _scan_metrics(df)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    m = re.search(r"PartitionFilters: \[[^\]]*\]", plan)
    assert m and "cluster" in m.group(0) and "IN" in m.group(0), plan
    leaves = {lf for r in queries.collect()
              for lf in probe_clusters_twolevel(
                  list(r.embedding), cc, fi, K2, NPROBE, 2)}
    assert metrics["numPartitions"] == len(leaves)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_hier_probe_equals_inmemory_twolevel_math(spark, hier_layout):
    """Partitioned-parquet round-trip must not change answers: the
    layout probe's (query, vec, cluster, cosine-repr, rank) rows equal
    the identical probe math over the never-written two-level
    assignment of the in-memory frame."""
    from pyspark.sql import Window
    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        ivf_probe_pruned_batch_twolevel,
        probe_clusters_twolevel,
    )
    from etl_pipeline_mini_project_01_spark.operators.kmeans import (
        kmeans_transform_twolevel,
    )
    from etl_pipeline_mini_project_01_spark.operators.semdedup import (
        normalized_vectors,
        pair_dot,
    )
    emb, cc, fi, dim, path = hier_layout
    queries = (emb.filter("vec_id < 4")
               .select("vec_id", "embedding").localCheckpoint())
    got = sorted(
        (r.query_id, r.vec_id, int(r.cluster), repr(r.cosine), r.rank)
        for r in ivf_probe_pruned_batch_twolevel(
            spark, path, queries, cc, fi, K2, dim,
            nprobe=NPROBE, k=TOPK, nprobe_coarse=2).collect())

    pairs = [(r.vec_id, lf) for r in queries.collect()
             for lf in probe_clusters_twolevel(
                 list(r.embedding), cc, fi, K2, NPROBE, 2)]
    cand = spark.createDataFrame(pairs, "query_id bigint, cluster int")
    qv = (normalized_vectors(queries, "vec_id", "embedding")
          .select(F.col("vec_id").alias("query_id"),
                  F.col("nv").alias("qnv")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    mem = (kmeans_transform_twolevel(emb, cc, fi, dim)
           .withColumn("cluster", F.col("coarse") * K2 + F.col("fine"))
           .join(emb.select("vec_id", "embedding"), "vec_id")
           .join(F.broadcast(cand.withColumn(
               "cluster", F.col("cluster").cast("bigint"))), "cluster")
           .filter(F.col("vec_id") != F.col("query_id"))
           .withColumn("_n2", F.aggregate(
               "embedding", F.lit(0.0),
               lambda a, v: a + v.cast("double") * v.cast("double")))
           .withColumn("nv", F.transform(
               "embedding", lambda x: x.cast("double") / F.sqrt("_n2")))
           .join(F.broadcast(qv), "query_id")
           .withColumn("cosine", pair_dot("qnv", "nv"))
           .withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= TOPK)
           .select("query_id", "vec_id", "cluster", "cosine", "rank"))
    want = sorted(
        (r.query_id, r.vec_id, int(r.cluster), repr(r.cosine), r.rank)
        for r in mem.collect())
    assert got == want and got


def test_hier_leaf_ids_match_twolevel_assignment(spark, hier_layout):
    """Every stored row's leaf partition equals coarse*k2 + fine of the
    frozen two-level model - the build's carried-through assignment is
    the model's assignment (no drift between build kernel and
    transform kernel)."""
    from etl_pipeline_mini_project_01_spark.operators.kmeans import (
        kmeans_transform_twolevel,
    )
    emb, cc, fi, dim, path = hier_layout
    got = {r.vec_id: int(r.cluster) for r in
           spark.read.parquet(path).select("vec_id", "cluster").collect()}
    want = {r.vec_id: int(r.coarse) * K2 + int(r.fine) for r in
            kmeans_transform_twolevel(emb, cc, fi, dim).collect()}
    assert got == want


def test_hier_probe_recall_floor_vs_flat_k(spark, hier_layout):
    """The hierarchy trades probe freedom (leaves restricted to the
    visited coarse cells) for the n*sqrt(k) build; on the fixture the
    recall@5 vs exhaustive truth must stay a useful index
    (nprobe_coarse=2 of 3 coarse cells, 4 of ~9 leaves)."""
    from pyspark.sql import Window
    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        ivf_probe_pruned_batch_twolevel,
    )
    from etl_pipeline_mini_project_01_spark.operators.semdedup import (
        normalized_vectors,
        pair_dot,
    )
    emb, cc, fi, dim, path = hier_layout
    queries = (emb.filter("vec_id < 10")
               .select("vec_id", "embedding").localCheckpoint())
    got = ivf_probe_pruned_batch_twolevel(
        spark, path, queries, cc, fi, K2, dim,
        nprobe=4, k=TOPK, nprobe_coarse=2).collect()
    qv = (normalized_vectors(queries, "vec_id", "embedding")
          .select(F.col("vec_id").alias("query_id"),
                  F.col("nv").alias("qnv")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    truth = (normalized_vectors(emb, "vec_id", "embedding")
             .crossJoin(F.broadcast(qv))
             .filter(F.col("vec_id") != F.col("query_id"))
             .withColumn("cosine", pair_dot("qnv", "nv"))
             .withColumn("rank", F.row_number().over(w))
             .filter(F.col("rank") <= TOPK)
             .select("query_id", "vec_id").collect())
    by_q, tr_q = {}, {}
    for r in got:
        by_q.setdefault(r.query_id, set()).add(r.vec_id)
    for r in truth:
        tr_q.setdefault(r.query_id, set()).add(r.vec_id)
    recall = sum(len(by_q.get(q, set()) & tr_q[q]) / TOPK
                 for q in tr_q) / len(tr_q)
    assert recall >= 0.4, recall


def test_hier_build_rejects_oversized_fine_list(spark):
    """The nominal k2 is the leaf-numbering stride; a fine list longer
    than it would alias another coarse cell's leaves."""
    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        write_ivf_layout_twolevel,
    )
    emb = load_table(spark, SF_DIR, "embeddings")
    with pytest.raises(ValueError, match="exceeds the nominal k2"):
        write_ivf_layout_twolevel(
            emb, [[0.0] * 64], [[[0.0] * 64] * 3], 2, 64, "/tmp/never")


def test_hier_distributed_probe_kernel_matches_driver_math(spark,
                                                           hier_layout):
    """kmeans_transform_topn_twolevel (the VERDICT r7 #4 distributed
    planning path) must pick exactly the leaves probe_clusters_twolevel
    picks, in the same order - same fold arithmetic, same stable ties,
    same empty-cell fallback."""
    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        probe_clusters_twolevel,
    )
    from etl_pipeline_mini_project_01_spark.operators.kmeans import (
        kmeans_transform_topn_twolevel,
    )
    emb, cc, fi, dim, path = hier_layout
    qs = emb.filter("vec_id < 8").select("vec_id", "embedding")
    dist = kmeans_transform_topn_twolevel(qs, cc, fi, K2, dim,
                                          n=NPROBE, nprobe_coarse=2)
    by_q = {}
    for r in dist.collect():
        by_q.setdefault(r.vec_id, {})[r.probe_rank] = int(r.cluster)
    for r in qs.collect():
        want = probe_clusters_twolevel(list(r.embedding), cc, fi, K2,
                                       NPROBE, 2)
        got = [by_q[r.vec_id][i] for i in sorted(by_q[r.vec_id])]
        assert got == want, r.vec_id


def test_hier_batch_probe_literal_equals_plan_across_threshold(
        spark, hier_layout):
    """The flat probe's guard, re-instantiated for the two-level path
    (VERDICT r7 #4): probe_lists='literal' and the new distributed
    'plan' mode must return EXACT same rows, auto must flip between
    them at literal_max, and the plan mode's executed scan must carry
    the probed-union partition filter (manifest-pruned since r9) - no
    unconditional query-vector collect anywhere in the plan path."""
    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        ivf_probe_pruned_batch_twolevel,
    )
    emb, cc, fi, dim, path = hier_layout
    queries = (emb.filter("vec_id < 3")
               .select("vec_id", "embedding").localCheckpoint())

    def _rows(df):
        return sorted((r.query_id, r.vec_id, int(r.cluster),
                       repr(r.cosine), r.rank) for r in df.collect())

    lit = ivf_probe_pruned_batch_twolevel(
        spark, path, queries, cc, fi, K2, dim, NPROBE, TOPK,
        nprobe_coarse=2, probe_lists="literal")
    pln = ivf_probe_pruned_batch_twolevel(
        spark, path, queries, cc, fi, K2, dim, NPROBE, TOPK,
        nprobe_coarse=2, probe_lists="plan")
    assert _rows(lit) == _rows(pln) and _rows(lit)

    # auto: below threshold -> literal IN; above -> plan/DPP
    below = ivf_probe_pruned_batch_twolevel(
        spark, path, queries, cc, fi, K2, dim, NPROBE, TOPK,
        nprobe_coarse=2, literal_max=3)
    above = ivf_probe_pruned_batch_twolevel(
        spark, path, queries, cc, fi, K2, dim, NPROBE, TOPK,
        nprobe_coarse=2, literal_max=2)
    assert _rows(below) == _rows(above) == _rows(lit)
    below.collect()
    plan_b = below._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[cluster#\d+ IN \(", plan_b), \
        plan_b
    above.collect()
    plan_a = above._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[cluster#\d+ IN \(", plan_a), \
        plan_a                                  # manifest pruning fired


def test_layout_manifest_matches_listing(spark, layout):
    """The metastore seam (VERDICT r8 #8): the manifest committed at
    write time must name EXACTLY the data files a directory listing
    finds - per cluster, relative paths - and survive an append as a
    new version covering the union."""
    import os

    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        manifest_clusters,
    )

    _, _, _, path = layout

    def _listing():
        out = {}
        for entry in sorted(os.listdir(path)):
            if not entry.startswith("cluster="):
                continue
            c = int(entry.split("=", 1)[1])
            out[c] = sorted(
                f"{entry}/{f}" for f in os.listdir(os.path.join(path, entry))
                if f.endswith(".parquet") and not f.startswith(("_", ".")))
        return out

    assert manifest_clusters(path) == _listing()


def test_plan_mode_dpp_fallback_without_manifest(spark, layout):
    """A pre-manifest layout (or a manifest service the driver cannot
    reach) must keep the r8 behavior: plan mode's candidate join seeds
    RUNTIME partition pruning via the broadcast distinct-cluster
    semi-join, and returns the same rows."""
    import os
    import shutil as sh
    import tempfile as tf

    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        MANIFEST_SUBDIR,
        ivf_probe_pruned_batch,
        manifest_clusters,
    )

    emb, cents, dim, path = layout
    queries = emb.filter(F.col("vec_id") < 3).select("vec_id", "embedding")
    want = sorted((r.query_id, r.vec_id, int(r.cluster), repr(r.cosine),
                   r.rank)
                  for r in ivf_probe_pruned_batch(
                      spark, path, queries, cents, dim, NPROBE, TOPK,
                      probe_lists="plan").collect())

    bare = tf.mkdtemp(prefix="ivf_nomanifest_") + "/embeddings"
    sh.copytree(path, bare)
    sh.rmtree(os.path.join(bare, MANIFEST_SUBDIR))
    assert manifest_clusters(bare) is None
    out = ivf_probe_pruned_batch(spark, bare, queries, cents, dim,
                                 NPROBE, TOPK, probe_lists="plan")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert any("dynamicpruning" in f for f in
               re.findall(r"PartitionFilters: \[[^\]]*\]", plan)), plan
    got = sorted((r.query_id, r.vec_id, int(r.cluster), repr(r.cosine),
                  r.rank) for r in out.collect())
    assert got == want
    sh.rmtree(os.path.dirname(bare), ignore_errors=True)


def test_manifest_serves_scheme_qualified_paths(spark, tmp_path):
    """VERDICT r9 #2 (supersedes the r8 decline-on-scheme rule): a
    URI-scheme path routes the manifest IO through the session's
    Hadoop FileSystem client instead of declining. Committing on the
    plain path and reading through the ``file://`` form of the SAME
    directory (and vice versa) must be behavior-identical - that is
    the JVM code path hdfs://s3a:// take. The single-slash
    ``file:/...`` normalization Spark emits must work too (ADVICE
    r9)."""
    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        commit_layout_manifest,
        manifest_clusters,
    )

    root = tmp_path / "scheme_layout"
    (root / "cluster=0").mkdir(parents=True)
    (root / "cluster=1").mkdir()
    for c in (0, 1):
        (root / f"cluster={c}" / "part-000.parquet").write_bytes(b"")
        import pyarrow as pa
        import pyarrow.parquet as pq
        pq.write_table(pa.table({"vec_id": [c]}),
                       root / f"cluster={c}" / "part-000.parquet")

    v = commit_layout_manifest(spark, f"file://{root}")
    assert v == 1
    plain = manifest_clusters(str(root))
    via_uri = manifest_clusters(f"file://{root}")
    via_single_slash = manifest_clusters(f"file:{root}")
    assert plain == via_uri == via_single_slash
    assert sorted(plain) == [0, 1]
    assert plain[0] == ["cluster=0/part-000.parquet"]


def test_float_plan_mode_no_broadcast_on_query_side(spark, layout):
    """VERDICT r8 #3 for the FLOAT layout's shared probe tail: plan
    mode carries no broadcast hints on the |Q|-sized relations. With
    auto-broadcast disabled, the manifested path plans zero broadcast
    joins; the manifest-less fallback exactly the one LeftSemi
    (distinct probed clusters, the DPP seed)."""
    import os
    import shutil as sh
    import tempfile as tf

    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        MANIFEST_SUBDIR,
        ivf_probe_pruned_batch,
    )

    emb, cents, dim, path = layout
    queries = emb.filter(F.col("vec_id") < 3).select("vec_id", "embedding")
    conf = spark.conf
    saved = {k: conf.get(k, None) for k in
             ("spark.sql.autoBroadcastJoinThreshold",
              "spark.sql.adaptive.autoBroadcastJoinThreshold")}
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        pln = ivf_probe_pruned_batch(spark, path, queries, cents, dim,
                                     NPROBE, TOPK, probe_lists="plan")
        plan = pln._jdf.queryExecution().sparkPlan().toString()
        assert "Broadcast" not in plan, plan       # manifested path

        bare = tf.mkdtemp(prefix="ivf_guard_bare_") + "/embeddings"
        sh.copytree(path, bare)
        sh.rmtree(os.path.join(bare, MANIFEST_SUBDIR))
        pln2 = ivf_probe_pruned_batch(spark, bare, queries, cents, dim,
                                      NPROBE, TOPK, probe_lists="plan")
        plan2 = pln2._jdf.queryExecution().sparkPlan().toString()
        assert plan2.count("BroadcastHashJoin") == 1, plan2
        assert "LeftSemi" in plan2, plan2
        sh.rmtree(os.path.dirname(bare), ignore_errors=True)
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_serving_probe_uses_bounded_discovery(spark, layout):
    """ivf_probe_pruned (the single-query serving path) resolves its
    files from the manifest: the scan's InMemoryFileIndex holds only
    the probed clusters' files, and results equal the full-listing
    read."""
    import os

    emb, cents, dim, path = layout
    qv = [float(v) for v in
          emb.filter("vec_id = 0").select("embedding").first()[0]]
    out = ivf_probe_pruned(spark, path, qv, cents, NPROBE, TOPK)
    probes = set(probe_clusters(qv, cents, NPROBE))
    assert {int(r.cluster) for r in out.collect()} <= probes
    # file discovery bounded: the scan's file index holds exactly the
    # probed directories' data files (inputFiles reflects discovery,
    # not the later partition filter)
    scanned = sorted(f.split("cluster=", 1)[1] for f in out.inputFiles())
    want = sorted(
        f"{c}/{f}" for c in probes
        for f in os.listdir(os.path.join(path, f"cluster={c}"))
        if f.endswith(".parquet") and not f.startswith(("_", ".")))
    assert scanned == want, (scanned, want)


def test_append_manifest_commit_is_incremental(spark, monkeypatch):
    """The daily-append manifest commit re-lists ONLY the touched
    cluster directories (the previous manifest carries the rest) and
    the merged manifest equals what a full listing would produce."""
    import os as _os

    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        append_to_ivf_layout,
        manifest_clusters,
        write_ivf_layout,
    )
    from etl_pipeline_mini_project_01_spark.operators import ivf_layout

    emb = load_table(spark, SF_DIR, "embeddings")
    standing = emb.filter("vec_id >= 10")
    delta = emb.filter("vec_id < 10").localCheckpoint()
    cents, dim = kmeans_fit(standing, k=K, iters=ITERS)
    root = tempfile.mkdtemp(prefix="ivf_incrmf_")
    path = root + "/emb"
    write_ivf_layout(standing, cents, dim, path)

    touched = {int(r.cluster) for r in
               kmeans_transform(delta, cents, dim)
               .select("cluster").distinct().collect()}
    listed: list[str] = []
    real_listdir = _os.listdir

    def spy_listdir(p):
        listed.append(str(p))
        return real_listdir(p)

    monkeypatch.setattr(ivf_layout.os, "listdir", spy_listdir)
    append_to_ivf_layout(delta, cents, dim, path)
    monkeypatch.undo()

    # only touched cluster dirs were listed (manifest internals aside)
    cluster_listings = {e.rsplit("cluster=", 1)[1] for e in listed
                        if "cluster=" in e}
    assert cluster_listings == {str(c) for c in touched}, (
        cluster_listings, touched)

    # merged manifest == a from-scratch full listing
    def _full_listing():
        out = {}
        for entry in sorted(real_listdir(path)):
            if not entry.startswith("cluster="):
                continue
            c = int(entry.split("=", 1)[1])
            out[c] = sorted(
                f"{entry}/{f}"
                for f in real_listdir(_os.path.join(path, entry))
                if f.endswith(".parquet") and not f.startswith(("_", ".")))
        return out

    assert manifest_clusters(path) == _full_listing()
    shutil.rmtree(root, ignore_errors=True)
