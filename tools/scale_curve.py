"""Scale-curve harness (VERDICT r3 #7): measure the heavyweight
flagships - distributed k-means, SemDeDup (flat AND two-level),
the end-to-end training-mix chain, substring-span dedup, and the
multi-table LSH ANN - at 1x (sf0.1) and Nx (synthesized), so the
sub-quadratic design claims are MEASURED, not asserted.

Blow-up construction (deterministic, duplication-rate preserving):
  * documents: each source doc becomes N replicas with distinct doc_ids
    (doc_id * N + r). Replica 0 keeps the original text; replicas r>0
    suffix every odd-position token with `_r`, so every 3-gram shingle
    of a replica contains at least one salted token - replicas of the
    SAME doc share no shingles across r, while the fixture's planted
    near-dup PAIRS stay near-dups within every replica (both members
    get the same transformation). Near-dup pair count therefore scales
    LINEARLY with N (the honest corpus-growth model); naive text
    duplication would instead make every replica family an N-clique and
    grow the pair graph quadratically in N - measuring that would test
    the fixture, not the operator.
  * embeddings: vec_id * N + r, each component nudged by a replica- and
    dim-dependent epsilon (r * 1e-3 * ((dim % 7) - 3)) - distinct
    vectors, same overall geometry.

Operating points follow each operator's documented 100 TB rule:
  * k-means: k fixed (8), iters fixed (2) - cost model is O(n * k * d)
    per iteration, so the expectation at Nx is ~Nx wall;
  * SemDeDup: k scales WITH the corpus (8 -> 8N) to hold cluster size
    constant - the module docstring's "choose k so clusters stay
    tractable" contract; expectation ~Nx wall;
  * training mix: LSH + CC + packing, candidate counts linear in the
    (linear) duplication rate; expectation ~Nx wall.

Usage: python tools/scale_curve.py [N]   (default 10)
Writes the synthesized tables under .scratch/scale{N}x/ (gitignored)
and prints one JSON line with per-flagship walls at both scales plus
the wall ratio per flagship (ratio / N <= ~1 means at-or-better-than-
linear scaling at this size).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_pipeline_mini_project_01_spark.catalog import load_table
from etl_pipeline_mini_project_01_spark.operators.kmeans import kmeans_assign
from etl_pipeline_mini_project_01_spark.operators.mix import (
    assemble_training_shards,
)
from etl_pipeline_mini_project_01_spark.operators.semdedup import (
    semdedup,
    semdedup_twolevel,
)
from etl_pipeline_mini_project_01_spark.session import get_spark

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Assignment kernel for the k-means/SemDeDup points. Default 'matmul':
#: the curve measures the PRODUCTION operating point, and at the
#: cluster-size-constant rule k grows with the corpus - the 100x run
#: with the bit-exact 'vectorized' kernel measured 402 s of SemDeDup's
#: 446 s inside assignment alone (k*dim interpreter-dispatched numpy
#: ops per batch), i.e. it measured kernel dispatch overhead, not the
#: operator's scaling shape. Set SPARK_GRAFT_CURVE_KERNEL=vectorized to
#: reproduce that run.
KERNEL = os.environ.get("SPARK_GRAFT_CURVE_KERNEL", "matmul")

#: Hierarchical-quantizer fit depth for the ivf stage (VERDICT r7 #3):
#: the r7 curve ran 1 coarse + 1 fine iteration and the resulting
#: fine-list imbalance made the 300x hier probe wall 15.3 s vs the
#: flat layout's 4.8 s. Extra Lloyd's iterations are the standard
#: mitigation (each fine pass is O(n*sqrt(k)*dim) - the build's 2.8x
#: headroom at 300x pays for them); env-overridable so a curve point
#: can race fit depths.
HIER_ITERS1 = int(os.environ.get("SPARK_GRAFT_HIER_ITERS1", "2"))
HIER_ITERS2 = int(os.environ.get("SPARK_GRAFT_HIER_ITERS2", "2"))


def synthesize(spark, n: int) -> str:
    out = os.path.join(REPO, ".scratch", f"scale{n}x")
    docs = load_table(spark, BASE_SF, "documents")
    r = F.col("r")
    salted = F.concat_ws(" ", F.transform(
        F.split(F.col("text"), r"\s+"),
        lambda w, i: F.when(i % 2 == 1,
                            F.concat(w, F.lit("_"), r.cast("string")))
        .otherwise(w)))
    (docs.crossJoin(spark.range(n).withColumnRenamed("id", "r"))
     .select((F.col("doc_id") * n + r).alias("doc_id"),
             F.when(r == 0, F.col("text")).otherwise(salted).alias("text"),
             *[c for c in docs.columns if c not in ("doc_id", "text")])
     .write.mode("overwrite").parquet(os.path.join(out, "documents.parquet")))

    emb = load_table(spark, BASE_SF, "embeddings")
    nudged = F.transform(
        "embedding",
        lambda v, i: (v.cast("double")
                      + r.cast("double") * 0.001
                      * ((i % 7).cast("double") - 3.0)).cast("float"))
    (emb.crossJoin(spark.range(n).withColumnRenamed("id", "r"))
     .select((F.col("vec_id") * n + r).alias("vec_id"),
             nudged.alias("embedding"),
             *[c for c in emb.columns if c not in ("vec_id", "embedding")])
     .write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet")))
    return out


def _consume(df) -> None:
    """Force FULL computation of every output column. A bare count()
    lets Catalyst prune: a left join on a unique key preserves
    cardinality, so count(final join) can collapse to count(left) and
    skip the entire analysis - the noop sink evaluates all columns of
    every row without collecting them to the driver."""
    df.write.format("noop").mode("overwrite").save()


def run_flagships(spark, sf_dir: str, k_clusters: int,
                  ) -> tuple[dict[str, float], dict[str, bool],
                             dict[str, float]]:
    """(walls, checks, metrics): timings PLUS per-point correctness
    invariants (VERDICT r4 #5 - a wrong-at-scale answer must not hide
    behind a good wall time). Each check is ONE extra aggregation pass
    over the flagship's recomputed lineage, run AFTER the timed consume
    so walls stay comparable with the earlier series:
      * kmeans: every row assigned exactly once, cluster ids in [0, k);
      * semdedup flat/two-level: every nonempty cluster keeps >= 1
        member (the most-peripheral survivor) and kept <= n (funnel
        monotonicity); two-level additionally covers all rows (leaf
        coverage);
      * training mix: output docs <= input docs, and every shard's
        token sum respects the greedy bound sum <= budget + max_doc;
      * substring spans: per-doc span coverage <= token count,
        spans <= windows, fraction in [0, 1];
      * ann: per-query <= top_k results, no self-match, ranks dense
        from 1, plus measured recall@5 vs one brute-force cosine pass
        (5 queries x corpus - linear, so affordable at every point)."""
    from etl_pipeline_mini_project_01_spark.plans.dedup import (
        substring_spans,
    )
    from etl_pipeline_mini_project_01_spark.plans.similarity import (
        ann_multitable_topk,
    )

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    n_emb = emb.count()
    n_docs = docs.count()
    walls: dict[str, float] = {}
    checks: dict[str, bool] = {}
    metrics: dict[str, float] = {}

    km = kmeans_assign(emb, k=8, iters=2, kernel=KERNEL)
    t0 = time.perf_counter()
    _consume(km)
    walls["kmeans_k8_i2"] = round(time.perf_counter() - t0, 3)
    r = km.agg(F.count(F.lit(1)).alias("n"),
               F.min("cluster").alias("lo"),
               F.max("cluster").alias("hi")).collect()[0]
    checks["kmeans_all_assigned_in_range"] = bool(
        r["n"] == n_emb and r["lo"] >= 0 and r["hi"] < 8)

    def _semdedup_check(df, label: str) -> None:
        per = df.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("kept").cast("long")).alias("k"))
        r = per.agg(F.sum("n").alias("rows"),
                    F.sum("k").alias("kept"),
                    F.min("k").alias("min_kept")).collect()[0]
        checks[f"{label}_every_cluster_keeps_one"] = bool(
            r["rows"] == n_emb and r["min_kept"] >= 1
            and 0 < r["kept"] <= n_emb)
        metrics[f"{label}_kept_frac"] = round(r["kept"] / n_emb, 4)

    sd = semdedup(emb, k=k_clusters, iters=2, threshold=0.35,
                  kernel=KERNEL)
    t0 = time.perf_counter()
    _consume(sd)
    walls[f"semdedup_k{k_clusters}"] = round(time.perf_counter() - t0, 3)
    _semdedup_check(sd, "semdedup")

    # The hierarchical bounding device at the same leaf count - the
    # operating rule past k ~ 1e3 (SCALE.md flat-vs-two-level note).
    side = max(2, int(round(k_clusters ** 0.5)))
    sd2 = semdedup_twolevel(emb, k1=side, k2=side, iters1=2, iters2=2,
                            threshold=0.35, kernel=KERNEL)
    t0 = time.perf_counter()
    _consume(sd2)
    walls[f"semdedup2_{side}x{side}"] = round(time.perf_counter() - t0, 3)
    _semdedup_check(sd2, "semdedup2")

    mix = assemble_training_shards(docs, benchmark=None, budget=2048,
                                   num_partitions=8)
    t0 = time.perf_counter()
    _consume(mix)
    walls["training_mix"] = round(time.perf_counter() - t0, 3)
    shard_sums = mix.groupBy("split", "shard").agg(
        F.sum("n_tokens").alias("tok"))
    r = mix.agg(F.count(F.lit(1)).alias("rows"),
                F.max("n_tokens").alias("max_doc")).collect()[0]
    worst = shard_sums.agg(F.max("tok").alias("m")).collect()[0]["m"]
    checks["mix_funnel_and_shard_budget"] = bool(
        0 < r["rows"] <= n_docs
        and worst <= 2048 + int(r["max_doc"]))

    ss = substring_spans(docs)
    t0 = time.perf_counter()
    _consume(ss)
    walls["substring_spans"] = round(time.perf_counter() - t0, 3)
    r = ss.agg(
        F.count(F.lit(1)).alias("rows"),
        F.min(F.col("n_tokens") - F.col("dup_tokens_covered")).alias("slack"),
        F.min(F.col("dup_window_count") - F.col("dup_span_count"))
        .alias("wminus"),
        F.max("dup_fraction").alias("fmax"),
        F.min("dup_fraction").alias("fmin")).collect()[0]
    checks["spans_coverage_within_tokens"] = bool(
        r["rows"] == n_docs and r["slack"] >= 0 and r["wminus"] >= 0
        and 0.0 <= r["fmin"] and r["fmax"] <= 1.0)

    ann = ann_multitable_topk(emb)
    t0 = time.perf_counter()
    _consume(ann)
    walls["ann_topk"] = round(time.perf_counter() - t0, 3)
    per_q = ann.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("rank").alias("maxr"),
        F.sum((F.col("vec_id") == F.col("query_id")).cast("long"))
        .alias("selfhits"))
    r = per_q.agg(F.max("n").alias("n"), F.max("maxr").alias("maxr"),
                  F.sum("selfhits").alias("selfhits"),
                  F.min((F.col("n") == F.col("maxr")).cast("long"))
                  .alias("dense")).collect()[0]
    checks["ann_topk_shape"] = bool(
        r["n"] <= 5 and r["maxr"] <= 5 and r["selfhits"] == 0
        and r["dense"] == 1)
    # Measured recall@5 vs ONE brute-force pass (5 queries x corpus).
    from etl_pipeline_mini_project_01_spark.operators.semdedup import (
        normalized_vectors,
    )
    from pyspark.sql import Window as W_
    nv = normalized_vectors(emb)
    q = F.broadcast(nv.filter(F.col("vec_id") < 5)
                    .select(F.col("vec_id").alias("query_id"),
                            F.col("nv").alias("qv")))
    dot = F.aggregate(F.zip_with("qv", "nv", lambda x, y: x * y),
                      F.lit(0.0), lambda a, v: a + v)
    w = W_.partitionBy("query_id").orderBy(F.desc("_cos"), "vec_id")
    brute = (nv.join(q, F.col("vec_id") != F.col("query_id"))
             .withColumn("_cos", dot)
             .withColumn("_r", F.row_number().over(w))
             .where(F.col("_r") <= 5)
             .select("query_id", "vec_id"))
    hits = brute.join(ann.select("query_id", "vec_id"),
                      ["query_id", "vec_id"], "left_semi").count()
    recall = hits / max(1, brute.count())
    metrics["ann_recall_at_5"] = round(recall, 4)
    checks["ann_recall_floor"] = recall >= 0.2
    return walls, checks, metrics


def run_decontamination(spark, sf_dir: str
                        ) -> tuple[dict[str, float], dict[str, bool]]:
    """VERDICT r5 #5: the bloom-vs-exact crossover measured ON THE
    CURVE, with the same evidence discipline as semdedup's two-level -
    both phases run at every point and the per-point invariant is full
    per-doc equality (two-phase hit counts == one-phase), one extra
    join pass after the timed consumes. The bloom point runs
    audit=False (the production survivor-only join - the registered
    driver row times audit mode instead; see plans/mix.py), releasing
    its persisted probe relation through the cache_handles seam.

    Walls here are session-warm and sensitive to cache/shuffle state
    left by the flagship series (the first r6 run measured exact at
    10x 4x slower in-curve than standalone), so the cache is cleared
    up front and the recorded r6 verdict rests on the STANDALONE
    re-measures in SCALE_CURVE.json - which refuted the local
    "bloom wins at scale" claim; see SCALE.md round-6 notes."""
    spark.catalog.clearCache()
    from etl_pipeline_mini_project_01_spark.operators.decontaminate import (
        bloom_contamination_scores,
        contamination_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 37 == 0).select("text")
    walls: dict[str, float] = {}
    checks: dict[str, bool] = {}

    exact = contamination_scores(docs, bench, n=3)
    t0 = time.perf_counter()
    _consume(exact)
    walls["decon_exact"] = round(time.perf_counter() - t0, 3)

    handles: list = []
    bloom = bloom_contamination_scores(docs, bench, n=3, audit=False,
                                       cache_handles=handles)
    t0 = time.perf_counter()
    _consume(bloom)
    walls["decon_bloom"] = round(time.perf_counter() - t0, 3)

    # r7 (VERDICT r6 #3): the same survivor-only two-phase pipeline
    # with the PURE-JVM probe - BloomFilterAggregate build +
    # BloomFilterMightContain inlined into the scan, zero Arrow
    # transfer - so the race isolates the Python round-trip from the
    # bitmap idea itself.
    jhandles: list = []
    bloom_jvm = bloom_contamination_scores(docs, bench, n=3, audit=False,
                                           cache_handles=jhandles,
                                           probe="jvm")
    t0 = time.perf_counter()
    _consume(bloom_jvm)
    walls["decon_bloom_jvm"] = round(time.perf_counter() - t0, 3)

    def _equals_exact(two_phase) -> bool:
        return (two_phase.select("doc_id",
                                 F.col("doc_ngrams").alias("bg"),
                                 F.col("hit_ngrams").alias("bh"))
                .join(exact.select("doc_id",
                                   F.col("doc_ngrams").alias("eg"),
                                   F.col("hit_ngrams").alias("eh")),
                      "doc_id", "full")
                .filter((F.col("bg") != F.col("eg"))
                        | (F.col("bh") != F.col("eh"))
                        | F.col("bg").isNull() | F.col("eg").isNull())
                .count()) == 0

    checks["decon_two_phase_equals_one_phase"] = _equals_exact(bloom)
    checks["decon_jvm_equals_one_phase"] = _equals_exact(bloom_jvm)
    for h in handles + jhandles:
        h.unpersist()
    return walls, checks


def run_incremental_semdedup(spark, sf_dir: str, k_clusters: int
                             ) -> tuple[dict[str, float],
                                        dict[str, bool]]:
    """E43 on the curve: the STEADY-STATE incremental stage (standing
    verdicts + frozen model passed as artifacts, localCheckpoint-ed
    OUTSIDE the timed window) against the full batch re-run a
    non-incremental pipeline would pay daily. The per-point invariant
    is the operator's own structural theorem, checked at scale: the
    incremental verdicts must EQUAL a batch grouped pass over
    (keepers UNION delta) under the frozen assignment - zero
    disagreement rows - plus count conservation (one row per keeper +
    one per delta member)."""
    from etl_pipeline_mini_project_01_spark.operators.kmeans import (
        kmeans_fit,
        kmeans_transform,
    )
    from etl_pipeline_mini_project_01_spark.operators.semdedup import (
        _semdedup_grouped,
        semdedup_incremental,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    standing = emb.filter("NOT (vec_id % 5 = 0)")
    delta = emb.filter("vec_id % 5 = 0")
    walls: dict[str, float] = {}
    checks: dict[str, bool] = {}

    # untimed bootstrap: the persisted artifacts of the standing corpus
    cents, dim = kmeans_fit(standing, k=k_clusters, iters=2,
                            kernel=KERNEL)
    s_asg = kmeans_transform(standing, cents, dim, kernel=KERNEL)
    s_verd = _semdedup_grouped(
        s_asg.join(standing.select("vec_id", "embedding"), "vec_id"),
        0.35, "vec_id", "embedding", dim).localCheckpoint()

    inc = semdedup_incremental(standing, delta, threshold=0.35,
                               kernel=KERNEL, standing_verdicts=s_verd,
                               model=(cents, dim))
    t0 = time.perf_counter()
    _consume(inc)
    walls["semdedup_incr_stage"] = round(time.perf_counter() - t0, 3)

    full = semdedup(emb, k=k_clusters, iters=2, threshold=0.35,
                    kernel=KERNEL)
    t0 = time.perf_counter()
    _consume(full)
    walls["semdedup_full_rerun"] = round(time.perf_counter() - t0, 3)

    n_delta = delta.count()
    n_keep = s_verd.filter("kept").count()
    inc_ck = inc.localCheckpoint()
    rows = inc_ck.count()
    keepers = (s_verd.filter("kept").select("vec_id")
               .join(s_asg, "vec_id")
               .join(standing.select("vec_id", "embedding"), "vec_id")
               .withColumn("is_delta", F.lit(False)))
    d_pool = (kmeans_transform(delta, cents, dim, kernel=KERNEL)
              .join(delta.select("vec_id", "embedding"), "vec_id")
              .withColumn("is_delta", F.lit(True)))
    cols = ["vec_id", "cluster", "centroid_dist", "embedding", "is_delta"]
    batch = _semdedup_grouped(
        keepers.select(*cols).unionByName(d_pool.select(*cols)),
        0.35, "vec_id", "embedding", dim)
    disagree = (inc_ck.select("vec_id", "cluster", "kept")
                .join(batch.select("vec_id", "cluster",
                                   F.col("kept").alias("bkept")),
                      ["vec_id", "cluster"], "full")
                .filter((F.col("kept") != F.col("bkept"))
                        | F.col("kept").isNull()
                        | F.col("bkept").isNull())
                .count())
    checks["incr_equals_batch_over_pool"] = disagree == 0
    checks["incr_count_conservation"] = rows == n_keep + n_delta
    return walls, checks


#: IVF serving-path operating point (E44): fixed query batch, fixed
#: probe width, fixed top-k - the 100 TB shape is "k lists grow with
#: the corpus, nprobe stays fixed", so the pruned probe reads a
#: ~constant row count while the full-scan control grows Nx.
IVF_N_QUERIES = 20
IVF_NPROBE = 4
IVF_TOP_K = 10
#: Mean recall@10 floor vs full-scan truth (same spirit as the ANN
#: flagship's recall verdict: IVF is approximate BY DESIGN - the floor
#: asserts the approximation stays useful at scale, not exact).
IVF_RECALL_FLOOR = 0.6


def run_ivf_layout(spark, sf_dir: str, k_lists: int,
                   check_equality: bool
                   ) -> tuple[dict[str, float], dict[str, bool],
                              dict[str, float]]:
    """E44 on the curve: the cluster-partitioned IVF layout serving
    path. Untimed bootstrap = model fit + the partitionBy(cluster)
    layout write (the one-time index build; its wall is reported as a
    metric, not a pair). Timed series: (a) `ivf_probe_pruned_batch`
    over the layout - the DPP-pruned scan - and (b) the full-scan
    brute-force top-k a layout-less engine would pay for the same
    query batch. Per-point invariants: every query returns exactly
    IVF_TOP_K rows from <= IVF_NPROBE distinct clusters; mean
    recall@k vs the full-scan truth >= IVF_RECALL_FLOOR; and (at the
    base point) the layout probe's rows EQUAL the identical probe math
    over the never-written in-memory frame - the parquet round-trip
    through the partitioned layout preserves every float."""
    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        ivf_probe_pruned_batch,
        write_ivf_layout,
    )
    from etl_pipeline_mini_project_01_spark.operators.kmeans import (
        kmeans_fit,
        kmeans_transform,
        kmeans_transform_topn,
    )
    from etl_pipeline_mini_project_01_spark.operators.semdedup import (
        normalized_vectors,
        pair_dot,
    )
    from pyspark.sql import Window

    walls: dict[str, float] = {}
    checks: dict[str, bool] = {}
    metrics: dict[str, float] = {}

    emb = load_table(spark, sf_dir, "embeddings")
    queries = (emb.select("vec_id", "embedding")
               .orderBy("vec_id").limit(IVF_N_QUERIES).localCheckpoint())

    t0 = time.perf_counter()
    cents, dim = kmeans_fit(emb, k=k_lists, iters=1, kernel=KERNEL)
    path = os.path.join(REPO, ".scratch",
                        f"ivf_layout_{os.path.basename(sf_dir)}_{k_lists}")
    write_ivf_layout(emb, cents, dim, path, kernel=KERNEL)
    metrics["ivf_index_build_sec"] = round(time.perf_counter() - t0, 3)

    # r7: the hierarchical build - same leaf count (k1*k2 ~ k_lists),
    # O(n*sqrt(k)) instead of O(n*k) - raced on the same corpus, plus
    # its own probe wall and recall vs the SAME full-scan truth. This
    # is the series that answers whether the flat build's super-
    # linearity (unchanged by the r6 self-join/file-routing fix) is
    # the quantizer's k ~ n term: the hier points should track ~n^1.5.
    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        ivf_probe_pruned_batch_twolevel,
        write_ivf_layout_twolevel,
    )
    from etl_pipeline_mini_project_01_spark.operators.kmeans import (
        kmeans_fit_twolevel,
    )
    k12 = max(2, int(round(k_lists ** 0.5)))
    hpath = path + "_hier"
    t0 = time.perf_counter()
    cc, fi, hdim = kmeans_fit_twolevel(emb, k12, k12,
                                       HIER_ITERS1, HIER_ITERS2,
                                       kernel=KERNEL)
    write_ivf_layout_twolevel(emb, cc, fi, k12, hdim, hpath,
                              kernel=KERNEL)
    metrics["ivf_hier_build_sec"] = round(time.perf_counter() - t0, 3)

    hier = ivf_probe_pruned_batch_twolevel(
        spark, hpath, queries, cc, fi, k12, hdim,
        nprobe=IVF_NPROBE, k=IVF_TOP_K, nprobe_coarse=IVF_NPROBE,
        kernel=KERNEL)
    t0 = time.perf_counter()
    _consume(hier)
    walls["ivf_probe_hier"] = round(time.perf_counter() - t0, 3)
    # Warm re-run: the r8 investigation showed the single-shot probe
    # wall is dominated by one-time state (partition discovery of ~k
    # directories at plan build, first-job JIT/GC after the big layout
    # writes) - the steady-state serving wall is the SECOND pass, and
    # it is the number the flat-vs-hier comparison is about.
    t0 = time.perf_counter()
    _consume(hier)
    walls["ivf_probe_hier_warm"] = round(time.perf_counter() - t0, 3)

    # Probed-leaf imbalance (VERDICT r7 #3): the hier probe's scan cost
    # is the PROBED posting lists' total size; a 1-iteration fine fit
    # left probed leaves several times the mean. One k-sized groupBy
    # (control-plane) + the queries' driver-side probe union.
    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        probe_clusters_twolevel,
    )
    sizes = {int(r["cluster"]): int(r["n"]) for r in
             (spark.read.parquet(hpath).groupBy("cluster")
              .agg(F.count(F.lit(1)).alias("n")).collect())}
    probed_union = sorted({
        lf for r in queries.collect()
        for lf in probe_clusters_twolevel(list(r["embedding"]), cc, fi,
                                          k12, IVF_NPROBE, IVF_NPROBE)})
    mean_sz = sum(sizes.values()) / max(1, len(sizes))
    probed_sz = [sizes.get(lf, 0) for lf in probed_union]
    metrics["ivf_hier_leaf_mean"] = round(mean_sz, 1)
    metrics["ivf_hier_probed_max_over_mean"] = round(
        max(probed_sz) / mean_sz, 2) if probed_sz else 0.0
    metrics["ivf_hier_probed_rows"] = int(sum(probed_sz))

    pruned = ivf_probe_pruned_batch(spark, path, queries, cents, dim,
                                    nprobe=IVF_NPROBE, k=IVF_TOP_K,
                                    kernel=KERNEL)
    t0 = time.perf_counter()
    _consume(pruned)
    walls["ivf_probe_layout"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    _consume(pruned)
    walls["ivf_probe_layout_warm"] = round(time.perf_counter() - t0, 3)

    qv = (normalized_vectors(queries, "vec_id", "embedding")
          .select(F.col("vec_id").alias("query_id"),
                  F.col("nv").alias("qnv")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    fullscan = (normalized_vectors(emb, "vec_id", "embedding")
                .crossJoin(F.broadcast(qv))
                .filter(F.col("vec_id") != F.col("query_id"))
                .withColumn("cosine", pair_dot("qnv", "nv", KERNEL))
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= IVF_TOP_K)
                .select("query_id", "vec_id", "cosine", "rank"))
    t0 = time.perf_counter()
    _consume(fullscan)
    walls["ivf_probe_fullscan"] = round(time.perf_counter() - t0, 3)

    # ---- invariants (control-plane sized: N_QUERIES * TOP_K rows) ----
    prows = pruned.collect()
    trows = fullscan.collect()
    hrows = hier.collect()
    by_q: dict[int, set[int]] = {}
    clus: dict[int, set[int]] = {}
    for r in prows:
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
        clus.setdefault(r["query_id"], set()).add(r["cluster"])
    truth: dict[int, set[int]] = {}
    for r in trows:
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    checks["ivf_rowcount_structure"] = bool(
        len(by_q) == IVF_N_QUERIES
        and all(len(v) == IVF_TOP_K for v in by_q.values())
        and all(len(c) <= IVF_NPROBE for c in clus.values()))
    recall = (sum(len(by_q[q] & truth[q]) / IVF_TOP_K for q in by_q)
              / len(by_q)) if by_q else 0.0
    metrics["ivf_recall_at_k"] = round(recall, 4)
    checks["ivf_recall_floor"] = recall >= IVF_RECALL_FLOOR

    h_q: dict[int, set[int]] = {}
    h_cl: dict[int, set[int]] = {}
    for r in hrows:
        h_q.setdefault(r["query_id"], set()).add(r["vec_id"])
        h_cl.setdefault(r["query_id"], set()).add(r["cluster"])
    checks["ivf_hier_rowcount_structure"] = bool(
        len(h_q) == IVF_N_QUERIES
        and all(len(v) == IVF_TOP_K for v in h_q.values())
        and all(len(c) <= IVF_NPROBE for c in h_cl.values()))
    h_recall = (sum(len(h_q[q] & truth[q]) / IVF_TOP_K for q in h_q)
                / len(h_q)) if h_q else 0.0
    metrics["ivf_hier_recall_at_k"] = round(h_recall, 4)
    checks["ivf_hier_recall_floor"] = h_recall >= IVF_RECALL_FLOOR

    # VERDICT r8 #7: the hier recall residual (0.95 vs the flat
    # layout's 1.0 at 300x). Hypothesis: COARSE-CELL STRADDLE - a true
    # neighbor's leaf can live under a coarse cell the query never
    # visits, no matter which nprobe leaves are picked from the
    # visited cells. Race nprobe_coarse upward at FIXED nprobe (the
    # probed row count stays ~nprobe leaves - only the candidate cell
    # set from which leaves are picked widens; the extra planning cost
    # is (npc-4)*k2*dim driver math per query). If recall climbs with
    # npc at flat probed rows, the residual is the straddle and
    # nprobe_coarse is the serving knob that buys it back.
    qrows_v = [list(r["embedding"]) for r in queries.collect()]
    for npc in (IVF_NPROBE, IVF_NPROBE + 2, IVF_NPROBE + 4):
        hn = ivf_probe_pruned_batch_twolevel(
            spark, hpath, queries, cc, fi, k12, hdim,
            nprobe=IVF_NPROBE, k=IVF_TOP_K, nprobe_coarse=npc,
            kernel=KERNEL)
        n_q: dict[int, set[int]] = {}
        for r in hn.collect():
            n_q.setdefault(r["query_id"], set()).add(r["vec_id"])
        npc_recall = (sum(len(n_q.get(q, set()) & truth[q]) / IVF_TOP_K
                          for q in truth) / len(truth)) if truth else 0.0
        probed_rows = sum(
            sizes.get(lf, 0)
            for lf in {l for qv_ in qrows_v
                       for l in probe_clusters_twolevel(
                           qv_, cc, fi, k12, IVF_NPROBE, npc)})
        metrics[f"ivf_hier_recall_npc{npc}"] = round(npc_recall, 4)
        metrics[f"ivf_hier_probed_rows_npc{npc}"] = int(probed_rows)

    if check_equality:
        cand = (kmeans_transform_topn(queries, cents, dim, n=IVF_NPROBE,
                                      kernel=KERNEL)
                .select(F.col("vec_id").alias("query_id"), "cluster"))
        mem = (kmeans_transform(emb, cents, dim, kernel=KERNEL)
               .select("vec_id", "cluster")
               .join(emb.select("vec_id", "embedding"), "vec_id")
               .join(F.broadcast(cand), "cluster")
               .filter(F.col("vec_id") != F.col("query_id"))
               .withColumn("_n2", F.aggregate(
                   "embedding", F.lit(0.0),
                   lambda a, v: a + v.cast("double") * v.cast("double")))
               .withColumn("nv", F.transform(
                   "embedding",
                   lambda x: x.cast("double") / F.sqrt("_n2")))
               .join(F.broadcast(qv), "query_id")
               .withColumn("cosine", pair_dot("qnv", "nv", KERNEL))
               .withColumn("rank", F.row_number().over(
                   Window.partitionBy("query_id")
                   .orderBy(F.desc("cosine"), "vec_id")))
               .filter(F.col("rank") <= IVF_TOP_K)
               .select("query_id", "vec_id", "cluster", "cosine", "rank"))
        a = sorted(((r["query_id"], r["vec_id"], int(r["cluster"]),
                     repr(r["cosine"]), r["rank"]) for r in prows))
        b = sorted(((r["query_id"], r["vec_id"], int(r["cluster"]),
                     repr(r["cosine"]), r["rank"])
                    for r in mem.collect()))
        checks["ivf_layout_equals_inmemory"] = a == b
    # ADVICE r6: the layout duplicates the corpus on disk (at 300x,
    # ~600k vectors per (sf, k) key) and the build wall is already
    # captured as a metric - drop the directory instead of accumulating
    # one copy per curve configuration across rounds.
    import shutil
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(hpath, ignore_errors=True)
    return walls, checks, metrics


def run_manifest_index(spark, k_dirs: int = 10_000
                       ) -> tuple[dict[str, bool], dict[str, float]]:
    """VERDICT r8 #8 curve point: the plan-build LISTING term at
    k >= 1e4 cluster directories, with and without the committed file
    manifest. The layout routes the sf0.1 embeddings to k SYNTHETIC
    clusters (vec_id % k - the directory COUNT is the variable under
    test, not assignment quality) through the same repartition routing
    and manifest commit the real builders use. Timed:

      * manifest_commit_sec - the one-time k-directory listing paid AT
        COMMIT (amortized over every probe);
      * probe_discovery_manifest_sec - manifest_clusters (driver-side
        parquet read) + the probed-files spark.read for an
        nprobe-sized union: the serve path's whole file discovery;
      * full_listing_cold/warm_sec - spark.read.parquet(path), the
        k-directory InMemoryFileIndex every manifest-less plan build
        pays (warm = Spark's FileStatusCache hit, the best case a
        long-lived session gets).

    Check: the manifest discovery resolves EXACTLY the files the
    pruned directory listing would."""
    import shutil

    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        _read_probed_dirs,
        commit_layout_manifest,
        manifest_clusters,
    )

    checks: dict[str, bool] = {}
    metrics: dict[str, float] = {"manifest_k_dirs": k_dirs}
    path = os.path.join(REPO, ".scratch", f"manifest_idx_{k_dirs}")
    shutil.rmtree(path, ignore_errors=True)

    emb = load_table(spark, BASE_SF, "embeddings").select("vec_id")
    (emb.withColumn("cluster", F.pmod("vec_id", F.lit(k_dirs)))
     .repartition("cluster")
     .write.partitionBy("cluster").parquet(path))
    t0 = time.perf_counter()
    commit_layout_manifest(spark, path)
    metrics["manifest_commit_sec"] = round(time.perf_counter() - t0, 3)

    probes = [7, 513, 2048, 9999]            # an nprobe-sized union
    t0 = time.perf_counter()
    mf = manifest_clusters(path)
    probed = _read_probed_dirs(spark, path, probes)
    probed.inputFiles()                      # force file resolution
    metrics["probe_discovery_manifest_sec"] = round(
        time.perf_counter() - t0, 3)
    want = sorted(os.path.join(path, f)
                  for c in probes for f in mf.get(c, ()))
    got = sorted(f.replace("file://", "").replace("file:", "")
                 for f in probed.inputFiles())
    checks["manifest_resolves_exact_files"] = got == want

    t0 = time.perf_counter()
    spark.read.parquet(path)
    metrics["full_listing_cold_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    spark.read.parquet(path)
    metrics["full_listing_warm_sec"] = round(time.perf_counter() - t0, 3)

    shutil.rmtree(path, ignore_errors=True)
    return checks, metrics


def run_pq(spark, sf_dir: str, k_lists: int = 8
           ) -> tuple[dict[str, float], dict[str, bool],
                      dict[str, float]]:
    """E47 product quantization on the curve. Untimed-but-reported:
    codebook training (m fits at FIXED ksub - linear in the corpus,
    unlike an IVF list count) and the one-pass encode. Timed race: the
    ADC top-k scan over the m-byte codes vs the full-precision cosine
    scan over the float vectors, same query batch. Per-point
    invariants: PQ recall@k vs the exact scan's truth above a floor
    WITH the exact re-rank tail (the production shape), and the
    on-disk code relation at least 4x smaller than the vectors (the
    memory-residency argument). Operating point m=16/ksub=16 (the
    fixture-measured shape; production m=8..16/ksub=256 compresses
    harder and recalls higher - more codes, finer cells)."""
    from etl_pipeline_mini_project_01_spark.operators.pq import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )
    from etl_pipeline_mini_project_01_spark.operators.semdedup import (
        normalized_vectors,
        pair_dot,
    )
    from pyspark.sql import Window

    spark.catalog.clearCache()
    walls: dict[str, float] = {}
    checks: dict[str, bool] = {}
    metrics: dict[str, float] = {}

    emb = load_table(spark, sf_dir, "embeddings")
    nemb = (emb
            .withColumn("_n2", F.aggregate(
                "embedding", F.lit(0.0),
                lambda a, v: a + v.cast("double") * v.cast("double")))
            .select("vec_id", F.transform(
                "embedding",
                lambda x: (x.cast("double") / F.sqrt("_n2"))
                .cast("float")).alias("embedding"))
            # materialize ONCE: the normalization is an interpreted
            # HOF fold, and the multi-pass fits/encodes downstream
            # would otherwise recompute it per pass - at the 300x
            # point that recomputation dominated the two-level build
            # wall (~12 corpus passes), measuring the harness, not
            # the operator. Production stores the normalized corpus.
            .localCheckpoint())
    queries = (nemb.select("vec_id", "embedding")
               .orderBy("vec_id").limit(IVF_N_QUERIES).localCheckpoint())

    m, ksub = 16, 16
    t0 = time.perf_counter()
    books = pq_train(nemb, m=m, ksub=ksub, iters=1)
    metrics["pq_train_sec"] = round(time.perf_counter() - t0, 3)

    cpath = os.path.join(REPO, ".scratch",
                         f"pq_codes_{os.path.basename(sf_dir)}")
    vpath = os.path.join(REPO, ".scratch",
                         f"pq_vecs_{os.path.basename(sf_dir)}")
    import shutil
    shutil.rmtree(cpath, ignore_errors=True)
    shutil.rmtree(vpath, ignore_errors=True)
    t0 = time.perf_counter()
    pq_encode(nemb, books).write.parquet(cpath)
    metrics["pq_encode_sec"] = round(time.perf_counter() - t0, 3)
    nemb.write.parquet(vpath)

    def _dirsize(d):
        return sum(os.path.getsize(os.path.join(r, f))
                   for r, _, fs in os.walk(d) for f in fs
                   if f.endswith(".parquet"))

    metrics["pq_compression_ratio"] = round(
        _dirsize(vpath) / _dirsize(cpath), 2)

    codes = spark.read.parquet(cpath)
    vecs = spark.read.parquet(vpath)
    adc = pq_adc_topk(codes, queries, books, k=IVF_TOP_K)
    t0 = time.perf_counter()
    _consume(adc)
    walls["pq_adc_scan"] = round(time.perf_counter() - t0, 3)

    rer = pq_adc_topk(codes, queries, books, k=IVF_TOP_K,
                      rerank=10 * IVF_TOP_K, emb=vecs)
    t0 = time.perf_counter()
    _consume(rer)
    walls["pq_adc_rerank_scan"] = round(time.perf_counter() - t0, 3)

    qv = (normalized_vectors(queries, "vec_id", "embedding")
          .select(F.col("vec_id").alias("query_id"),
                  F.col("nv").alias("qnv")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               "vec_id")
    exact = (normalized_vectors(vecs, "vec_id", "embedding")
             .crossJoin(F.broadcast(qv))
             .filter(F.col("vec_id") != F.col("query_id"))
             .withColumn("cosine", pair_dot("qnv", "nv", KERNEL))
             .withColumn("rank", F.row_number().over(w))
             .filter(F.col("rank") <= IVF_TOP_K)
             .select("query_id", "vec_id"))
    t0 = time.perf_counter()
    _consume(exact)
    walls["pq_fullprec_scan"] = round(time.perf_counter() - t0, 3)

    truth: dict[int, set[int]] = {}
    for r in exact.collect():
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])

    def _recall(df):
        by_q: dict[int, set[int]] = {}
        for r in df.collect():
            by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
        return (sum(len(by_q.get(q, set()) & truth[q]) / IVF_TOP_K
                    for q in truth) / len(truth)) if truth else 0.0

    metrics["pq_recall_at_k"] = round(_recall(adc), 4)
    metrics["pq_rerank_recall_at_k"] = round(_recall(rer), 4)
    checks["pq_rerank_recall_floor"] = (
        metrics["pq_rerank_recall_at_k"] >= 0.6)
    checks["pq_compression_at_least_4x"] = (
        metrics["pq_compression_ratio"] >= 4)

    # VERDICT r7 #6: the STORED IVF-PQ composition - cluster
    # directories holding codes, probe prunes partitions AND reads
    # m-byte codes, ADC within probed directories (per-query in-kernel
    # cluster mask), exact re-rank joins back to the float vectors.
    # Timed series = the end-to-end probe; the race partner is
    # pq_adc_rerank_scan above (same rerank, same k, but scanning
    # EVERY code row) - pruning should win by ~k/nprobe scan volume
    # once the corpus dwarfs fixed costs. k_lists follows the
    # cluster-size-constant rule like the ivf stage; the quantizer is
    # the TWO-LEVEL one (E46) because the flat coarse fit is O(n*k*dim)
    # and measured 613 s of the build wall at the 300x point - the
    # hierarchical assignment is the composition's build-scale half.
    from etl_pipeline_mini_project_01_spark.operators.kmeans import (
        kmeans_fit_twolevel,
    )
    from etl_pipeline_mini_project_01_spark.operators.pq import (
        ivf_pq_probe_twolevel,
        write_ivf_pq_layout_twolevel,
    )
    k12 = max(2, int(round(k_lists ** 0.5)))
    ivfpq_path = os.path.join(
        REPO, ".scratch", f"ivfpq_{os.path.basename(sf_dir)}_{k_lists}")
    t0 = time.perf_counter()
    cc2, fi2, dim = kmeans_fit_twolevel(nemb, k12, k12,
                                        HIER_ITERS1, HIER_ITERS2,
                                        kernel=KERNEL)
    write_ivf_pq_layout_twolevel(nemb, cc2, fi2, k12, dim, books,
                                 ivfpq_path, kernel=KERNEL)
    metrics["ivfpq_index_build_sec"] = round(time.perf_counter() - t0, 3)

    # rerank depth 20*k (vs the unpruned race's 10*k): the ADC order
    # over a PROBED pool needs a deeper exact tail - at the base point
    # rerank=10*k left recall at 0.595, just under the 0.6 floor, and
    # the tail join stays candidate-sized either way.
    ivfpq = ivf_pq_probe_twolevel(spark, ivfpq_path, queries, cc2, fi2,
                                  k12, books, nprobe=IVF_NPROBE,
                                  k=IVF_TOP_K,
                                  nprobe_coarse=IVF_NPROBE,
                                  rerank=20 * IVF_TOP_K, emb=vecs)
    t0 = time.perf_counter()
    _consume(ivfpq)
    walls["ivfpq_probe"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    _consume(ivfpq)
    walls["ivfpq_probe_warm"] = round(time.perf_counter() - t0, 3)
    metrics["ivfpq_recall_at_k"] = round(_recall(ivfpq), 4)
    checks["ivfpq_recall_floor"] = (
        metrics["ivfpq_recall_at_k"] >= IVF_RECALL_FLOOR)

    shutil.rmtree(cpath, ignore_errors=True)
    shutil.rmtree(vpath, ignore_errors=True)
    shutil.rmtree(ivfpq_path, ignore_errors=True)
    return walls, checks, metrics


def run_daily_ingest(spark, sf_dir: str, k_clusters: int
                     ) -> tuple[dict[str, float], dict[str, bool]]:
    """VERDICT r6 #5: the daily-ingest steady state COMPOSED, not as
    separate series. Untimed bootstrap = the standing state a
    production pipeline holds between days (frozen k-means model, the
    cluster-partitioned IVF layout of the standing corpus, standing
    SemDeDup verdicts, standing LSH buckets - all persisted
    artifacts). The timed stage is ONE incoming batch (the vec_id/
    doc_id % 5 == 0 fifth of the corpus) flowing through all four
    day-2 operators:
      1. `append_to_ivf_layout` - delta rows land in their frozen-
         model cluster directories (|delta|-sized assignment pass);
      2. a pruned batch probe over the just-appended layout (DPP
         path - serving sees the delta immediately);
      3. `semdedup_incremental` - cluster-local delta-vs-keepers
         semantic verdicts under the frozen model;
      4. incremental hash near-dup - ONLY the delta is shingled/
         minhashed; its buckets join the PERSISTED standing buckets
         (cross-set pairs, Jaccard-verified), the dedup_incremental
         production shape.
    Per-point invariants (the batch-equivalence discipline): layout
    counts + frozen delta cluster ids intact; a probe for a delta
    vector finds it through the pruned scan; incremental semantic
    verdicts EQUAL the batch pass over (keepers UNION delta); and the
    persisted-bucket hash flags EQUAL a from-scratch full-corpus
    recompute (whose wall is also recorded - the cost a
    non-incremental pipeline would pay daily)."""
    import shutil

    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        append_to_ivf_layout,
        ivf_probe_pruned_batch,
        write_ivf_layout,
    )
    from etl_pipeline_mini_project_01_spark.operators.kmeans import (
        kmeans_fit,
        kmeans_transform,
    )
    from etl_pipeline_mini_project_01_spark.operators.semdedup import (
        _semdedup_grouped,
        semdedup_incremental,
    )
    from etl_pipeline_mini_project_01_spark.plans.dedup import (
        lsh_buckets,
        lsh_candidates,
    )
    from etl_pipeline_mini_project_01_spark.functions.text import word_array

    # same session-state discipline as run_decontamination (the r6
    # lesson: in-curve walls inflate 4x under leftover cache/shuffle
    # state) - start the composed stage from a clean cache.
    spark.catalog.clearCache()

    walls: dict[str, float] = {}
    checks: dict[str, bool] = {}

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    s_emb = emb.filter("NOT (vec_id % 5 = 0)")
    d_emb = emb.filter("vec_id % 5 = 0")
    s_docs = docs.filter("NOT (doc_id % 5 = 0)")
    d_docs = docs.filter("doc_id % 5 = 0")

    # ---- untimed bootstrap: yesterday's persisted artifacts ----
    cents, dim = kmeans_fit(s_emb, k=k_clusters, iters=2, kernel=KERNEL)
    path = os.path.join(REPO, ".scratch",
                        f"ingest_layout_{os.path.basename(sf_dir)}")
    shutil.rmtree(path, ignore_errors=True)
    write_ivf_layout(s_emb, cents, dim, path, kernel=KERNEL)
    s_asg = kmeans_transform(s_emb, cents, dim, kernel=KERNEL)
    s_verd = _semdedup_grouped(
        s_asg.join(s_emb.select("vec_id", "embedding"), "vec_id"),
        0.35, "vec_id", "embedding", dim).localCheckpoint()
    s_buckets = lsh_buckets(s_docs, hash_fn="xxhash64").localCheckpoint()
    n_standing, n_delta = s_emb.count(), d_emb.count()
    queries = (d_emb.select("vec_id", "embedding")
               .orderBy("vec_id").limit(IVF_N_QUERIES).localCheckpoint())

    # ---- timed: one incoming batch through the composed stage ----
    t0 = time.perf_counter()
    append_to_ivf_layout(d_emb, cents, dim, path, kernel=KERNEL)
    walls["ingest_append"] = round(time.perf_counter() - t0, 3)

    probe = ivf_probe_pruned_batch(spark, path, queries, cents, dim,
                                   nprobe=IVF_NPROBE, k=IVF_TOP_K,
                                   kernel=KERNEL, probe_lists="plan")
    t0 = time.perf_counter()
    _consume(probe)
    walls["ingest_probe"] = round(time.perf_counter() - t0, 3)

    inc = semdedup_incremental(s_emb, d_emb, threshold=0.35,
                               kernel=KERNEL, standing_verdicts=s_verd,
                               model=(cents, dim))
    t0 = time.perf_counter()
    _consume(inc)
    walls["ingest_semdedup_incr"] = round(time.perf_counter() - t0, 3)

    def _cross_hash_flags(buckets):
        cands = lsh_candidates(buckets)
        cross = cands.where(
            (F.col("doc_a") % 5 == 0) != (F.col("doc_b") % 5 == 0))
        toksets = docs.select(
            "doc_id", F.array_distinct(word_array("text")).alias("ts"))
        ts_a = toksets.select(F.col("doc_id").alias("doc_a"),
                              F.col("ts").alias("ts_a"))
        ts_b = toksets.select(F.col("doc_id").alias("doc_b"),
                              F.col("ts").alias("ts_b"))
        inter = F.size(F.array_intersect("ts_a", "ts_b"))
        union_sz = F.size("ts_a") + F.size("ts_b") - inter
        hits = (cross.join(ts_a, "doc_a").join(ts_b, "doc_b")
                .where(inter >= 0.5 * union_sz)
                .select(F.when(F.col("doc_a") % 5 == 0, F.col("doc_a"))
                        .otherwise(F.col("doc_b")).alias("doc_id"))
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("n_matches")))
        return (d_docs.select("doc_id")
                .join(hits, "doc_id", "left")
                .select("doc_id",
                        (F.coalesce("n_matches", F.lit(0)) > 0)
                        .alias("is_duplicate"),
                        F.coalesce("n_matches", F.lit(0))
                        .alias("n_matches")))

    d_buckets = lsh_buckets(d_docs, hash_fn="xxhash64")
    inc_flags = _cross_hash_flags(s_buckets.unionByName(d_buckets))
    t0 = time.perf_counter()
    _consume(inc_flags)
    walls["ingest_hashdedup"] = round(time.perf_counter() - t0, 3)
    walls["ingest_total"] = round(
        walls["ingest_append"] + walls["ingest_probe"]
        + walls["ingest_semdedup_incr"] + walls["ingest_hashdedup"], 3)

    # the daily cost a NON-incremental hash pipeline would pay: full
    # corpus re-shingled/minhashed from scratch (comparison series,
    # outside ingest_total)
    full_flags = _cross_hash_flags(lsh_buckets(docs, hash_fn="xxhash64"))
    t0 = time.perf_counter()
    _consume(full_flags)
    walls["ingest_hashdedup_full_rerun"] = round(
        time.perf_counter() - t0, 3)

    # ---- invariants ----
    lay = spark.read.parquet(path)
    checks["ingest_layout_counts"] = (
        lay.count() == n_standing + n_delta)
    frozen_mismatch = (lay.filter("vec_id % 5 = 0")
                       .select("vec_id",
                               F.col("cluster").cast("bigint")
                               .alias("lc"))
                       .join(kmeans_transform(d_emb, cents, dim,
                                              kernel=KERNEL)
                             .select("vec_id", "cluster"), "vec_id",
                             "full")
                       .filter((F.col("lc") != F.col("cluster"))
                               | F.col("lc").isNull()
                               | F.col("cluster").isNull())
                       .count())
    checks["ingest_delta_frozen_ids"] = frozen_mismatch == 0

    # a probe FOR a delta vector (query id -1, so self-exclusion
    # cannot hide it) must surface that delta row as its top hit
    # through the pruned scan: cosine 1.0, ties -> lowest vec_id, and
    # vec_id 0 is a delta member by the fixture split
    probe_q = spark.createDataFrame(
        [(-1, [float(v) for v in
               d_emb.filter("vec_id = 0").select("embedding")
               .first()[0]])],
        "vec_id bigint, embedding array<float>")
    top = ivf_probe_pruned_batch(spark, path, probe_q, cents, dim,
                                 nprobe=IVF_NPROBE, k=1,
                                 kernel=KERNEL).collect()
    checks["ingest_probe_sees_delta"] = bool(
        top and top[0]["vec_id"] == 0)

    # semantic batch equivalence (the E43 theorem, at this point's scale)
    inc_ck = inc.localCheckpoint()
    keepers = (s_verd.filter("kept").select("vec_id")
               .join(s_asg, "vec_id")
               .join(s_emb.select("vec_id", "embedding"), "vec_id")
               .withColumn("is_delta", F.lit(False)))
    d_pool = (kmeans_transform(d_emb, cents, dim, kernel=KERNEL)
              .join(d_emb.select("vec_id", "embedding"), "vec_id")
              .withColumn("is_delta", F.lit(True)))
    cols = ["vec_id", "cluster", "centroid_dist", "embedding", "is_delta"]
    batch = _semdedup_grouped(
        keepers.select(*cols).unionByName(d_pool.select(*cols)),
        0.35, "vec_id", "embedding", dim)
    sem_disagree = (inc_ck.select("vec_id", "cluster", "kept")
                    .join(batch.select("vec_id", "cluster",
                                       F.col("kept").alias("bkept")),
                          ["vec_id", "cluster"], "full")
                    .filter((F.col("kept") != F.col("bkept"))
                            | F.col("kept").isNull()
                            | F.col("bkept").isNull())
                    .count())
    checks["ingest_semdedup_equals_batch"] = sem_disagree == 0

    # hash-axis equivalence: persisted standing buckets + fresh delta
    # buckets == full from-scratch recompute, flag for flag
    hash_disagree = (inc_flags
                     .join(full_flags
                           .select("doc_id",
                                   F.col("is_duplicate").alias("fdup"),
                                   F.col("n_matches").alias("fm")),
                           "doc_id", "full")
                     .filter((F.col("is_duplicate") != F.col("fdup"))
                             | (F.col("n_matches") != F.col("fm"))
                             | F.col("is_duplicate").isNull()
                             | F.col("fdup").isNull())
                     .count())
    checks["ingest_hash_equals_full_recompute"] = hash_disagree == 0
    shutil.rmtree(path, ignore_errors=True)
    return walls, checks


def run_compaction(spark, sf_dir: str, k_clusters: int,
                   n_appends: int = 8
                   ) -> tuple[dict[str, float], dict[str, bool],
                              dict[str, float]]:
    """E49 compaction on the curve (VERDICT r9 #5) - the OPTIMIZE
    story a long-lived index lives or dies by. Untimed bootstrap = a
    standing layout + `n_appends` daily appends under a frozen model,
    which leaves every touched posting list as ~n_appends+1 sliver
    files (each append adds >= 1 file per touched cluster). Timed
    series, warm (second run of two):
      * `compact_probe_presliver` / `compact_probe_postcompact` - the
        SAME literal-mode batch probe before and after
        `compact_layout_generation` (the footer-read tax slivers
        charge every probe, and its removal);
      * `compact_wall` - the compaction itself (one read + one
        cluster-routed write of the live rows + a CAS manifest swap).
    Metrics: manifest file count before/after (the bin-pack target:
    files_per_cluster=1 -> exactly one file per non-empty cluster).
    Invariants: the row set is IDENTICAL across the swap; a probe
    pinned to the pre-compaction manifest version still serves
    (lock-free cutover); post-vacuum the reclaimed entries are exactly
    the bare append-origin dirs."""
    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        append_to_ivf_layout,
        compact_layout_generation,
        ivf_probe_pruned_batch,
        manifest_clusters,
        read_layout_manifest,
        vacuum_layout_generations,
        write_ivf_layout,
    )
    from etl_pipeline_mini_project_01_spark.operators.kmeans import (
        kmeans_fit,
    )
    from etl_pipeline_mini_project_01_spark.sources.versioned import (
        list_versions,
    )
    import shutil

    spark.catalog.clearCache()
    walls: dict[str, float] = {}
    checks: dict[str, bool] = {}
    metrics: dict[str, float] = {}

    emb = load_table(spark, sf_dir, "embeddings")
    mod = n_appends + 1
    base_emb = emb.filter(f"vec_id % {mod} = 0")
    cents, dim = kmeans_fit(base_emb, k=k_clusters, iters=1,
                            kernel=KERNEL)
    path = os.path.join(REPO, ".scratch",
                        f"compact_layout_{os.path.basename(sf_dir)}")
    shutil.rmtree(path, ignore_errors=True)
    write_ivf_layout(base_emb, cents, dim, path, kernel=KERNEL)
    for r in range(1, mod):
        append_to_ivf_layout(emb.filter(f"vec_id % {mod} = {r}"),
                             cents, dim, path, kernel=KERNEL)

    mf = manifest_clusters(path)
    metrics["compact_files_before"] = sum(len(fs) for fs in mf.values())
    metrics["compact_clusters"] = len(mf)
    queries = (emb.select("vec_id", "embedding")
               .orderBy("vec_id").limit(IVF_N_QUERIES).localCheckpoint())

    def _probe():
        return ivf_probe_pruned_batch(
            spark, path, queries, cents, dim, nprobe=IVF_NPROBE,
            k=IVF_TOP_K, kernel=KERNEL, probe_lists="literal")

    _consume(_probe())                       # warm-up
    t0 = time.perf_counter()
    _consume(_probe())
    walls["compact_probe_presliver"] = round(time.perf_counter() - t0, 3)
    before_rows = sorted(
        (r.vec_id, int(r.cluster)) for r in
        read_layout_manifest(spark, path)
        .select("vec_id", "cluster").collect())
    pre_version = max(list_versions(os.path.join(path, "_index")))

    t0 = time.perf_counter()
    compact_layout_generation(spark, path, files_per_cluster=1)
    walls["compact_wall"] = round(time.perf_counter() - t0, 3)

    mf2 = manifest_clusters(path)
    metrics["compact_files_after"] = sum(len(fs) for fs in mf2.values())
    checks["compact_binpack_target"] = all(
        len(fs) == 1 for fs in mf2.values())
    after_rows = sorted(
        (r.vec_id, int(r.cluster)) for r in
        read_layout_manifest(spark, path)
        .select("vec_id", "cluster").collect())
    checks["compact_rowset_identical"] = after_rows == before_rows
    pinned = sorted(
        (r.vec_id, int(r.cluster)) for r in
        read_layout_manifest(spark, path, version=pre_version)
        .select("vec_id", "cluster").collect())
    checks["compact_pinned_presliver_serves"] = pinned == before_rows

    _consume(_probe())                       # warm-up on the new gen
    t0 = time.perf_counter()
    _consume(_probe())
    walls["compact_probe_postcompact"] = round(
        time.perf_counter() - t0, 3)

    removed = vacuum_layout_generations(path, keep_last=1,
                                        stage_retention_sec=0.0)
    checks["compact_vacuum_reclaims_bare_dirs"] = (
        bool(removed) and all(e.startswith("cluster=") for e in removed))
    checks["compact_rowset_survives_vacuum"] = sorted(
        (r.vec_id, int(r.cluster)) for r in
        read_layout_manifest(spark, path)
        .select("vec_id", "cluster").collect()) == before_rows
    shutil.rmtree(path, ignore_errors=True)
    return walls, checks, metrics


#: Unbiasedness tolerance for the sampled miss audit at the base point
#: (measured base deltas: flat 0.0004, twolevel 0.016 at frac=0.3).
AUDIT_TOL = 0.1


def run_miss_audit(spark, base_dir: str, big_dir: str, n: int
                   ) -> tuple[dict[str, float], dict[str, bool],
                              dict[str, float]]:
    """VERDICT r5 #6: exercise E42's sampled mode at a real fraction on
    the curve. At the BASE point both the full audit and a frac=0.3
    sample are affordable, so the sampled straddle fraction is checked
    against the full one per model (|delta| <= AUDIT_TOL - the
    unbiasedness evidence). At the BIG point only the sampled mode runs
    (the 100 TB shape: the pair scan is quadratic in the SAMPLE, so the
    fraction is chosen to hold the sampled pool at ~base size and the
    wall roughly CONSTANT while the corpus grows Nx)."""
    from etl_pipeline_mini_project_01_spark.plans.curation import md5_32
    from etl_pipeline_mini_project_01_spark.plans.similarity import (
        miss_audit_frame,
    )

    walls: dict[str, float] = {}
    checks: dict[str, bool] = {}
    metrics: dict[str, float] = {}

    def _sample_pred(frac: float):
        bound = int(frac * (1 << 32))
        return md5_32(F.concat(F.lit("miss|"),
                               F.col("vec_id").cast("string"))) < bound

    base_emb = load_table(spark, base_dir, "embeddings")
    t0 = time.perf_counter()
    full = {r["model"]: r for r in miss_audit_frame(base_emb).collect()}
    walls["audit_full_base"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    samp = {r["model"]: r
            for r in miss_audit_frame(base_emb,
                                      pair_pred=_sample_pred(0.3)).collect()}
    walls["audit_sampled_base"] = round(time.perf_counter() - t0, 3)
    for m in ("flat", "twolevel"):
        delta = abs(samp[m]["straddle_frac"] - full[m]["straddle_frac"])
        metrics[f"audit_{m}_full_frac"] = round(full[m]["straddle_frac"], 4)
        metrics[f"audit_{m}_sampled_frac"] = round(
            samp[m]["straddle_frac"], 4)
        checks[f"audit_{m}_sampled_within_tol"] = bool(
            delta <= AUDIT_TOL
            and 0 < samp[m]["n_pairs"] < full[m]["n_pairs"])

    big_emb = load_table(spark, big_dir, "embeddings")
    n_big = big_emb.count()
    frac = min(1.0, 2000.0 / n_big)
    t0 = time.perf_counter()
    big = {r["model"]: r
           for r in miss_audit_frame(
               big_emb, pair_pred=_sample_pred(frac)).collect()}
    walls["audit_sampled_big"] = round(time.perf_counter() - t0, 3)
    metrics["audit_big_sample_frac"] = round(frac, 4)
    for m in ("flat", "twolevel"):
        metrics[f"audit_{m}_big_sampled_frac"] = round(
            big[m]["straddle_frac"], 4)
    checks["audit_big_sampled_shape"] = bool(all(
        big[m]["n_pairs"] > 0
        and 0.0 <= big[m]["straddle_frac"] <= 1.0
        for m in ("flat", "twolevel")))
    return walls, checks, metrics


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    # Driver memory must be set BEFORE the local JVM launches (this
    # script always starts a fresh process): the 30x SemDeDup pair
    # stage shuffles ~7M (vec, vec) array pairs, beyond the 1g local
    # default.
    spark = get_spark("scale-curve",
                      extra_conf={"spark.ui.showConsoleProgress": "false",
                                  "spark.driver.memory": "24g"})
    spark.sparkContext.setLogLevel("ERROR")

    # Stage filter (comma list): re-measuring ONE series at a big N no
    # longer pays for every other series' walls. Default = everything
    # (the self-verified full run); subset runs say so in the output so
    # a consumer can't mistake them for a full-curve checks_pass.
    stages = set(filter(None, os.environ.get(
        "SPARK_GRAFT_CURVE_STAGES",
        "flagships,decon,incr,audit,ivf,ingest,pq,manifest").split(",")))

    big_dir = synthesize(spark, n)
    # Warm the JVM/codegen path once so 1x doesn't absorb cold cost.
    kmeans_assign(load_table(spark, BASE_SF, "embeddings"),
                  k=2, iters=1).count()

    base: dict[str, float] = {}
    big: dict[str, float] = {}
    base_checks: dict[str, bool] = {}
    big_checks: dict[str, bool] = {}
    base_metrics: dict[str, float] = {}
    big_metrics: dict[str, float] = {}
    audit_walls: dict[str, float] = {}
    if "flagships" in stages:
        base, base_checks, base_metrics = run_flagships(spark, BASE_SF,
                                                        k_clusters=8)
        big, big_checks, big_metrics = run_flagships(spark, big_dir,
                                                     k_clusters=8 * n)
    if "decon" in stages:
        dbase, dbase_checks = run_decontamination(spark, BASE_SF)
        dbig, dbig_checks = run_decontamination(spark, big_dir)
        base.update(dbase)
        big.update(dbig)
        base_checks.update(dbase_checks)
        big_checks.update(dbig_checks)
    if "incr" in stages:
        ibase, ibase_checks = run_incremental_semdedup(spark, BASE_SF, 8)
        ibig, ibig_checks = run_incremental_semdedup(spark, big_dir, 8 * n)
        base.update(ibase)
        big.update(ibig)
        base_checks.update(ibase_checks)
        big_checks.update(ibig_checks)
    if "audit" in stages:
        audit_walls, audit_checks, audit_metrics = run_miss_audit(
            spark, BASE_SF, big_dir, n)
        base_checks.update(audit_checks)
        base_metrics.update(audit_metrics)
    if "ingest" in stages:
        gbase, gbase_checks = run_daily_ingest(spark, BASE_SF, 8)
        gbig, gbig_checks = run_daily_ingest(spark, big_dir, 8 * n)
        base.update(gbase)
        big.update(gbig)
        base_checks.update(gbase_checks)
        big_checks.update(gbig_checks)
    if "pq" in stages:
        pbase, pbase_checks, pbase_metrics = run_pq(spark, BASE_SF, 8)
        pbig, pbig_checks, pbig_metrics = run_pq(spark, big_dir, 8 * n)
        base.update(pbase)
        big.update(pbig)
        base_checks.update(pbase_checks)
        big_checks.update(pbig_checks)
        base_metrics.update({f"pq_base_{k}": v
                             for k, v in pbase_metrics.items()})
        big_metrics.update({f"pq_big_{k}": v
                            for k, v in pbig_metrics.items()})
    if "compact" in stages:
        cbase, cbase_checks, cbase_metrics = run_compaction(
            spark, BASE_SF, 8)
        cbig, cbig_checks, cbig_metrics = run_compaction(
            spark, big_dir, 8 * n)
        base.update(cbase)
        big.update(cbig)
        base_checks.update(cbase_checks)
        big_checks.update(cbig_checks)
        base_metrics.update({f"compact_base_{k}": v
                             for k, v in cbase_metrics.items()})
        big_metrics.update({f"compact_big_{k}": v
                            for k, v in cbig_metrics.items()})
    if "manifest" in stages:
        mchecks, mmetrics = run_manifest_index(spark)
        base_checks.update(mchecks)
        base_metrics.update({f"manifest_{k}" if not k.startswith("manifest")
                             else k: v for k, v in mmetrics.items()})
    if "ivf" in stages:
        vbase, vbase_checks, vbase_metrics = run_ivf_layout(
            spark, BASE_SF, 8, check_equality=True)
        vbig, vbig_checks, vbig_metrics = run_ivf_layout(
            spark, big_dir, 8 * n, check_equality=False)
        base.update(vbase)
        big.update(vbig)
        base_checks.update(vbase_checks)
        big_checks.update(vbig_checks)
        base_metrics.update({f"ivf_base_{k}": v
                             for k, v in vbase_metrics.items()})
        big_metrics.update({f"ivf_big_{k}": v
                            for k, v in vbig_metrics.items()})

    def _pair(key_base, key_big):
        if key_base not in base or key_big not in big:
            return None
        ratio = round(big[key_big] / base[key_base], 2)
        return {"base_sec": base[key_base], "big_sec": big[key_big],
                "wall_ratio": ratio, "per_unit": round(ratio / n, 2)}

    result = {
        "scale_factor": n,
        # Which stage subset ran: checks_pass covers ONLY these series.
        "stages": sorted(stages),
        # Per-unit ratios are comparable ONLY within a same-kernel
        # series (ADVICE r4: matmul and vectorized points must not be
        # mixed when reading round-over-round trends) - consumers key
        # series by this field.
        "kernel": KERNEL,
        "base_dir": BASE_SF,
        "big_dir": big_dir,
        "kmeans": _pair("kmeans_k8_i2", "kmeans_k8_i2"),
        "semdedup": _pair("semdedup_k8", f"semdedup_k{8 * n}"),
        "semdedup_twolevel": _pair(
            "semdedup2_3x3",
            f"semdedup2_{max(2, int(round((8 * n) ** 0.5)))}x"
            f"{max(2, int(round((8 * n) ** 0.5)))}"),
        "training_mix": _pair("training_mix", "training_mix"),
        "substring_spans": _pair("substring_spans", "substring_spans"),
        "ann_topk": _pair("ann_topk", "ann_topk"),
        "decon_exact": _pair("decon_exact", "decon_exact"),
        "decon_bloom": _pair("decon_bloom", "decon_bloom"),
        "decon_bloom_jvm": _pair("decon_bloom_jvm", "decon_bloom_jvm"),
        # r7 composed daily-ingest steady state (VERDICT r6 #5):
        # ingest_total is |delta|-dominated, so per_unit ~1 on a
        # proportional delta; the two *_full_rerun walls are the
        # non-incremental daily cost for comparison.
        "ingest_append": _pair("ingest_append", "ingest_append"),
        "ingest_probe": _pair("ingest_probe", "ingest_probe"),
        "ingest_semdedup_incr": _pair("ingest_semdedup_incr",
                                      "ingest_semdedup_incr"),
        "ingest_hashdedup": _pair("ingest_hashdedup", "ingest_hashdedup"),
        "ingest_hashdedup_full_rerun": _pair(
            "ingest_hashdedup_full_rerun", "ingest_hashdedup_full_rerun"),
        "ingest_total": _pair("ingest_total", "ingest_total"),
        "semdedup_incr_stage": _pair("semdedup_incr_stage",
                                     "semdedup_incr_stage"),
        "semdedup_full_rerun": _pair("semdedup_full_rerun",
                                     "semdedup_full_rerun"),
        # E44 serving path: expectation is ivf_probe_layout per_unit ->
        # ~1/n (wall ~constant: fixed nprobe over constant-size lists)
        # while ivf_probe_fullscan tracks ~n (the layout's win is the
        # widening gap between the two series).
        "ivf_probe_layout": _pair("ivf_probe_layout", "ivf_probe_layout"),
        "ivf_probe_fullscan": _pair("ivf_probe_fullscan",
                                    "ivf_probe_fullscan"),
        "ivf_probe_hier": _pair("ivf_probe_hier", "ivf_probe_hier"),
        "ivf_probe_layout_warm": _pair("ivf_probe_layout_warm",
                                       "ivf_probe_layout_warm"),
        "ivf_probe_hier_warm": _pair("ivf_probe_hier_warm",
                                     "ivf_probe_hier_warm"),
        # E47: the ADC scan reads m-byte codes instead of dim*4-byte
        # vectors; expectation is pq_adc_scan tracking well under the
        # full-precision control as the corpus grows.
        "pq_adc_scan": _pair("pq_adc_scan", "pq_adc_scan"),
        "pq_adc_rerank_scan": _pair("pq_adc_rerank_scan",
                                    "pq_adc_rerank_scan"),
        "ivfpq_probe": _pair("ivfpq_probe", "ivfpq_probe"),
        "ivfpq_probe_warm": _pair("ivfpq_probe_warm", "ivfpq_probe_warm"),
        "pq_fullprec_scan": _pair("pq_fullprec_scan",
                                  "pq_fullprec_scan"),
        # E49 compaction (VERDICT r9 #5): probe walls before (slivered)
        # and after (bin-packed) the generation compaction, plus the
        # compaction wall itself; the file-count collapse is in
        # *_metrics (compact_files_before -> compact_files_after).
        "compact_probe_presliver": _pair("compact_probe_presliver",
                                         "compact_probe_presliver"),
        "compact_probe_postcompact": _pair("compact_probe_postcompact",
                                           "compact_probe_postcompact"),
        "compact_wall": _pair("compact_wall", "compact_wall"),
        # audit walls are not base/big pairs: the sampled big point is
        # DESIGNED to stay ~constant (the fraction shrinks as the
        # corpus grows), so report raw walls + fractions instead.
        "miss_audit": audit_walls,
        # VERDICT r4 #5: every point carries its own pass flag - the
        # invariants above ran against BOTH scales' actual outputs.
        "checks_pass": all(base_checks.values()) and all(
            big_checks.values()),
        "base_checks": base_checks,
        "big_checks": big_checks,
        "base_metrics": base_metrics,
        "big_metrics": big_metrics,
    }
    result = {k: v for k, v in result.items() if v is not None}
    spark.stop()
    sys.stdout.flush()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
