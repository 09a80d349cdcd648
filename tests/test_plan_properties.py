"""Physical-plan regression guards: the scale properties SCALE.md claims
must stay true as queries evolve (broadcast-only dim joins, pushdown,
top-k without global sort)."""

from __future__ import annotations

import pytest

from etl_pipeline_mini_project_01_spark.plans.registry import (
    QUERIES,
    load_all_plans,
)

load_all_plans()

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_star_join_all_broadcast(spark):
    plan = _plan(spark, "j7_star_join_region_revenue")
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_q1_filter_pushed_to_scan(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" \
        in plan
    # column pruning: l_orderkey is not needed and must not be read
    scan = plan.split("FileScan parquet")[1].split("\n")[0]
    assert "l_orderkey" not in scan


def test_topk_avoids_global_sort(spark):
    plan = _plan(spark, "g7_viral_content")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_band_join_broadcast_not_cartesian(spark):
    plan = _plan(spark, "j3_band_join")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_fact_dim_lookup_no_fact_shuffle(spark):
    plan = _plan(spark, "j2_dimension_lookup")
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


@pytest.mark.parametrize("name", ["g1_daily_engagement_summary",
                                  "q1_pricing_summary"])
def test_aggregates_are_partial_final(spark, name):
    plan = _plan(spark, name)
    assert "partial_" in plan  # map-side combine present


def test_g2_rank_after_limit_no_global_window_over_fact(spark):
    """VERDICT r1 #5: top-k must plan as TakeOrderedAndProject over the
    fact; the rank window may only run over the 1000 survivors."""
    plan = _plan(spark, "g2_top_performing_content")
    assert "TakeOrderedAndProject" in plan
    # the window's single-partition exchange happens after the take;
    # the full fact must never range-partition for a global sort
    assert "Exchange rangepartitioning" not in plan


def test_jaccard_blocks_by_lsh_buckets_not_attributes(spark):
    """VERDICT r1 #4: candidate pairs come from the LSH bucket equi-join;
    no all-pairs join keyed on (source, lang) attribute blocks."""
    plan = _plan(spark, "dedup_ngram_jaccard")
    assert "CartesianProduct" not in plan
    join_lines = [ln for ln in plan.splitlines() if "Join" in ln]
    assert join_lines
    # no join keyed on the skewable attributes
    assert all("source" not in ln and "lang" not in ln for ln in join_lines)
    # pairing happens on the LSH (band, bucket) equi-keys
    assert any("band" in ln and "bucket" in ln for ln in join_lines)
    # no FORCED broadcast hint on the (unbounded) candidate relation -
    # but at this scale AQE should still CHOOSE broadcast for it
    assert "BroadcastHashJoin" in plan


def test_repetition_top1_uses_window_group_limit(spark):
    """text_repetition's rank=1 filter must compile to WindowGroupLimit
    (partial map-side top-1 per doc BEFORE the shuffle) - the
    distributed-heap shape, not a full sort of every bigram count."""
    plan = _plan(spark, "text_repetition")
    assert "WindowGroupLimit" in plan


def test_gopher_quality_is_map_side_only(spark):
    """The Gopher gate is a pure per-row map: no aggregation or join
    exchange - the only allowed exchange is the final presentation sort."""
    plan = _plan(spark, "text_gopher_quality")
    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert all("rangepartitioning" in ln for ln in exchanges), exchanges


def test_file_sink_streaming_reads_back_lazily(spark):
    """stream_file_sink_counts returns a plain batch scan over the sink
    files - no driver-side materialization in the query path."""
    plan = _plan(spark, "stream_file_sink_counts")
    assert "FileScan parquet" in plan


def test_asof_join_is_single_key_shuffle_not_range_join(spark):
    """The as-of composition must cost one hash shuffle on the join key -
    never a BroadcastNestedLoopJoin/CartesianProduct range join."""
    plan = _plan(spark, "asof_join_latest_order")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # no join at all: union + window
    assert "Exchange hashpartitioning(user_id" in plan


def test_bucketed_range_join_is_equi_join_not_bnlj(spark):
    """The large-dim interval join must plan as a hash equi-join on the
    stride bucket, never a nested-loop range join."""
    plan = _plan(spark, "rangejoin_value_bands")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_rangejoin_outer_modes_stay_equi_join(spark):
    """The r12 right/full-outer rewrite (row-id core + anti-joined
    remainder) must inherit the bucketed equi-join shape end-to-end:
    no nested-loop or cartesian anywhere in the two outer branches."""
    plan = _plan(spark, "rangejoin_outer_modes")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_per_group_topk_uses_window_group_limit(spark):
    """row_number + rank filter must compile to WindowGroupLimit
    (partial per-partition top-k before the shuffle), not a full
    per-partition sort feeding a filter."""
    plan = _plan(spark, "topk_per_group_docs")
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan  # map-side top-k before the exchange


def test_split_and_sample_are_map_side_only(spark):
    """Hash-split and stratified sample are pure per-row expressions:
    no hash-partitioned shuffle anywhere (the only Exchange allowed is
    the final presentation sort's range partitioning)."""
    for name in ("split_train_val_test", "sample_stratified"):
        plan = _plan(spark, name)
        assert "Exchange hashpartitioning" not in plan, name
        assert "Join" not in plan, name


def test_tfidf_broadcasts_term_stats(spark):
    """The per-term df table and the single-row corpus count must
    broadcast; the corpus itself shuffles only for its own aggregations,
    never for the join."""
    plan = _plan(spark, "tfidf_top_terms")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row n_docs factor
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pii_redaction_is_codegen_scan(spark):
    """Regex scrubbing stays JVM-side over the scan - no Python
    evaluation, no join, no shuffle before the presentation sort."""
    plan = _plan(spark, "pii_redaction")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_minhash_signatures_single_aggregate_no_seed_explode(spark):
    """Round-3 rework: the K minhash variants must be K parallel MIN
    expressions in ONE groupBy(doc_id) - a (doc, seed) explode would push
    K times the shingle rows through the exchange. Detectable in the
    plan: exactly one aggregate keyed on doc_id alone, none keyed on
    (doc_id, seed), and no generator stage after the shingle explode."""
    plan = _plan(spark, "dedup_minhash_lsh")
    assert "seed" not in plan
    # both the partial and final HashAggregate key on doc_id only
    agg_lines = [ln for ln in plan.splitlines() if "HashAggregate" in ln]
    assert agg_lines
    assert all("band" not in ln for ln in agg_lines)


def test_simhash_single_aggregate_no_bit_explode(spark):
    """SimHash's 32 bit votes are 32 SUM expressions in one groupBy -
    no (doc, bit) explode (x32 shuffle) and no second aggregation."""
    plan = _plan(spark, "dedup_simhash")
    assert "posexplode" not in plan
    generates = [ln for ln in plan.splitlines() if "Generate explode" in ln]
    # exactly one explode: the tokenizer; no bit-sequence explode
    assert len(generates) == 1, generates


def test_j7_preaggregates_fact_to_order_grain(spark):
    """Round-3 rework: lineitem collapses to order grain BEFORE the dim
    joins (map-side combine on the same orderkey shuffle the join
    needs), and only ONE distinct (c_custkey) survives to the final
    aggregate - so Expand replicates x2, never x3."""
    plan = _plan(spark, "j7_star_join_region_revenue")
    # with a single distinct, Catalyst plans two-phase distinct
    # aggregation with NO Expand at all (two distincts forced a x3
    # Expand over the full join output)
    assert "Expand" not in plan
    # pre-aggregation keyed on l_orderkey exists
    assert any("HashAggregate" in ln and "l_orderkey" in ln
               for ln in plan.splitlines())


def test_semdedup_pair_join_is_equi_not_cartesian(spark):
    """SemDeDup's within-cluster pairwise stage must stay an equi-join
    on cluster id (hash or broadcast) - a cartesian over the corpus is
    the failure mode the k-means stage exists to prevent."""
    from etl_pipeline_mini_project_01_spark.catalog import load_table
    from etl_pipeline_mini_project_01_spark.operators.semdedup import semdedup

    emb = load_table(spark, SF_DIR, "embeddings")
    df = semdedup(emb, k=4, iters=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan.split("isnull(_dropped_id")[0]


def test_kmeans_update_agg_is_partial_final(spark):
    """The k x dim centroid-sum aggregate must map-side combine: only
    k x dim partial rows cross the wire per iteration."""
    from pyspark.sql import functions as F

    from etl_pipeline_mini_project_01_spark.catalog import load_table
    from etl_pipeline_mini_project_01_spark.operators.kmeans import (
        _assign,
        _scaled,
        kmeans_fit,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    cents, dim = kmeans_fit(emb, k=4, iters=0)
    x = _scaled(emb.select("vec_id", "embedding"), "embedding")
    sums = (_assign(x, cents, dim).groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.element_at("xi", i + 1)).alias(f"s{i}")
          for i in range(dim)]))
    plan = sums._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2
    assert "partial_count" in plan


def test_chunking_operator_is_shuffle_free(spark):
    """chunk_documents is row-local (tokenize -> starts -> slice ->
    posexplode): its plan must contain no Exchange at all."""
    from etl_pipeline_mini_project_01_spark.catalog import load_table
    from etl_pipeline_mini_project_01_spark.operators.chunking import (
        chunk_documents,
    )

    docs = load_table(spark, SF_DIR, "documents")
    df = chunk_documents(docs, chunk_tokens=32, overlap=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_ann_multitable_query_side_broadcasts(spark):
    """ann_multitable_recall / ann_multitable_topk: every per-table
    candidate equi-join must broadcast the tiny query side so the corpus
    never shuffles; no cartesian anywhere."""
    plan = _plan(spark, "ann_multitable_recall")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # candidate generation: the signature equi-joins must not sort-merge
    # the corpus (queries are 5 rows - they broadcast).
    assert "SortMergeJoin LeftOuter" not in plan.split("row_number")[0]


def test_vectorized_kernels_are_arrow_batched(spark):
    """The default k-means/SemDeDup kernels must run as ArrowEvalPython
    (pandas_udf batches), never row-at-a-time BatchEvalPython."""
    from etl_pipeline_mini_project_01_spark.catalog import load_table
    from etl_pipeline_mini_project_01_spark.operators.kmeans import (
        kmeans_fit,
        kmeans_transform,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    cents, dim = kmeans_fit(emb, k=2, iters=0)
    plan = (kmeans_transform(emb, cents, dim)
            ._jdf.queryExecution().executedPlan().toString())
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_quantile_sketch_single_partial_final_aggregate(spark):
    """stats_quantile_sketch: exact + sketch percentiles all compute in
    ONE partial+final aggregate pair (one shuffle of per-group sketch
    state), never one pass per percentile."""
    plan = _plan(spark, "stats_quantile_sketch")
    assert plan.count("FileScan parquet") == 1
    assert "approx_percentile" in plan
    # exactly one aggregation exchange (plus the presentation sort)
    agg_exchanges = [
        seg for seg in plan.split("Exchange")[1:]
        if seg.lstrip().startswith("hashpartitioning")]
    assert len(agg_exchanges) == 1, plan


def test_bloom_probe_is_pure_jvm_no_python_eval(spark):
    """decontamination_bloom (probe='jvm', VERDICT r6 #3): the bitmap
    probe is a BloomFilterMightContain catalyst expression evaluated
    inline during the gram aggregate - ZERO Python evaluation nodes
    anywhere in the physical plan (the r6 Arrow path's per-batch
    round-trip was the measured reason bloom lost to the exact join
    locally). The expression itself is only visible in the logical
    plan (physical HashAggregate prints output attribute names, not
    result expressions), so the probe presence check reads the
    optimized plan while the no-Python/no-cartesian checks read the
    executed plan."""
    from etl_pipeline_mini_project_01_spark.plans.registry import QUERIES

    df = QUERIES["decontamination_bloom"](spark, SF_DIR)
    qe = df._jdf.queryExecution()
    optimized = qe.optimizedPlan().toString()
    assert "might_contain" in optimized
    plan = qe.executedPlan().toString()
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_probe_broadcasts_and_never_cartesian(spark):
    """ann_ivf_kmeans_recall: the probed-list relation (N_QUERIES x
    nprobe rows) must broadcast into the candidate join - the corpus
    assignment never shuffles for the probe - and nothing falls back to
    a cartesian."""
    plan = _plan(spark, "ann_ivf_kmeans_recall")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_twolevel_kernels_are_arrow_batched(spark):
    """kmeans_twolevel_clusters: both assignment stages run as
    ArrowEvalPython (pandas_udf batches), never row-at-a-time
    BatchEvalPython, and the fine stage adds no extra shuffle beyond
    the leaf_size window."""
    plan = _plan(spark, "kmeans_twolevel_clusters")
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_no_forced_bigside_broadcast(spark):
    """VERDICT r9 #3: no GROWING relation (documents, customer) may
    carry a broadcast HINT - a hint overrides AQE's size check, which
    at 100x forces an OOM-by-construction build of the full table.
    With auto-broadcast disabled, the only BroadcastExchanges left are
    the deliberately-hinted CONSTANT relations: g2's 1-row document
    count, j2/j7's nation/region (25/5 rows). silver_fact_build and j4
    hint nothing, so they must plan zero broadcasts."""
    from etl_pipeline_mini_project_01_spark.plans.registry import QUERIES

    expected = {
        "g2_top_performing_content": 1,   # the 1-row __n_docs scalar
        "silver_fact_build": 0,
        "j1_change_detection": 0,         # de-hinted r11: `cur` grows
        "stream_static_join_segments": 0, # de-hinted r11: customer grows
        "sql_surface_star_revenue": 1,    # nation only; customer de-hinted
                                          # r11 (SQL-text sweep survivor)
        "j2_dimension_lookup": 1,         # nation
        "j4_anti_join_missing_fk": 0,
        "j7_star_join_region_revenue": 2, # nation + region
        "tfidf_top_terms": 1,             # the 1-row n_docs scalar;
                                          # the vocab-sized df is unhinted
    }
    conf = spark.conf
    saved = {k: conf.get(k, None) for k in
             ("spark.sql.autoBroadcastJoinThreshold",
              "spark.sql.adaptive.autoBroadcastJoinThreshold")}
    try:
        for name, n_hinted in expected.items():
            df = QUERIES[name](spark, SF_DIR)
            # AFTER the build: load_table's harden() re-asserts the
            # engine's 64MB threshold mid-build, and physical planning
            # (lazy, first queryExecution access) reads the conf then.
            conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
            plan = df._jdf.queryExecution().sparkPlan().toString()
            # sparkPlan() precedes EnsureRequirements, so exchanges are
            # not inserted yet - count broadcast JOIN nodes instead.
            got = (plan.count("BroadcastHashJoin")
                   + plan.count("BroadcastNestedLoopJoin"))
            assert got == n_hinted, (
                f"{name}: {got} broadcast joins with auto-broadcast "
                f"off, expected {n_hinted} (only constant-sized hinted "
                f"dims may broadcast)\n{plan}")
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_registry_wide_plan_hygiene(spark):
    """Standing guard over EVERY registered query's physical plan: no
    CartesianProduct anywhere, no row-at-a-time BatchEvalPython UDFs,
    and BroadcastNestedLoopJoin only where a constant-size broadcast
    side makes it the intended shape (audited r10):

      * the 1-row scalar-subquery broadcasts (g2/tfidf n_docs,
        temperature_mix totals x2, the recall rows' truth count);
      * j3's 4-row band table (theta join - BNLJ over a constant
        broadcast IS the plan);
      * sim_cosine_topk's N_QUERIES-bounded query batch (score-all
        scan by design).

    No BatchEvalPython exceptions remain: the UDTF surface (folded
    into u2_sentiment_inference, r11) is arrow-optimized and plans as
    ArrowEvalPythonUDTF. A NEW query tripping this guard needs a
    written justification, not an allowlist edit."""
    from etl_pipeline_mini_project_01_spark.plans.registry import (
        QUERIES,
        load_all_plans,
    )

    load_all_plans()
    bnlj_allowed = {
        "ann_ivf_kmeans_recall": 1, "ann_multitable_recall": 1,
        "g2_top_performing_content": 1, "j3_band_join": 1,
        "sim_cosine_topk": 1, "temperature_mix_counts": 2,
        "tfidf_top_terms": 1,
    }
    python_eval_allowed: set[str] = set()
    offenders = {}
    for name, fn in QUERIES.items():
        plan = fn(spark, SF_DIR)._jdf.queryExecution().sparkPlan().toString()
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CartesianProduct")
        if "BatchEvalPython" in plan and name not in python_eval_allowed:
            flags.append("BatchEvalPython")
        n_bnlj = plan.count("BroadcastNestedLoopJoin")
        if n_bnlj > bnlj_allowed.get(name, 0):
            flags.append(f"BroadcastNestedLoopJoin x{n_bnlj}")
        if flags:
            offenders[name] = flags
    assert not offenders, offenders


def test_delta_chain_resolution_single_key_shuffle(spark, tmp_path):
    """r14 merge-on-read plan guard: resolving an n-member delta chain
    is member scans -> Union -> EXACTLY ONE exchange (the key window's
    shuffle) -> Window; a key-clause prune collapses the scan list to
    the stat-surviving members with the filter pushed to the scan."""
    from pyspark.sql import functions as F

    from etl_pipeline_mini_project_01_spark.sources.versioned import (
        read_version,
        write_version_cas,
    )

    root = str(tmp_path / "t")
    for i in range(3):
        b = (spark.range(i * 100, (i + 1) * 100 + 50)
             .select(F.col("id").alias("k"),
                     (F.col("id") * 1.0 + i).alias("v"))
             .repartitionByRange(2, "k"))
        write_version_cas(b, root, expected_version=i,
                          stats_columns=["k"],
                          manifest_extra={"delta": {"keys": ["k"]}})

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    full = plan_of(read_version(spark, root))
    assert full.count("Exchange") == 1          # one key shuffle, total
    assert "Union" in full and "Window" in full
    assert "CartesianProduct" not in full
    assert "BroadcastNestedLoopJoin" not in full

    pruned = plan_of(read_version(spark, root, prune=("k", "<", 50)))
    assert pruned.count("Exchange") == 1
    # only v1's low-key file survives the manifest prune: one scan
    assert pruned.count("Scan parquet") == 1
    assert "LessThan(k,50)" in pruned           # pushed to the scan
