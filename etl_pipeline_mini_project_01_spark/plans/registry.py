"""Query registry: every implemented operator registers a (Spark builder,
DuckDB oracle SQL) pair here; `__spark_entry__.py` re-exports the dicts.

Determinism contract (FIXTURES.md §C):
  * float aggregates go through DECIMAL sums (order-insensitive, exact)
    before any cast back to DOUBLE;
  * every output column is aliased identically in the Spark plan and the
    oracle SQL;
  * no CURRENT_TIMESTAMP - a frozen RUN_TS constant is injected on both
    sides;
  * ties in rankings/mode are broken by an explicit secondary key.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: Frozen "now" for any wall-clock-derived column (reference uses
#: CURRENT_TIMESTAMP at /root/reference/models/gold/..sql:42,247,252); fixed
#: just past the events table's max ts (2024-01-30) so ages stay positive.
RUN_TS = "2024-02-01 00:00:00"

_PLAN_MODULES = (
    "core",
    "cleaning",
    "json_text",
    "windows",
    "joins",
    "asof",
    "rangejoin",
    "silver",
    "gold",
    "dedup",
    "similarity",
    "text_analysis",
    "multimodal",
    "streaming_windows",
    "inference",
    "sql_surface",
    "digest",
    "olap",
    "analytics_ext",
    "curation",
    "day2",
    "mix",
    "sources_surface",
)

#: The round whose driver run will check CHECK_PRIORITY[:50]. The
#: staleness guard (tests/test_entry.py) measures every query's row age
#: against THIS round, not against whichever CORRECTNESS files happen to
#: exist - so the test's verdict is stable across the moment the current
#: round's results land, and flips red exactly when a new round starts
#: without the window being rebuilt.
WINDOW_ROUND = 4


#: Driver-check priority: the grading driver verifies only the FIRST 50
#: registered queries each round. Round-4 window = (a) the two NEW
#: registrations (first driver rows), (b) every query whose implementing
#: code changed this round - the k-means family (md5 seeding + the
#: vectorized assignment kernel changed both the engine output and the
#: oracles) and the whole LSH-candidate-consuming family (the bucket-skew
#: salt guard rewrote lsh_candidates and its oracle twin _CANDIDATES_SQL)
#: - then (c) all 25 queries whose only green row is from round 1 (the
#: precomputed r4 rotation debt; the staleness guard
#: tests/test_entry.py::test_no_query_staler_than_two_rounds fails at
#: WINDOW_ROUND=4 without them), and (d) 12 of the 39 round-2-only
#: greens, oldest-evidence families first (gold/SCD flagships, the
#: streaming + sessionization bench headliners, the similarity family
#: adjacent to this round's ANN work, and the curation split siblings).
CHECK_PRIORITY: tuple[str, ...] = (
    # -- new this round (need FIRST driver rows) -------------------------
    "ann_multitable_recall",          # E24: recall@5 with full SQL ANN replay
    "cluster_split_audit",            # E28: per-split leakage audit, 0 straddles
    "s2_retry_backoff",               # S2: retry wrapper, contract oracle
    "s4_csv_fallback_roundtrip",      # S4: CSV sink roundtrip vs parquet truth
    "s10_dynamic_ddl",                # S10: schema->DDL text contract
    "dedup_substring_spans",          # Lee-et-al substring dedup spans
    "stats_quantile_sketch",          # E37: GK sketch beside exact quantiles
    "decontamination_bloom",          # E38: bloom prefilter, no-loss proof
    "kmeans_twolevel_clusters",       # E39: hierarchical k-means, SQL replay
    "ann_ivf_kmeans_recall",          # E40: IVF over the k-means quantizer
    "kmeans_incremental_assign",      # E41: frozen-model delta assignment
    # -- code changed this round (old rows stopped vouching) -------------
    "kmeans_embedding_clusters",      # md5 seeding + vectorized kernel
    "semdedup_prune",                 # md5 seeding + vectorized pair-dot
    "sample_cluster_balanced",        # rides the reseeded k-means model
    "dedup_minhash_lsh",              # lsh_candidates bucket-skew salt guard
    "dedup_ngram_jaccard",            # consumes guarded candidates
    "dedup_editdistance_pairs",       # consumes guarded candidates
    "dedup_incremental",              # consumes guarded candidates
    "dedup_clusters",                 # CC over guarded candidate edges
    "curation_docs_ledger",           # ledger composes the guarded CC
    "curation_funnel",                # funnel over the same ledger
    "training_mix_shards",            # end-to-end chain over guarded CC
    # -- round-1-only greens: the precomputed r4 rotation debt (25) ------
    "a1_language_distribution", "a2_event_type_distribution",
    "a3_engagement_stats", "a5_latest_user_snapshot",
    "a7_dedup_keep_first", "a8_null_profile",
    "a12_daily_modal_event_type", "a14_table_stats",
    "dedup_exact", "f1_html_clean", "f2_json_array_ops",
    "f4_json_field_extraction", "f5_json_roundtrip", "f9_date_dimension",
    "f11_user_activity_age", "f12_engagement_ratio",
    "o1_global_sort", "o2_top_events",
    "p2_time_window_cutoff", "p6_normalized_documents",
    "p_clean_documents", "p_clean_events",
    "q1_pricing_summary", "sim_cosine_topk", "x1_token_frequencies",
    # -- oldest round-2-only greens, rotated back in (3 of 39; five
    # -- slots went to the late-r4 registrations above - sim_lsh_buckets,
    # -- sim_ivf_probe_topk, sim_embedding_near_dups,
    # -- stream_tumbling_counts, and sessionization_gaps move to the r5
    # -- debt instead) ---------------------------------------------------
    "g1_daily_engagement_summary", "g2_top_performing_content",
    "m1_scd2_account_dim",
)

#: Round-5 rotation debt, precomputed: after the r4 driver run, the 31
#: round-2-only greens NOT in the window above will be two rounds old -
#: at WINDOW_ROUND=5 the staleness guard requires all of them in the r5
#: window (leaving 19 slots for r5's new/changed code):
#:   asof_join_latest_order, digest_run_summary, dq_violation_summary,
#:   mm_binary_metadata, mm_frame_sample, olap_cube_type_weekend,
#:   olap_grouping_sets, olap_pivot_status_qty,
#:   olap_rollup_returnflag_status, p7_top_positive_docs, pii_redaction,
#:   rangejoin_value_bands, rolling_7day_user_value,
#:   session_window_native, setops_user_segments, split_train_val_test,
#:   sql_surface_daily_trends, sql_surface_star_revenue, stats_moments,
#:   stats_value_quantiles, stream_dedup_events, stream_sliding_value_avg,
#:   stream_static_join_segments, text_fingerprint, text_language_id,
#:   text_quality_scores, text_token_counts, tfidf_top_terms,
#:   u2_sentiment_distribution, u3_udtf_tokenize, w_rank_family.
#: Plus sim_lsh_buckets, sim_ivf_probe_topk, sim_embedding_near_dups,
#: stream_tumbling_counts, and sessionization_gaps (r2-only greens
#: whose r4 window slots went to the late-r4 registrations
#: stats_quantile_sketch / decontamination_bloom /
#: kmeans_twolevel_clusters / ann_ivf_kmeans_recall /
#: kmeans_incremental_assign) -> 36 names, 14 free r5 slots.


def ordered_queries() -> dict[str, QueryFn]:
    """QUERIES reordered: CHECK_PRIORITY first, then registration order."""
    out = {n: QUERIES[n] for n in CHECK_PRIORITY if n in QUERIES}
    out.update((n, f) for n, f in QUERIES.items() if n not in out)
    return out


def ordered_oracles() -> dict[str, str]:
    out = {n: ORACLES[n] for n in CHECK_PRIORITY if n in ORACLES}
    out.update((n, s) for n, s in ORACLES.items() if n not in out)
    return out


def register(name: str, oracle: str | None = None):
    """Decorator: register a query builder and (optionally) its SQL oracle."""
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn
    return deco


def load_all_plans() -> None:
    """Import every plan module so its @register decorators run."""
    for mod in _PLAN_MODULES:
        try:
            importlib.import_module(f"{__package__}.{mod}")
        except ModuleNotFoundError as exc:
            # Allow partially-built plan sets during development; only
            # swallow "module itself missing", not errors inside it.
            if exc.name != f"{__package__}.{mod}":
                raise
