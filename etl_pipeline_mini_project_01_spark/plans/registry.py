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
)

#: The round whose driver run will check CHECK_PRIORITY[:50]. The
#: staleness guard (tests/test_entry.py) measures every query's row age
#: against THIS round, not against whichever CORRECTNESS files happen to
#: exist - so the test's verdict is stable across the moment the current
#: round's results land, and flips red exactly when a new round starts
#: without the window being rebuilt.
WINDOW_ROUND = 3


#: Driver-check priority: the grading driver verifies only the FIRST 50
#: registered queries each round. Round-3 window = (a) every query that
#: is new, never-checked, or whose implementing code changed this round,
#: then (b) the oldest round-1-green carries, rotated back in so no
#: query's driver row goes stale beyond 2 rounds
#: (tests/test_entry.py::test_no_query_staler_than_two_rounds enforces
#: this against the CORRECTNESS_r*.json history). The 14 round-1 carries
#: that do not fit (f2/f4 json twins, a1/a2/a3 scalar aggs, o1/o2 sorts,
#: p2/p_clean_documents, f9/f11 date ops, f12 ratio, a8 profile,
#: f1_html_clean - evicted late in round 3 for the code-changed
#: dedup_simhash, whose r2 row stopped vouching after the wide-agg
#: rework) plus the unchanged round-2 greens rotate in next round. The
#: five mix/interval-join registrations plus s9_ddl_catalog (new code -
#: they need FIRST driver rows) evict six more r1-green carries
#: (f5_json_roundtrip, x1_token_frequencies, q1_pricing_summary,
#: dedup_exact, sim_cosine_topk, a7_dedup_keep_first - a6's window
#: twin vouches for the shared keep-first machinery); their r1 rows
#: keep them inside the staleness budget until the round-4 rotation.
#: kmeans_embedding_clusters, semdedup_prune, sample_cluster_balanced,
#: dedup_incremental, and temperature_mix_counts (new this round) evict
#: five more carries (p6_normalized_documents, a14_table_stats,
#: p_clean_events, a12_daily_modal_event_type, a5_latest_user_snapshot -
#: all r1-green, unchanged code, re-check r4).
CHECK_PRIORITY: tuple[str, ...] = (
    # -- fixed / changed this round (need fresh green) -------------------
    "mm_decode_features",             # r2's only err row: scalar bins + oracle
    "u2_sentiment_inference",         # new per-row oracle, exact-rational score
    "stream_stateful_running_totals",  # new oracle, decimal-scaled state
    "a11_approx_distinct",            # new within-2pct verdict surface
    "f1_html_entities",               # astral decimal-entity guard
    "dedup_minhash_lsh",              # short-doc shingle guard + wide-agg rework
    "dedup_ngram_jaccard",            # shingle guard + broadcast hint dropped
    "dedup_editdistance_pairs",       # shingle guard + broadcast hint dropped
    "dedup_simhash",                  # wide-agg rework (32 vote sums, no explode)
    "dedup_clusters",                 # large-star/small-star components
    "stream_file_sink_counts",        # per-run scratch isolation
    # -- never driver-checked / new this round ---------------------------
    "sample_stratified",
    "topk_per_group_docs",
    "curation_docs_ledger",
    "curation_funnel",
    "day2_incremental_counts",        # incremental/compact/cluster invariants
    "day2_schema_evolution",          # mergeSchema union-schema invariants
    "text_gopher_quality",            # integer-scaled Gopher rules
    "text_repetition",                # top-bigram repetition gate
    "mm_image_resize",                # 8x8 resize plumbing, hex-exact oracle
    "chunk_context_windows",          # context-window chunking (plans/mix.py)
    "decontamination_scores",         # benchmark n-gram decontamination
    "pack_token_shards",              # distributed-prefix-sum shard packing
    "training_mix_shards",            # end-to-end curation chain
    "stream_interval_join",           # stream-stream interval join
    "s9_ddl_catalog",                 # S9 executor catalog inventory
    "kmeans_embedding_clusters",      # integer-exact distributed Lloyd's
    "semdedup_prune",                 # SemDeDup over the k-means clusters
    "sample_cluster_balanced",        # per-cluster diversity quota
    "dedup_incremental",              # delta-vs-corpus near-dup
    "temperature_mix_counts",         # sqrt-temperature rebalance audit
    # -- oldest round-1 greens, rotated back in (26 of 44) ---------------
    "g6_daily_event_trends", "g3_account_influence",
    "g4_hashtag_performance", "g5_hourly_posting_patterns",
    "g7_viral_content",
    "j1_change_detection", "j2_dimension_lookup", "j3_band_join",
    "j4_anti_join_missing_fk", "j5_semi_join_cleanup",
    "j7_star_join_region_revenue", "skew_salted_aggregate",
    "m2_idempotent_dim_insert", "m4_surrogate_keys", "m5_orphan_cleanup",
    "silver_fact_build",
    "w1_user_engagement_rank", "w2_user_daily_value_change",
    "a6_dedup_latest_version",
)

#: Round-4 rotation debt, precomputed: after the r3 driver run, these 25
#: queries' newest green row is from ROUND 1 (not in r2's results, not
#: in the r3 window above) - at WINDOW_ROUND=4 the staleness guard
#: requires every one of them in the r4 window (leaving 25 slots for
#: r4's new/changed code). The r4 builder starts here:
#:   a1/a2/a3 scalar aggs, a5_latest_user_snapshot,
#:   a7_dedup_keep_first, a8_null_profile,
#:   a12_daily_modal_event_type,
#:   a14_table_stats, dedup_exact, f1_html_clean, f2_json_array_ops,
#:   f4_json_field_extraction, f5_json_roundtrip, f9_date_dimension,
#:   f11_user_activity_age, f12_engagement_ratio, o1_global_sort,
#:   o2_top_events, p2_time_window_cutoff, p6_normalized_documents,
#:   p_clean_documents, p_clean_events, q1_pricing_summary,
#:   sim_cosine_topk, x1_token_frequencies.


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
