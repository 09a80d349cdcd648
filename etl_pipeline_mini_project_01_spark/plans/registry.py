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
WINDOW_ROUND = 7


#: Driver-check priority: the grading driver verifies only the FIRST 50
#: registered queries each round. Round-7 window (VERDICT r6 #1) = (a)
#: the 30 round-4-only greens (the precomputed r7 rotation debt - at
#: WINDOW_ROUND=7 the staleness guard tests/test_entry.py::test_no_
#: query_staler_than_two_rounds fails without every one of them), (b)
#: the ONE new r7 registration (versioned time travel, VERDICT r6 #4),
#: (c) the two queries whose implementing code changed this round (the
#: E44 build fix + probe-mode auto-select in operators/ivf_layout.py;
#: the JVM bloom probe in operators/decontaminate.py), and (d) 17
#: round-5-only greens rotated proactively - all 48 remaining r5 names
#: fall due at r8, so prefilling the bench-headline flagships (the gold
#: MV family, j7, kmeans_twolevel, ann_ivf_kmeans_recall,
#: sessionization, stream_tumbling, text_quality), the bloom-adjacent
#: exact-decon row, and the IVF-adjacent sim_ivf_probe_topk now leaves
#: r8 with 31 debt names + 19 free slots instead of 48 + 2.
CHECK_PRIORITY: tuple[str, ...] = (
    # -- new this round (needs a FIRST driver row) -----------------------
    "versioned_time_travel",          # snapshot/time-travel driver row
    # -- code changed this round (old rows stopped vouching) -------------
    "ann_ivf_layout_probe",           # E44 build fix + probe auto-select
    "decontamination_bloom",          # JVM bloom_filter_agg probe path
    # -- round-4-only greens: the precomputed r7 rotation debt (30) ------
    "a12_daily_modal_event_type", "a14_table_stats",
    "a1_language_distribution", "a2_event_type_distribution",
    "a3_engagement_stats", "a5_latest_user_snapshot",
    "a7_dedup_keep_first", "a8_null_profile", "curation_docs_ledger",
    "curation_funnel", "dedup_editdistance_pairs", "dedup_ngram_jaccard",
    "f11_user_activity_age", "f12_engagement_ratio", "f1_html_clean",
    "f2_json_array_ops", "f4_json_field_extraction", "f5_json_roundtrip",
    "f9_date_dimension", "g2_top_performing_content", "o1_global_sort",
    "o2_top_events", "p2_time_window_cutoff", "p6_normalized_documents",
    "p_clean_documents", "p_clean_events", "s10_dynamic_ddl",
    "s2_retry_backoff", "stats_quantile_sketch", "x1_token_frequencies",
    # -- round-5-only greens rotated early (17 of 48; the rest are r8
    # -- debt) - the bench-headline flagships, the bloom-adjacent exact
    # -- decon row, and the IVF-adjacent probe family.
    "ann_ivf_kmeans_recall", "kmeans_twolevel_clusters",
    "decontamination_scores", "j7_star_join_region_revenue",
    "g3_account_influence", "g4_hashtag_performance",
    "g5_hourly_posting_patterns", "g6_daily_event_trends",
    "g7_viral_content", "sessionization_gaps", "stream_tumbling_counts",
    "text_quality_scores", "silver_fact_build", "sim_ivf_probe_topk",
    "asof_join_latest_order", "dq_violation_summary", "tfidf_top_terms",
)

#: Round-8 rotation debt, precomputed: after the r7 driver run the 31
#: round-5-only greens NOT in the r7 window fall due (at WINDOW_ROUND=8
#: every one of them needs a slot, leaving 19 for r8's new/changed
#: code). The due set is the 48 r5-only names minus the 17 rotated
#: above:
#:   digest_run_summary, mm_binary_metadata, mm_frame_sample,
#:   olap_cube_type_weekend, olap_grouping_sets, olap_pivot_status_qty,
#:   olap_rollup_returnflag_status, p7_top_positive_docs, pii_redaction,
#:   rangejoin_value_bands, rolling_7day_user_value,
#:   session_window_native, setops_user_segments,
#:   sim_embedding_near_dups, sim_lsh_buckets, skew_salted_aggregate,
#:   split_train_val_test, sql_surface_daily_trends,
#:   sql_surface_star_revenue, stats_moments, stats_value_quantiles,
#:   stream_dedup_events, stream_sliding_value_avg,
#:   stream_stateful_running_totals, stream_static_join_segments,
#:   text_fingerprint, text_language_id, text_token_counts,
#:   u2_sentiment_distribution, u3_udtf_tokenize, w_rank_family.
#:
#: Round-8 registration candidates (the r7 window was full, so these
#: shipped as pytest+curve surfaces per the capacity policy): E46
#: hierarchical IVF layout and E47 product quantization both have
#: deterministic, SQL-replayable math (the same kmeans CTE recipe as
#: ann_ivf_kmeans_recall; PQ's grouped train is kmeans over an
#: exploded (s, subvector) relation) if a driver row is wanted.
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
