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
WINDOW_ROUND = 6


#: Driver-check priority: the grading driver verifies only the FIRST 50
#: registered queries each round. Round-6 window (VERDICT r5 #1) = (a)
#: the 29 round-3-only greens (the precomputed r6 rotation debt - at
#: WINDOW_ROUND=6 the staleness guard tests/test_entry.py::test_no_
#: query_staler_than_two_rounds fails without every one of them), (b)
#: the TWO new r6 registrations (E43 incremental SemDeDup; the IVF
#: layout probe row that makes the VERDICT-r5-#2 partitioned serving
#: path oracle-checked end-to-end), (c) the three queries whose
#: implementing code changed this round (the E42 ceiling/rename nits,
#: the bloom cache_handles seam, the s4 module-level _RUN_TAG), and
#: (d) 16 round-4-only greens rotated proactively - all 46 remaining
#: r4 names fall due at r7, so prefilling the E43-adjacent
#: kmeans/semdedup/dedup family, the delta-spike-adjacent SCD row, and
#: the heavyweight flagships now leaves r7 with 30 debt names + 20
#: free slots instead of 46 + 4.
CHECK_PRIORITY: tuple[str, ...] = (
    # -- new this round (needs a FIRST driver row) -----------------------
    "semdedup_incremental",           # E43: delta-vs-corpus semantic dedup
    "ann_ivf_layout_probe",           # cluster-partitioned IVF serving path
    # -- code changed this round (old rows stopped vouching) -------------
    "semdedup_miss_audit",            # _MISS_CEIL 0.85 + derived CTE rename
    "decontamination_bloom",          # cache_handles ownership seam
    "s4_csv_fallback_roundtrip",      # module-level _RUN_TAG
    # -- round-3-only greens: the precomputed r6 rotation debt (29) ------
    "a11_approx_distinct", "a6_dedup_latest_version",
    "chunk_context_windows", "day2_incremental_counts",
    "day2_schema_evolution", "dedup_simhash", "f1_html_entities",
    "j1_change_detection", "j2_dimension_lookup", "j3_band_join",
    "j4_anti_join_missing_fk", "j5_semi_join_cleanup",
    "m2_idempotent_dim_insert", "m4_surrogate_keys", "m5_orphan_cleanup",
    "mm_decode_features", "mm_image_resize", "pack_token_shards",
    "s9_ddl_catalog", "sample_stratified", "stream_file_sink_counts",
    "stream_interval_join", "temperature_mix_counts",
    "text_gopher_quality", "text_repetition", "topk_per_group_docs",
    "u2_sentiment_inference", "w1_user_engagement_rank",
    "w2_user_daily_value_change",
    # -- round-4-only greens rotated early (17 of 46; the rest are r7
    # -- debt) - the E43-adjacent kmeans/semdedup/incremental family,
    # -- the SCD row the delta-format spike touches, and the
    # -- heavyweight bench flagships.
    "kmeans_incremental_assign", "semdedup_prune", "dedup_incremental",
    "kmeans_embedding_clusters", "ann_multitable_recall",
    "dedup_substring_spans", "training_mix_shards",
    "m1_scd2_account_dim", "sim_cosine_topk", "sample_cluster_balanced",
    "cluster_split_audit", "dedup_exact", "dedup_minhash_lsh",
    "dedup_clusters", "g1_daily_engagement_summary",
    "q1_pricing_summary",
)

#: Round-7 rotation debt, precomputed: after the r6 driver run the 30
#: round-4-only greens NOT in the r6 window fall due (at WINDOW_ROUND=7
#: every one of them needs a slot, leaving 20 for r7's new/changed
#: code):
#:   a12_daily_modal_event_type, a14_table_stats,
#:   a1_language_distribution, a2_event_type_distribution,
#:   a3_engagement_stats, a5_latest_user_snapshot, a7_dedup_keep_first,
#:   a8_null_profile, curation_docs_ledger, curation_funnel,
#:   dedup_editdistance_pairs, dedup_ngram_jaccard,
#:   f11_user_activity_age, f12_engagement_ratio, f1_html_clean,
#:   f2_json_array_ops, f4_json_field_extraction, f5_json_roundtrip,
#:   f9_date_dimension, g2_top_performing_content, o1_global_sort,
#:   o2_top_events,
#:   p2_time_window_cutoff, p6_normalized_documents, p_clean_documents,
#:   p_clean_events, s10_dynamic_ddl, s2_retry_backoff,
#:   stats_quantile_sketch, x1_token_frequencies.
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
