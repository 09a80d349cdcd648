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
)


#: Driver-check priority. The round-1 grading driver verified only the
#: FIRST 50 registered queries, leaving 25 families unchecked; per
#: VERDICT.md "Next round #3", the never-checked families, every query
#: changed this round, and a covering set of SURVEY §2 operator evidence
#: are ordered into the 50-query window. Long-green entries past slot 50
#: keep their CORRECTNESS_r01.json green rows (code unchanged) and rotate
#: back in future rounds.
CHECK_PRIORITY: tuple[str, ...] = (
    # -- round-1 red rows, fixed this round (need fresh green) ----------
    "m1_scd2_account_dim", "g1_daily_engagement_summary",
    "dedup_simhash", "dedup_ngram_jaccard",
    # -- changed this round (LSH blocking shared text / rank-after-limit)
    "dedup_minhash_lsh", "g2_top_performing_content",
    # -- new this round --------------------------------------------------
    "f1_html_entities", "stream_file_sink_counts", "asof_join_latest_order",
    # -- never checked in round 1 (25) -----------------------------------
    "sim_lsh_buckets", "sim_embedding_near_dups", "sim_ivf_probe_topk",
    "text_quality_scores", "text_language_id", "text_token_counts",
    "text_fingerprint",
    "mm_binary_metadata", "mm_decode_features",
    "stream_tumbling_counts", "stream_sliding_value_avg",
    "sessionization_gaps", "stream_stateful_running_totals",
    "session_window_native",
    "u2_sentiment_inference", "u2_sentiment_distribution",
    "sql_surface_daily_trends", "sql_surface_star_revenue",
    "a11_approx_distinct",
    "p7_top_positive_docs", "digest_run_summary",
    "olap_rollup_returnflag_status", "olap_cube_type_weekend",
    "olap_pivot_status_qty", "setops_user_segments",
    # -- round-2 extensions with no driver row yet (rotated in; the §2
    # covering set they displace is UNCHANGED since round 1 and keeps its
    # green CORRECTNESS_r01.json rows, per VERDICT.md's rotation note) ---
    "rangejoin_value_bands",          # E2 bucketed interval join
    "stats_value_quantiles",          # E3 exact percentiles
    "rolling_7day_user_value",        # E4 RANGE-framed rolling window
    "w_rank_family",                  # E10 rank-function family
    "olap_grouping_sets",             # E9 GROUPING SETS
    "dedup_editdistance_pairs",       # E11 char-level near-dup
    "stats_moments",                  # decimal-exact var/stddev/corr
    "dq_violation_summary",           # DQ violation audit
    "mm_frame_sample",                # cardinality-changing decode
    "stream_static_join_segments",    # stream-static broadcast enrich
    "stream_dedup_events",            # E8 watermark-bounded dedup
    "u3_udtf_tokenize",               # Python UDTF via LATERAL
    "dedup_clusters",                 # E13 components -> keeper
    "split_train_val_test",           # E14 deterministic hash split
    "tfidf_top_terms",                # E16 salient terms
    "pii_redaction",                  # E17 PII scrub
    # sample_stratified and topk_per_group_docs stay past the window:
    # each shares its exact machinery with an in-window twin
    # (split_train_val_test's salted-hash threshold; w_rank_family's
    # windowed rank filter) and is mimic-verified at 3 SFs.
)


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
