"""Query registry: every graded query/operator in one place.

Each entry pairs a Spark DataFrame-API implementation with (where
SQL-expressible) a DuckDB oracle SQL string over the same parquet tables.
The driver's correctness gate runs both and hash-compares values, so:

- every computed column is aliased identically on both sides,
- float aggregates are rounded identically on both sides,
- any LIMIT/top-k is fully tie-broken so results are deterministic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = (), bench: bool = False):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags, bench=bench)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


def bench_queries() -> dict[str, QuerySpec]:
    return {name: spec for name, spec in REGISTRY.items() if spec.bench}


# Import side-effect modules that populate REGISTRY.
from lakehouse_tacklebox_spark.queries import (  # noqa: E402,F401
    aggregates,
    cdc_battery,
    corpus_extra,
    joins,
    metrics,
    multimodal,
    plans_battery,
    scalars,
    setops,
    similarity,
    sql_surface,
    storage_battery,
    streaming_battery,
    textops,
    tpch,
    tpch_extra,
    tpch_extra2,
    tpch_extra3,
    tpcds_shapes,
    tpcds_shapes2,
    tpcds_shapes3,
    tpcds_shapes4,
    tpcds_shapes5,
    tpcds_shapes6,
    tpcds_shapes7,
    tpcds_shapes8,
    tpcds_shapes9,
    tpcds_shapes10,
    tpcds_shapes11,
    tpcds_shapes12,
    tpcds_shapes13,
    tpcds_shapes14,
    tpcds_shapes15,
    tpcds_shapes16,
    tpcds_shapes17,
    tpcds_shapes18,
    validation,
    windows,
)

# The correctness driver checks queries in registration order and caps the
# verified set at 50 per round (every round so far stopped at entry 50).
# Order the registry so every entry's NEWEST green row stays recent across
# the union of rounds; never-checked entries get evidence first.
#
# Staleness ledger (newest green driver row per entry, after round 8):
#   r8 (50): the 46 round-7 additions (TPC-DS waves 16-18, sketch/
#     profiler family, stream-stream FULL/SEMI/ANTI + retraction MVs,
#     multimodal near-dup trio, containment/spans/bigram/cascade/split/
#     epoch-plan, SQL-surface trio, win_session_dynamic_gap,
#     table_skipping_pointlookup, agg_approx_quantiles_cert,
#     metrics_anomaly_days, table_version_diff) + knn_ivf +
#     optimizer_strategy_loop + q18/q19.
#   r7 (50): TPC-DS waves 10-15 (26), TPC-H q1-q17 ex q15 (16),
#     stream_incremental_join_mv, stream_dedup_within_watermark,
#     stream_stream_left_join, text_nearest_neighbor,
#     corpus_weighted_sample, corpus_chunk_windows,
#     join_bucketed_colocated, stream_idempotent_mv_replay.
#   r6 (50): TPC-DS waves 4-9 (29), stream_incremental_mv,
#     stream_funnel_stages, events_funnel_stages, text_ngram_novelty,
#     corpus_temperature_mix, mm_audio_features, mm_video_features,
#     emb_neardup_lsh, agg_approx_distinct, agg_hll_sketch_rollup,
#     knn_ivf_recall_cert, windows battery (9), cdc_scd2_late_events.
#   r5 (50): aggregates battery, joins battery, set ops, scalars,
#     TPC-DS waves 1-3, dedup/ANN/text family refreshes.
#   r3 (30 after this window drains 19; corpus_tfidf_top,
#     join_interval_overlap, text_html_strip, mm_block_dedup,
#     metrics_error_bursts, metrics_daily_trend, and ds_channel_rollup
#     returned to the pool as round-9 additions took their slots):
#     agg_rollup/pivot, join_left_
#     outer/anti/semi/full_outer/range_band/multiway_using,
#     metrics_ops_summary/percentiles, event_log_json_analytics,
#     mm_metadata_by_mime, mm_frame_stats, profile_customer,
#     scalar_strings/dates/json, knn_bruteforce, emb_neardup_pairs,
#     emb_label_centroids, stream_stateful_dedup, dedup_exact_stats,
#     dedup_exact_survivors, corpus_tfidf_top, join_interval_overlap,
#     text_html_strip, mm_block_dedup, metrics_error_bursts,
#     metrics_daily_trend, ds_channel_rollup — round 10's refresh block.
#   r2: NONE after this window (the last 14 are in it).
#   never: NONE after this window (the 8 round-8 post-freeze additions
#     and the 2 round-9 additions are in it).
#
# Round-9 window (below): the 8 round-8 post-freeze additions + the 9
# round-9 additions (text_bpe_train, cdc_ann_index_deletes,
# knn_sq_rerank, mm_image_crop_match, knn_ivf_pruned_scan,
# mm_image_freecrop_match, knn_ivfpq_pruned_store,
# knn_matryoshka_rerank, text_span_excision) + the 14 r2-stale entries
# + the 19 oldest r3 greens in CORRECTNESS_r03 ledger order. VERDICT r8 item 1: after this round never-checked drops to 0
# for the first time and no entry's newest green row predates r3.
_WINDOW_PRIORITY = [
    # (a) never driver-checked: round-8 post-freeze additions
    "knn_pq_rerank",
    "dedup_semantic_clusters",
    "mm_audio_snippet_match",
    "mm_video_snippet_match",
    "stream_pq_index_mv",
    "knn_ivfpq_rerank",
    "text_bpe_tokenize",
    "text_bpe_pair_census",
    # (a cont.) never driver-checked: new this round
    "text_bpe_train",
    "cdc_ann_index_deletes",
    "knn_sq_rerank",
    "mm_image_crop_match",
    "knn_ivf_pruned_scan",
    "mm_image_freecrop_match",
    "knn_ivfpq_pruned_store",
    "knn_matryoshka_rerank",
    "text_span_excision",
    # (b) the 14 r2-stale entries (newest green row = round 2)
    "q20_excess_share_suppliers",
    "q21_waiting_suppliers",
    "q22_dormant_customer_balance",
    "q_top_supplier",
    "text_langid",
    "text_quality",
    "text_token_stats",
    "text_fingerprint_groups",
    "metrics_user_activity",
    "metrics_top_durations",
    "metrics_cost_efficiency",
    "stream_hourly_rollup",
    "validate_diff_drilldown",
    "reconcile_counts_by_grain",
    # (c) the 19 oldest r3 greens, CORRECTNESS_r03 ledger order
    "stream_stateful_user_stats",
    "metrics_error_classes",
    "metrics_activity_heatmap",
    "join_salted_skew",
    "dedup_simhash",
    "agg_grouping_sets",
    "dedup_cluster_assign",
    "sample_stratified",
    "corpus_shard_pack",
    "text_pii_scrub",
    "text_decontaminate",
    "corpus_vocab",
    "stream_stream_join",
    "stream_session_window",
    "text_repetition_filter",
    "dedup_incremental",
    "corpus_pipeline",
    "emb_quantize_stats",
    "ds_multi_count_buckets",
]
# Round-10 window plan (mechanical, from the ledger): the 23 remaining
# r3 entries (list above) + any round-9 post-freeze additions + the
# oldest r5 greens to fill 50 (aggregates/joins/set-ops/scalars
# batteries, r5 ledger order). Done when no entry's newest green row is
# older than r5.


def _reorder_registry() -> None:
    # Fail LOUDLY on a stale window name: a silent `if n in REGISTRY`
    # filter would let a typo or renamed query shrink the 50-slot checked
    # window and promote an unintended entry into the gated range.
    unknown = sorted(set(_WINDOW_PRIORITY) - set(REGISTRY))
    assert not unknown, f"_WINDOW_PRIORITY names not in REGISTRY: {unknown}"
    assert len(_WINDOW_PRIORITY) == len(set(_WINDOW_PRIORITY)) == 50, (
        f"window must be exactly the driver's 50 checked slots, got {len(_WINDOW_PRIORITY)}"
    )
    prioritized = list(_WINDOW_PRIORITY)
    rest = [n for n in REGISTRY if n not in _WINDOW_PRIORITY]
    rest_oracled = [n for n in rest if REGISTRY[n].oracle is not None]
    rest_no_oracle = [n for n in rest if REGISTRY[n].oracle is None]
    ordered = {n: REGISTRY[n] for n in prioritized + rest_oracled + rest_no_oracle}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()
