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
    graph,
    joins,
    metrics,
    multimodal,
    plans_battery,
    retrieval,
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
# Staleness ledger (newest green driver row per entry, after round 11):
#   r11 (50): the 12 round-10 additions that opened the round-11 window,
#     the 35-entry r5 refresh block, and the three round-11 additions
#     (cdc_ann_index_upserts, corpus_epoch_shuffle, text_bpe_bytes).
#   r10 (50): the 13 round-10 additions checked in-round, the 6 entries
#     modified in round 10, the 30 last r3-stale refreshes, and
#     rag_late_interaction / text_wordpiece_segment.
#   r9 (47) / r8 (50) / r7 (50): see CORRECTNESS_r07..r09.
#   r6 (50): TPC-DS waves 4-9 (29), streaming MVs, windows battery,
#     approx-agg family, cdc_scd2_late_events.
#   r5 (15): the documented r5 tail (refreshed by this window).
#   never: the 6 round-11 additions that did not fit the round-11
#     window (refreshed FIRST by this window).
#
# Round-12 window (below), exactly the documented round-12 plan from
# round 11 (VERDICT r11 item 1):
#   (a) the six round-11 additions with no driver row yet — green at
#       both gate scales in the recorded round-11 dual-scale drives and
#       in the round-11 judge's own 318-query drive, but never
#       driver-checked;
#   (b) the 15-entry r5 tail, in CORRECTNESS_r05 ledger order (the
#       three names displaced by round-11's group (c) first, matching
#       the documented list);
#   (c) the first 24 of the 50-entry r6 block, in CORRECTNESS_r06
#       ledger order — the r6 rotation VERDICT r11 item 1 schedules
#       after the tail;
#   (d) the round-12 additions (graph_cc_labels, dedup_cluster_cc,
#       graph_cc_incremental, graph_cc_twophase, stream_cc_labels_mv),
#       taking the last five group (c) slots — their displaced r6 names
#       (ds_return_rank_union, ds_priority_month_matrix,
#       ds_before_after_split, ds_category_share_window,
#       ds_best_customer_frequent_parts) keep valid r6 evidence and
#       lead the round-13 tail below.
# After this round nothing predates r6.
_WINDOW_PRIORITY = [
    # (a) never driver-checked round-11 additions
    "rag_rm3_expansion",
    "graph_pagerank_bipartite",
    "graph_bfs_distance",
    "stream_epoch_shuffle_mv",
    "table_vacuum_retention",
    "text_bpe_bytes_train",
    # (b) the 15-entry r5 tail
    "ds_ntile_spend_bands",
    "corpus_domain_stats",
    "text_boilerplate_blocks",
    "ds_moving_avg_deviation",
    "ds_first_purchase_cohort",
    "ds_median_brand_price",
    "ds_pareto_brands",
    "ds_reactivated_customers",
    "ds_top_percent_customers",
    "ds_growth_streaks",
    "ds_priority_segment_matrix",
    "dedup_ngram_jaccard",
    "validate_hashdiff_summary",
    "join_asof",
    "dedup_minhash_lsh",
    # (c) r6 refresh block: first 24 of the r6 ledger, in
    # CORRECTNESS_r06 order
    "ds_repeat_part_purchases",
    "ds_rebuy_after_return",
    "ds_cummax_drawdown",
    "ds_nation_concentration",
    "ds_high_return_customers",
    "ds_premium_parts",
    "ds_demand_volatility_pairs",
    "ds_multiband_or_filter",
    "ds_return_latency_buckets",
    "ds_post_adoption_spend",
    "ds_cross_year_retention",
    "ds_channel_spread_balance",
    "ds_exists_notexists_orders",
    "ds_preferred_channel_dist",
    "ds_best_worst_parts",
    "ds_customer_return_ratio",
    "ds_cube_matrix",
    "ds_above_global_avg",
    "ds_rank_ties_topk",
    "ds_grouping_flag_rollup",
    "ds_filtered_distinct_matrix",
    "ds_quantity_dispersion",
    "ds_low_velocity_parts",
    "ds_weekday_wow_ratio",
    # (d) round-12 additions (see comment above)
    "graph_cc_labels",
    "dedup_cluster_cc",
    "graph_cc_incremental",
    "graph_cc_twophase",
    "stream_cc_labels_mv",
]
# Round-13 window plan (mechanical, from the ledger): FIRST any
# round-12 addition without a driver row (as of this writing:
# graph_triangle_count, rag_eval_metrics, graph_ppr_seeded,
# corpus_dup_rate_by_source, graph_cc_decremental — each driven green at all
# three scales in the recorded round-12 drives), THEN the 26-entry
# r6 tail in
# CORRECTNESS_r06 ledger order — ds_return_rank_union,
# ds_priority_month_matrix, ds_before_after_split,
# ds_category_share_window, ds_best_customer_frequent_parts,
# stream_incremental_mv, stream_funnel_stages, events_funnel_stages,
# text_ngram_novelty, corpus_temperature_mix, mm_audio_features,
# mm_video_features, emb_neardup_lsh, agg_approx_distinct,
# agg_hll_sketch_rollup, knn_ivf_recall_cert, win_dedup_latest,
# win_topn_per_group, win_moving_avg, win_running_sum,
# win_baseline_offset, win_lag_gap, win_sessionize, win_snapshot_asof,
# win_scd2_intervals, cdc_scd2_late_events — then the r7 block starts
# rotating (CORRECTNESS_r07 ledger order). Done when nothing predates
# r7 except the documented tail.


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
