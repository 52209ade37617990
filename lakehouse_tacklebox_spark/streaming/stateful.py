"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's streaming surface is ingest-and-merge (SURVEY §2.9); its
dedup always happens inside ``foreachBatch`` MERGEs, which means every
micro-batch pays a full target-table merge to answer "have I seen this
key before?". These operators keep that question in Spark's state store
instead: per-key state lives with the shuffle partition, scales
horizontally with executors, survives restarts through the checkpoint,
and never rescans the sink.

- ``stateful_dedup``: emit exactly one row per key across the stream's
  lifetime (the first by an explicit, deterministic ordering), with an
  optional processing-time TTL so state doesn't grow unboundedly at
  100 TB ingest rates (keys recycle after the TTL window — the same
  contract as Autoloader+MERGE dedup over a bounded lookback).
- ``stateful_running_agg``: cumulative per-key count/sum/min/max emitted
  every micro-batch the key appears in — a running-total operator that
  would otherwise need an unbounded-state ``complete``-mode aggregation.

Arrow moves each group's rows into pandas in batches (iterator API), so
per-row Python overhead is amortized; state values are tiny fixed-width
tuples.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def stateful_dedup(
    stream: DataFrame,
    keys: list[str],
    order_by: list[str],
    ttl_minutes: float | None = None,
) -> DataFrame:
    """Keep the first row per key (by ``order_by``) across micro-batches.

    Within a batch the minimum over ``order_by`` is taken (deterministic
    regardless of arrival order); across batches the state store
    remembers which keys already emitted. With ``ttl_minutes``, a key's
    state expires after that much processing time without traffic, after
    which the key may emit again (bounded-state mode).
    """
    out_schema: StructType = stream.schema
    order_cols = list(order_by)
    ttl_ms = int(ttl_minutes * 60_000) if ttl_minutes is not None else None

    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        best: pd.DataFrame | None = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            cand = pdf.sort_values(order_cols, kind="mergesort").head(1)
            best = (
                cand
                if best is None
                else pd.concat([best, cand]).sort_values(order_cols, kind="mergesort").head(1)
            )
        already = state.exists
        if not already:
            state.update((1,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if best is not None and not already:
            yield best

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return stream.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, "emitted tinyint", "append", timeout
    )


def stateful_running_agg(
    stream: DataFrame,
    keys: list[str],
    value_col: str,
) -> DataFrame:
    """Cumulative per-key stats: every micro-batch a key appears in emits
    one row with the running count / sum / min / max of ``value_col``.

    Sums accumulate in float64 — callers needing exact money totals
    should pre-scale to integer cents JVM-side (exact in float64 up to
    2^53) and cast back on the way out.
    """
    key_fields = [stream.schema[k] for k in keys]
    out_schema = StructType(key_fields).add("n_events", "long").add("total", "double").add(
        "vmin", "double"
    ).add("vmax", "double")

    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        n, total, vmin, vmax = state.get if state.exists else (0, 0.0, None, None)
        seen = False
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            if vals.empty:
                continue
            seen = True
            n += int(vals.size)
            total += float(vals.sum())
            bmin, bmax = float(vals.min()), float(vals.max())
            vmin = bmin if vmin is None else min(vmin, bmin)
            vmax = bmax if vmax is None else max(vmax, bmax)
        if not seen:
            return
        state.update((n, total, vmin, vmax))
        yield pd.DataFrame([list(key) + [n, total, vmin, vmax]], columns=[*keys, "n_events", "total", "vmin", "vmax"])

    return stream.groupBy(*keys).applyInPandasWithState(
        fn,
        out_schema,
        "n long, total double, vmin double, vmax double",
        "update",
        GroupStateTimeout.NoTimeout,
    )


def stateful_funnel(
    stream: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
    deadline_hours: float = 24.0,
    ttl_minutes: float | None = None,
    max_buffer: int = 10_000,
) -> DataFrame:
    """Per-user staged funnel (stage1 → stage2-within-deadline → stage3-
    within-deadline) as a STATEFUL streaming operator, robust to
    arbitrary event arrival order: state buffers each user's
    stage-relevant event times, and every micro-batch the staged anchors
    are recomputed from the buffer — a late-arriving early 'view'
    correctly re-anchors the whole chain, which no single-pass
    incremental rule can do. Emits (user, stage, anchor timestamps) each
    batch the user appears together with a monotone buffer counter; an
    update sink reconciles to the final answer by keeping each user's
    emission with the largest buffer (NOT max stage — a late earlier
    anchor can legitimately lower the stage).

    State growth: the view buffer collapses to its MINIMUM (the only
    view that can ever anchor the chain — a sufficient statistic), and
    clicks/purchases are pruned to the windows that can still produce an
    anchor for ANY future (lower) t1: clicks ≤ t1+deadline, purchases ≤
    t1+2·deadline. Clicks/purchases BELOW t1 must be kept — an even
    earlier view may still arrive and make them anchors — so state is
    O(distinct stage-2/3 event times in a ≤2·deadline window plus the
    pre-t1 tail), not "kilobytes per user" unconditionally.

    Per-key state is BOUNDED BY DEFAULT via ``max_buffer``: keys that
    have never seen a stage-1 view keep at most that many distinct
    click/purchase times (the EARLIEST ones — a later-arriving view
    anchors via the minimum in its window, so dropping the latest tail
    only loses anchors for views arriving inside that dropped tail).
    Keys WITH a view are pruned exactly by the deadline rule and never
    hit the cap in practice. Because the cap CAN under-report stage 2/3
    for a view that later lands past the dropped tail, every emission
    carries a sticky ``buffer_truncated`` flag: False means the key's
    answer is exact (the batch oracle must agree); True marks the keys
    where the bounded-state answer is a documented lower bound.

    KEY-count lifetime is the ``ttl_minutes`` dial: set it on a
    long-running stream so idle keys are dropped
    (ProcessingTimeTimeout, same contract as :func:`stateful_dedup`).
    Checkpoint compatibility: the state tuple widened from 4 to 5
    fields (``truncated``) and the output schema gained
    ``buffer_truncated``. A stream restarted from a checkpoint written
    by the 4-field version must use a NEW ``checkpointLocation`` — the
    engine validates the state schema at restore. The unpack below
    additionally pads ``truncated=0`` for a legacy 4-tuple in case the
    runtime hands one through.

    It is deliberately OFF by default because enabling a group-state
    timeout makes the engine schedule timeout-check micro-batches even
    when no data is pending — measured: an ``availableNow`` replay of
    the gate corpus runs ONE batch in ~6 s with NoTimeout but keeps
    triggering batches until the runner's await deadline (~300 s) with
    a 7-day TTL enabled. Finite replays and backfills should leave it
    None; 24/7 pipelines should set it and accept the idle-batch
    overhead as the price of bounded key counts.
    """
    deadline_ns = int(deadline_hours * 3600 * 1e9)
    ttl_ms = int(ttl_minutes * 60_000) if ttl_minutes is not None else None
    key_field = stream.schema[user_col]
    out_schema = (
        StructType([key_field])
        .add("stage", "integer")
        .add("n_buffered", "long")
        .add("buffer_truncated", "boolean")
    )
    s1, s2, s3 = stages

    def _anchor(times: list, lo: int | None) -> int | None:
        if lo is None:
            return None
        cands = [t for t in times if lo < t <= lo + deadline_ns]
        return min(cands) if cands else None

    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            # Tolerate a checkpoint written by the pre-`truncated` state
            # layout (4 fields): pad truncated=0. NOTE the engine itself
            # may reject a schema-changed checkpoint before this code
            # runs — treat the state-schema widening as
            # checkpoint-incompatible and start new deployments with a
            # fresh checkpointLocation (see docstring).
            st = tuple(state.get)
            views, clicks, purchases, n_seen = st[:4]
            truncated = st[4] if len(st) > 4 else 0
        else:
            views, clicks, purchases, n_seen, truncated = [], [], [], 0, 0
        views, clicks, purchases = list(views), list(clicks), list(purchases)
        seen = False
        for pdf in pdfs:
            if pdf.empty:
                continue
            seen = True
            ns = pdf[ts_col].astype("int64")
            et = pdf[type_col]
            n_seen += int(len(pdf))
            views.extend(ns[et == s1].tolist())
            clicks.extend(ns[et == s2].tolist())
            purchases.extend(ns[et == s3].tolist())
        if not seen:
            return
        # sufficient-statistic compaction: min(view) is the only view
        # that can anchor; clicks past t1+D / purchases past t1+2D can
        # never anchor for any future (only-decreasing) t1
        views = [min(views)] if views else []
        t1_cur = views[0] if views else None
        clicks = sorted(set(clicks))
        purchases = sorted(set(purchases))
        if t1_cur is not None:
            clicks = [c for c in clicks if c <= t1_cur + deadline_ns]
            purchases = [p for p in purchases if p <= t1_cur + 2 * deadline_ns]
        else:
            # view-less key: no deadline prune applies, so cap the buffers
            # (earliest kept — see docstring) to bound state growth. The
            # cap is LOSSY for a view arriving later whose deadline window
            # falls in the dropped tail, so mark the key sticky-truncated —
            # a downstream consumer (or the batch oracle) can see exactly
            # which keys may under-report stage 2/3 instead of silently
            # diverging.
            if len(clicks) > max_buffer or len(purchases) > max_buffer:
                truncated = 1
            clicks = clicks[:max_buffer]
            purchases = purchases[:max_buffer]
        state.update((views, clicks, purchases, n_seen, truncated))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        t1 = views[0] if views else None
        t2 = _anchor(clicks, t1)
        t3 = _anchor(purchases, t2)
        stage = 3 if t3 is not None else 2 if t2 is not None else 1 if t1 is not None else 0
        # n_buffered is the monotone count of events EVER absorbed (not
        # the post-compaction buffer size, which can shrink), so an
        # appended update sink can reconcile to the LATEST emission with
        # max(struct(n_buffered, stage)) — required because stage itself
        # is NOT monotone: a late-arriving EARLIER stage-1 event
        # re-anchors the chain and can lower the stage.
        if stage:
            yield pd.DataFrame(
                {
                    user_col: [key[0]],
                    "stage": [stage],
                    "n_buffered": [n_seen],
                    "buffer_truncated": [bool(truncated)],
                }
            )

    return stream.groupBy(user_col).applyInPandasWithState(
        fn,
        out_schema,
        "views array<bigint>, clicks array<bigint>, purchases array<bigint>, n_seen bigint, truncated int",
        "update",
        GroupStateTimeout.ProcessingTimeTimeout if ttl_ms is not None else GroupStateTimeout.NoTimeout,
    )
