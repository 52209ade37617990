"""Bounded-memory frequency sketches: distributed Misra-Gries heavy
hitters with an exact verification pass.

Reference intent: the reference's profiling loop surfaces dominant
values per column (deltaoptimizer.py's cardinality/frequency stats);
at 100 TB a full GROUP BY over an ultra-high-cardinality key to find
the few dominant values is a giant shuffle for mostly-singleton
groups. Misra-Gries summarizes each partition in O(capacity) memory,
the candidate union is tiny, and only candidate rows are re-counted
exactly — the shuffle carries O(candidates) after map-side combine.

Guarantee (the classical MG bound, distributed by pigeonhole): a
per-partition summary of capacity m undercounts any key by at most
n_p/(m+1); any key with GLOBAL count > N/(m+1) must exceed the local
threshold in at least one partition (averaging argument), so it
survives in that partition's summary and reaches the candidate set.
The exact re-count then makes the final answer EXACT — the sketch
only prunes, never decides.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition_summary(key: str, capacity: int):
    """Generator factory for mapInPandas: one Misra-Gries summary per
    partition, plus a sentinel row carrying the partition's row count
    (so the caller gets N without a separate pass over the input)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        n_part = 0
        for pdf in batches:
            col = pdf[key].dropna()
            n_part += int(len(col))
            for k, c in col.value_counts().items():
                counters[k] = counters.get(k, 0) + int(c)
            if len(counters) > capacity:
                # bulk decrement: subtract the (len-m)-th smallest count
                # from every counter — zeroes at least len-m of them, and
                # each such event removes >= (m+1)*delta occurrences, so
                # total undercount per key stays <= n_part/(m+1)
                vals = sorted(counters.values())
                delta = vals[len(counters) - capacity - 1]
                counters = {k: c - delta for k, c in counters.items() if c - delta > 0}
        out = pd.DataFrame(
            {
                # object dtype: int/float keys + the None sentinel must
                # NOT collapse to float64 (Arrow would refuse / lose
                # exactness against the declared native key type)
                key: pd.Series(list(counters.keys()) + [None], dtype="object"),
                "mg_count": list(counters.values()) + [n_part],
                "is_total": [0] * len(counters) + [1],
            }
        )
        yield out

    return gen


def heavy_hitters_exact(df: DataFrame, key: str, capacity: int) -> DataFrame:
    """All values of ``key`` whose exact count exceeds N/(capacity+1),
    with exact counts — computed in two passes, never a full GROUP BY
    over the key space:

    1. Misra-Gries per partition (``mapInPandas``, O(capacity) state,
       Arrow-batched) emits candidate keys and per-partition totals.
    2. Rows are broadcast-semi-joined to the candidate set and only
       those are counted exactly; the filter ``count*(capacity+1) > N``
       runs in exact integer arithmetic.

    The candidate set provably contains every qualifying key (see
    module docstring), so the result equals the exact answer a full
    GROUP BY + HAVING would produce — that equality is this operator's
    oracle in the battery.

    Scale: pass 1 shuffles nothing (summaries collect to a frame of
    O(partitions*capacity) rows); pass 2's shuffle carries only
    candidate keys after map-side combine. The single ``collect`` is
    the control-plane N scalar.
    """
    src = df.select(key)
    key_type = src.schema[key].dataType.simpleString()
    summaries = src.mapInPandas(
        _mg_partition_summary(key, capacity),
        schema=f"{key} {key_type}, mg_count long, is_total int",
    )
    # one pass materializes both outputs; the summary frame is tiny
    summaries = summaries.localCheckpoint(eager=True)
    n_total = summaries.filter(F.col("is_total") == 1).agg(
        F.sum("mg_count").alias("n")
    ).collect()[0]["n"]
    candidates = summaries.filter(F.col("is_total") == 0).select(key).distinct()
    exact = (
        src.join(F.broadcast(candidates), key)
        .groupBy(key)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return exact.filter(F.col("n") * (capacity + 1) > F.lit(n_total)).orderBy(
        F.desc("n"), key
    )


def mg_merge(counter_maps: Iterator[dict] | list[dict], capacity: int) -> dict:
    """Merge Misra-Gries counter maps and re-compress to ``capacity``.

    MG summaries are mergeable (Agarwal/Cormode/Huang/Phillips/Wei/Yi,
    "Mergeable Summaries", PODS'12): summing counters key-wise and then
    applying the same bulk decrement keeps the total undercount of any
    key ≤ N/(capacity+1) for ARBITRARY merge trees — per-partition
    summaries, per-micro-batch summaries, and a running stream fold all
    compose without losing the no-false-negative guarantee.

    Driver-side by design: inputs are O(capacity) maps (control-plane
    scale — a 1000-executor stream still folds ≤ capacity·partitions
    rows per epoch), and the fold must be deterministic for idempotent
    replay, which a plain dict reduction is.
    """
    merged: dict = {}
    for m in counter_maps:
        for k, c in m.items():
            merged[k] = merged.get(k, 0) + int(c)
    if len(merged) > capacity:
        vals = sorted(merged.values())
        delta = vals[len(merged) - capacity - 1]
        merged = {k: c - delta for k, c in merged.items() if c - delta > 0}
    return merged
