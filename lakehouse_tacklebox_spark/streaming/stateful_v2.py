"""Spark-4 typed-state streaming operators via ``transformWithStateInPandas``.

``applyInPandasWithState`` (streaming/stateful.py) is the Spark-3 era
stateful API: one opaque tuple per key, processing-time timeouts only.
Spark 4's ``transformWithState`` is what a production 100 TB stateful
pipeline targets instead — NAMED, TYPED state variables (value / list /
map) with per-state TTL, explicit timers with an ``handleExpiredTimer``
callback, state-schema evolution across restarts, and the RocksDB state
store provider (required by the engine for this operator), whose
changelog checkpointing keeps commit cost proportional to the batch
rather than the store. The operators here mirror the semantics of their
``stateful.py`` twins so the two APIs can be oracled against the SAME
batch answer (the battery keeps both entries).

Environment note (public-knowledge boundary): the TWS state protocol
speaks protobuf between the JVM and a Python side-process, so the
``protobuf`` wheel must be importable by that worker. This container
has no ``google.protobuf`` in site-packages, but ships a pure-python
protobuf 6.32 runtime inside the (publicly distributed) Google Cloud
SDK app-engine bundle; :func:`ensure_tws_runtime` discovers it, puts it
on ``sys.path``/``PYTHONPATH``, and sets protobuf's own public
``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK`` escape hatch for the
6.32-runtime / 6.33-gencode minor-version gap (pyspark 4.1.2 generates
its StateMessage bindings with protoc 6.33; the serialized descriptors
are plain proto3, which the 6.32 runtime parses fine). On a normally
provisioned cluster — where ``pip install protobuf`` matches the Spark
version — the helper finds the real wheel and does nothing.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

# Pure-python protobuf runtimes known to exist on this host without any
# pip install. Only consulted when `google.protobuf.runtime_version` is
# not already importable (i.e. no real protobuf wheel is present).
_PROTOBUF_FALLBACK_DIRS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)
_DISABLE_FLAG = "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"


class TwsRuntimeUnavailable(RuntimeError):
    """transformWithState needs a protobuf runtime this env cannot provide."""


def ensure_tws_runtime(spark: SparkSession) -> None:
    """Make ``transformWithStateInPandas`` runnable in this session.

    The TWS driver worker is a separate Python process SPAWNED BY THE
    JVM, so fixing ``sys.path`` in this interpreter is not enough: the
    worker builds its environment from the Python function's envVars
    (``sc.environment``) plus the inherited ``PYTHONPATH``. This helper
    sets all of them, so it works whether it runs before or after the
    JVM has launched. Idempotent; raises :class:`TwsRuntimeUnavailable`
    when no protobuf runtime can be found at all.
    """
    # Harmless when versions match; required for the documented
    # 6.32-runtime / 6.33-gencode gap of the fallback bundle.
    os.environ[_DISABLE_FLAG] = "true"
    fallback: str | None = None
    try:
        import google.protobuf.runtime_version  # noqa: F401
    except ImportError:
        for cand in _PROTOBUF_FALLBACK_DIRS:
            if (Path(cand) / "google" / "protobuf" / "runtime_version.py").exists():
                fallback = cand
                break
        if fallback is None:
            raise TwsRuntimeUnavailable(
                "transformWithState requires the protobuf wheel (its JVM<->Python "
                "state protocol is protobuf); none is importable and no known "
                "pure-python fallback exists on this host. Install protobuf to use "
                "the stateful_v2 operators; the stateful.py twins need no protobuf."
            ) from None
        if fallback not in sys.path:
            sys.path.insert(0, fallback)
        prev = os.environ.get("PYTHONPATH", "")
        if fallback not in prev.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                fallback + (os.pathsep + prev if prev else "")
            )
    env = spark.sparkContext.environment
    env[_DISABLE_FLAG] = "true"
    if fallback is not None:
        env["PYTHONPATH"] = os.environ["PYTHONPATH"]


def tws_dedup(
    stream: DataFrame,
    keys: list[str],
    order_by: list[str],
    ttl_minutes: float | None = None,
) -> DataFrame:
    """Keep the first row per key (by ``order_by``) across micro-batches —
    the :func:`lakehouse_tacklebox_spark.streaming.stateful.stateful_dedup`
    contract re-expressed on the Spark-4 typed-state API.

    State is ONE named value-state variable (``seen``, a tinyint): the
    smallest possible "have I emitted?" bit, colocated with the shuffle
    partition in RocksDB, surviving restarts through the checkpoint.
    With ``ttl_minutes`` the variable carries a NATIVE state TTL
    (``ttlDurationMs``) — the engine expires it without the
    timeout-check micro-batches that made ``applyInPandasWithState``'s
    ProcessingTimeTimeout unsuitable for finite replays (see the
    stateful_funnel docstring), which is exactly the bounded-state
    story a 24/7 100 TB ingest wants.

    Callers must run :func:`ensure_tws_runtime` first and execute the
    stream under the RocksDB state store provider (the engine enforces
    the latter; see :data:`ROCKSDB_PROVIDER`).
    """
    out_schema = stream.schema
    cols = [f.name for f in out_schema.fields]
    order_cols = list(order_by)
    ttl_ms = int(ttl_minutes * 60_000) if ttl_minutes is not None else None

    class _Dedup(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            if ttl_ms is not None:
                self._seen = handle.getValueState("seen", "emitted tinyint", ttlDurationMs=ttl_ms)
            else:
                self._seen = handle.getValueState("seen", "emitted tinyint")

        def handleInputRows(self, key, rows: Iterable[pd.DataFrame], timerValues):
            if self._seen.exists():
                return
            best: pd.DataFrame | None = None
            for pdf in rows:
                if pdf.empty:
                    continue
                cand = pdf.sort_values(order_cols, kind="mergesort").head(1)
                best = (
                    cand
                    if best is None
                    else pd.concat([best, cand])
                    .sort_values(order_cols, kind="mergesort")
                    .head(1)
                )
            self._seen.update((1,))
            if best is not None:
                yield best[cols]

        def close(self) -> None:
            pass

    # State TTL needs a clock; otherwise no time semantics are required.
    time_mode = "processingTime" if ttl_ms is not None else "none"
    return stream.groupBy(*keys).transformWithStateInPandas(
        _Dedup(), out_schema, "append", time_mode
    )


def tws_key_expiry_marks(
    stream: DataFrame,
    key_col: str,
    expiry_ms: int,
) -> DataFrame:
    """Timer demonstration operator: per key, count rows into a value
    state and register a processing-time TIMER ``expiry_ms`` after first
    sight; when the engine fires it, :meth:`handleExpiredTimer` emits a
    final ``(key, n_rows, expired=1)`` tombstone and clears the state —
    the sessionization/finalize pattern (emit-on-quiet) that needed
    hand-rolled timeout plumbing under the old API. Output rows carry
    ``expired=0`` for per-batch running counts and ``expired=1`` for the
    timer-driven finalization.
    """
    key_field = stream.schema[key_col]
    out_schema = f"{key_field.name} {key_field.dataType.simpleString()}, n_rows bigint, expired tinyint"

    class _Expiry(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState("n", "n bigint")
            self._handle = handle

        def handleInputRows(self, key, rows: Iterable[pd.DataFrame], timerValues):
            first_sight = not self._n.exists()
            n = self._n.get()[0] if not first_sight else 0
            for pdf in rows:
                n += len(pdf)
            self._n.update((n,))
            if first_sight:
                self._handle.registerTimer(
                    timerValues.getCurrentProcessingTimeInMs() + expiry_ms
                )
            yield pd.DataFrame(
                [[key[0], n, 0]], columns=[key_field.name, "n_rows", "expired"]
            )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            n = self._n.get()[0] if self._n.exists() else 0
            self._n.clear()
            yield pd.DataFrame(
                [[key[0], n, 1]], columns=[key_field.name, "n_rows", "expired"]
            )

        def close(self) -> None:
            pass

    return stream.groupBy(key_col).transformWithStateInPandas(
        _Expiry(), out_schema, "append", "processingTime"
    )


def tws_running_agg(
    stream: DataFrame,
    keys: list[str],
    value_col: str,
) -> DataFrame:
    """Cumulative per-key count/sum/min/max, the
    :func:`lakehouse_tacklebox_spark.streaming.stateful.stateful_running_agg`
    contract on the typed-state API: the accumulator is ONE named value
    state of four numeric fields in RocksDB, updated per micro-batch and
    emitted whenever the key sees traffic. Same exactness note as the
    twin — money should be pre-scaled to integer cents JVM-side (exact
    in float64 up to 2^53).
    """
    key_fields = [stream.schema[k] for k in keys]
    from pyspark.sql.types import StructType

    out_schema = (
        StructType(key_fields)
        .add("n_events", "long")
        .add("total", "double")
        .add("vmin", "double")
        .add("vmax", "double")
    )

    class _Agg(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._acc = handle.getValueState(
                "acc", "n bigint, total double, vmin double, vmax double"
            )

        def handleInputRows(self, key, rows: Iterable[pd.DataFrame], timerValues):
            if self._acc.exists():
                n, total, vmin, vmax = self._acc.get()
            else:
                n, total, vmin, vmax = 0, 0.0, None, None
            seen = False
            for pdf in rows:
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
            self._acc.update((n, total, vmin, vmax))
            yield pd.DataFrame(
                [list(key) + [n, total, vmin, vmax]],
                columns=[*keys, "n_events", "total", "vmin", "vmax"],
            )

        def close(self) -> None:
            pass

    return stream.groupBy(*keys).transformWithStateInPandas(
        _Agg(), out_schema, "update", "none"
    )
