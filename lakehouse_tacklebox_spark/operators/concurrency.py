"""Driver-thread job overlap (optimization guide §2.6).

Spark's scheduler happily runs several jobs at once inside one
application; actions are only sequential because driver code calls them
sequentially. Entries whose work splits into INDEPENDENT job chains —
e.g. an incremental result and the from-scratch recompute that certifies
it — waste idle executors by running the chains back to back: each chain
is a string of small stages that never fills the cluster. Submitting the
chains from a small thread pool lets one chain's tasks back-fill the
other's stragglers.

Scale stance: this changes WHEN jobs are submitted, never what any job
computes — results are identical by construction. On a real cluster the
same overlap fills the fleet during the per-iteration barrier stalls of
the fixed-point loops; 2-3 chains in flight is plenty (enough to fill
the tail, not so many that they fight for executors — guide §2.6).
"""

from __future__ import annotations

from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor
from typing import Any

from pyspark import inheritable_thread_target
from pyspark.sql import SparkSession


def run_concurrent(spark: SparkSession, *thunks: Callable[[], Any]) -> list[Any]:
    """Run independent Spark job chains concurrently from driver threads.

    Each thunk is a zero-arg callable that submits (blocking) Spark jobs
    and returns a value; the list of return values comes back in thunk
    order. ``inheritable_thread_target`` propagates the parent thread's
    JVM-local properties (job group/description) so the overlapped jobs
    stay correctly labelled in logs, and cleans them up per thread.

    The chains MUST be independent: nothing here orders effects between
    thunks. Exceptions propagate after all threads finish submitting
    (the pool's context exit joins them), preserving failure semantics.
    """
    if len(thunks) == 1:
        return [thunks[0]()]

    def _wrap(t: Callable[[], Any]) -> Callable[[], Any]:
        # Under py4j pinned-thread mode (the ClientServer default),
        # inheritable_thread_target(session) returns a decorator. With
        # PYSPARK_PIN_THREAD=false the non-pinned branch returns its
        # argument unchanged — i.e. the SparkSession — and calling it on
        # the thunk would raise TypeError (ADVICE r13). In that mode
        # JVM thread-locals are shared anyway, so the bare thunk is the
        # correct target.
        w = inheritable_thread_target(spark)
        return w(t) if callable(w) and not isinstance(w, SparkSession) else t

    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(_wrap(t)) for t in thunks]
        return [f.result() for f in futures]
