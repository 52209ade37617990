"""Property-based tests (hypothesis): randomized inputs checked against
naive reference implementations — the adversarial complement to the
example-based suites. Spark-backed properties keep example counts small
(each example runs real jobs); pure-numpy codec roundtrips run many.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.operators import multimodal as MM
from lakehouse_tacklebox_spark.operators.cluster import connected_components
from lakehouse_tacklebox_spark.operators.corpus import pack_shards
from lakehouse_tacklebox_spark.operators.dedup import keep_latest
from lakehouse_tacklebox_spark.operators.intervals import interval_overlap_pairs

SPARK_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


# --- connected components vs pure-Python union-find -------------------------

@SPARK_SETTINGS
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
        min_size=0,
        max_size=40,
    ),
    n_vertices=st.integers(1, 31),
)
def test_connected_components_matches_union_find(spark, edges, n_vertices):
    verts = list(range(n_vertices))
    edges = [e for e in edges if e[0] < n_vertices and e[1] < n_vertices]
    parent = {v: v for v in verts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min vertex id per component
    comp_min: dict[int, int] = {}
    for v in verts:
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    expect = {v: comp_min[find(v)] for v in verts}

    e_df = (
        spark.createDataFrame(edges, "id_a long, id_b long")
        if edges
        else spark.createDataFrame([], "id_a long, id_b long")
    )
    v_df = spark.createDataFrame([(v,) for v in verts], "id long")
    got = {r.id: r.component for r in connected_components(e_df, vertices=v_df).collect()}
    assert got == expect


# --- interval overlap vs naive O(n^2) predicate (incl. dirty intervals) -----

@SPARK_SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 2),        # key
            st.integers(0, 60),       # start offset (days from epoch base)
            st.integers(-5, 30),      # length in days; <= 0 makes a DIRTY interval
        ),
        min_size=0,
        max_size=25,
    )
)
def test_interval_overlap_matches_naive(spark, rows):
    import datetime as dt

    base = dt.date(2020, 1, 1)
    data = [
        (k, i, base + dt.timedelta(days=s), base + dt.timedelta(days=s + ln))
        for i, (k, s, ln) in enumerate(rows)
    ]
    expect = set()
    for k1, i1, s1, e1 in data:
        for k2, i2, s2, e2 in data:
            if k1 == k2 and i1 < i2 and s1 < e2 and s2 < e1:
                expect.add((k1, i1, i2))
    df = spark.createDataFrame(data, "k int, id long, start_d date, end_d date")
    got = {
        (r.k, r.id_a, r.id_b)
        for r in interval_overlap_pairs(df, ["k"], "id", "start_d", "end_d", granularity_days=7).collect()
    }
    assert got == expect


# --- shard packing invariants ------------------------------------------------

@SPARK_SETTINGS
@given(
    sizes=st.lists(st.integers(1, 500), min_size=1, max_size=30),
    budget=st.integers(50, 400),
)
def test_pack_shards_invariants(spark, sizes, budget):
    data = [("g", i, s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(data, "grp string, id long, sz long")
    out = sorted(
        pack_shards(df, "grp", "id", "sz", budget=budget).collect(), key=lambda r: r.id
    )
    # shard of each row = floor(cumulative-size-before-row / budget):
    # monotone in the deterministic order, starts at 0, and a shard's
    # pre-row total never reaches budget + its own row (over-fill is at
    # most one document)
    cum = 0
    for r in out:
        assert r.shard_id == cum // budget
        cum += r.sz
    assert out[0].shard_id == 0
    totals: dict[int, int] = {}
    for r in out:
        totals[r.shard_id] = totals.get(r.shard_id, 0) + r.sz
    for shard, tot in totals.items():
        others = tot - max(r.sz for r in out if r.shard_id == shard)
        assert others < budget  # remove its largest row and a shard fits


# --- keep_latest vs pandas idxmax -------------------------------------------

@SPARK_SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100)), min_size=1, max_size=40
    )
)
def test_keep_latest_matches_reference(spark, rows):
    # unique tiebreaker: the row index rides along so order_by is total
    data = [(k, v, i) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k long, v long, idx long")
    got = {(r.k, r.v, r.idx) for r in keep_latest(df, ["k"], ["v", "idx"]).collect()}
    expect = {}
    for k, v, i in data:
        if k not in expect or (v, i) > (expect[k][1], expect[k][2]):
            expect[k] = (k, v, i)
    assert got == set(expect.values())


# --- codec roundtrips (pure numpy — no Spark, many examples) ----------------

@settings(max_examples=150, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 30),
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_roundtrip_property(w, h, seed):
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, 256, size=(h, w * 3), dtype=np.uint8)
    got_w, got_h, got = MM._bmp_decode(MM._bmp_encode(rows))
    assert (got_w, got_h) == (w, h)
    np.testing.assert_array_equal(got, rows)


@settings(max_examples=150, deadline=None)
@given(
    n=st.integers(0, 3000),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, rate, seed):
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, size=n, dtype=np.int16)
    got_rate, got = MM._wav_decode(MM._wav_encode(s, rate))
    assert got_rate == rate
    np.testing.assert_array_equal(got, s)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 16),
    h=st.integers(1, 12),
    n_frames=st.integers(0, 6),
    seed=st.integers(0, 2**31 - 1),
)
def test_avi_roundtrip_property(w, h, n_frames, seed):
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, size=(h, w * 3), dtype=np.uint8) for _ in range(n_frames)]
    got_w, got_h, got = MM._avi_decode(MM._avi_encode(frames, w, h))
    assert (got_w, got_h, len(got)) == (w, h, n_frames)
    for a, b in zip(got, frames):
        np.testing.assert_array_equal(a, b)


# --- temperature mix vs pure-Python reference --------------------------------

@SPARK_SETTINGS
@given(
    counts=st.lists(st.integers(1, 40), min_size=1, max_size=6),
    total=st.integers(5, 60),
)
def test_temperature_mix_matches_reference(spark, counts, total):
    """Quota law and md5-least selection, checked against a pure-Python
    reference of the largest-remainder apportionment: base =
    (floor(√n·1000)·total) DIV Σw per stratum, the floor deficit handed
    out one each to the largest integer remainders (ties → stratum
    order), each quota capped at the stratum's row count; per-stratum
    selected = the take_n ids with smallest (md5(id), id)."""
    import hashlib
    import math

    from lakehouse_tacklebox_spark.operators.corpus import temperature_mix

    rows, next_id = [], 0
    for s, c in enumerate(counts):
        for _ in range(c):
            rows.append((f"s{s}", next_id))
            next_id += 1
    df = spark.createDataFrame(rows, ["stratum", "id"])

    n_by = {f"s{s}": c for s, c in enumerate(counts)}
    wgt = {k: math.floor(math.sqrt(c) * 1000.0) for k, c in n_by.items()}
    total_w = sum(wgt.values())
    base = {k: (w * total) // total_w for k, w in wgt.items()}
    rem = {k: (w * total) % total_w for k, w in wgt.items()}
    deficit = total - sum(base.values())
    by_rem = sorted(n_by, key=lambda k: (-rem[k], k))
    take = {
        k: min(base[k] + (1 if by_rem.index(k) < deficit else 0), n_by[k])
        for k in n_by
    }
    assert sum(take.values()) <= total

    by_stratum: dict[str, list[int]] = {}
    for k, i in rows:
        by_stratum.setdefault(k, []).append(i)
    expect = {}
    for k, ids in by_stratum.items():
        ordered = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        expect[k] = set(ordered[: take[k]])

    got = temperature_mix(df, "stratum", "id", total=total).collect()
    got_by_stratum: dict[str, set[int]] = {}
    for r in got:
        got_by_stratum.setdefault(r["stratum"], set()).add(r["id"])
        assert r["take_n"] == take[r["stratum"]]
    for k in by_stratum:
        assert got_by_stratum.get(k, set()) == expect[k], k


@given(
    chunks=st.lists(
        st.dictionaries(
            st.text(alphabet="abcdef", min_size=1, max_size=3),
            st.integers(min_value=1, max_value=50),
            min_size=0,
            max_size=8,
        ),
        min_size=1,
        max_size=12,
    ),
    capacity=st.integers(min_value=2, max_value=8),
)
@settings(max_examples=60, deadline=None)
def test_mg_merge_bound_property(chunks, capacity):
    """Mergeable-summaries invariant (PODS'12): after ANY left-fold of
    per-chunk exact counts through mg_merge, every key's undercount is
    ≤ N/(capacity+1), so every key with true count > N/(capacity+1)
    survives with a positive counter (no false negatives)."""
    import collections

    from lakehouse_tacklebox_spark.operators.sketch import mg_merge

    truth = collections.Counter()
    acc: dict = {}
    for c in chunks:
        truth.update(c)
        acc = mg_merge([acc, c], capacity)
    n = sum(truth.values())
    assert len(acc) <= capacity
    for k, true_n in truth.items():
        under = true_n - acc.get(k, 0)
        assert 0 <= under <= n // (capacity + 1) + (1 if n % (capacity + 1) else 0)
        if true_n * (capacity + 1) > n:
            assert acc.get(k, 0) > 0, k


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=3, max_size=12),
        min_size=2,
        max_size=7,
    ),
    thr=st.sampled_from([500000, 750000, 900000]),
)
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_containment_pairs_matches_bruteforce(spark, docs, thr):
    """containment_pairs == brute-force set containment over the
    distinct 3-gram shingle sets, for every (A,B) orientation."""
    from pyspark.sql import functions as F

    from lakehouse_tacklebox_spark.operators.dedup import containment_pairs

    rows = [(i, [f"{'' .join(d[j:j+3])}" for j in range(len(d) - 2)]) for i, d in enumerate(docs)]
    expect = set()
    sets = {i: set(g) for i, g in rows}
    for a in sets:
        for b in sets:
            if a == b or not sets[a]:
                continue
            ix = len(sets[a] & sets[b])
            if ix * 1000000 // len(sets[a]) >= thr:
                expect.add((a, b))
    df = spark.createDataFrame(rows, "doc_id long, grams array<string>")
    got = {
        (r["id_a"], r["id_b"])
        for r in containment_pairs(df, "doc_id", "grams", threshold_ppm=thr).collect()
    }
    assert got == expect


# --- graphops certified-program family vs pure-Python references -----------

def _uf_components(edges, nodes):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for n in nodes:
        find(n)
    comp = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    return {n: min(ms) for ms in comp.values() for n in ms}


_EDGE_LISTS = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=18,
)


@SPARK_SETTINGS
@given(edges=_EDGE_LISTS)
def test_two_phase_cc_matches_union_find(spark, edges):
    """Large-star/small-star run for n rounds (a safe over-bound on the
    O(log d) requirement at this size) must label every edge-incident
    node with its true component min."""
    from lakehouse_tacklebox_spark.operators import graphops as G

    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "id_a bigint, id_b bigint"
    ).distinct()
    nodes = sorted({x for e in edges for x in e})
    rounds = G.cc_two_phase_rounds(G.symmetric_edges(pairs), max(2, len(nodes)))
    got = {r["node"]: r["label"] for r in G.star_labels(rounds[-1]).collect()}
    assert got == _uf_components(edges, nodes)


@SPARK_SETTINGS
@given(edges=_EDGE_LISTS, split=st.integers(2, 5))
def test_incremental_cc_merge_matches_full(spark, edges, split):
    """Any base/batch split of the edge list, merged through the
    label-graph contraction, equals a from-scratch union-find over the
    union — the canonical-label property graph_cc_incremental certifies
    at the gate."""
    from lakehouse_tacklebox_spark.operators import graphops as G

    base = [e for i, e in enumerate(edges) if i % split != 0]
    batch = [e for i, e in enumerate(edges) if i % split == 0]
    if not batch:
        return
    nodes = sorted({x for e in edges for x in e})
    iters = max(2, len(nodes))
    if base:
        base_df = spark.createDataFrame(base, "id_a bigint, id_b bigint")
        base_labels = G.cc_min_label(G.symmetric_edges(base_df), iters)
    else:
        base_labels = spark.createDataFrame([], "node bigint, label bigint")
    merged = G.merge_labels_incremental(
        base_labels, spark.createDataFrame(batch, "id_a bigint, id_b bigint"), iters
    )
    got = {r["node"]: r["label"] for r in merged.collect()}
    assert got == _uf_components(edges, nodes)


@SPARK_SETTINGS
@given(edges=_EDGE_LISTS)
def test_triangle_census_matches_bruteforce(spark, edges):
    from itertools import combinations

    from lakehouse_tacklebox_spark.operators import graphops as G

    und = {(min(a, b), max(a, b)) for a, b in edges}
    nodes = sorted({x for e in und for x in e})
    expected = sum(
        1
        for a, b, c in combinations(nodes, 3)
        if (a, b) in und and (a, c) in und and (b, c) in und
    )
    e = spark.createDataFrame(sorted(und), "u bigint, v bigint")
    row = G.triangle_census(e).collect()[0]
    assert row["n_triangles"] == expected
    assert row["n_edges"] == len(und)
