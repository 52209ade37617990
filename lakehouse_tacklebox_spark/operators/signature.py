"""Order-invariant row-set signatures for certification flags.

Several entries certify "this DataFrame equals that one as a row SET"
(index read-back vs from-scratch rebuild, incremental vs full
recompute) without shuffling the full row set through an equi-join:
hash each row, then reduce with commutative folds. One
map-side-combined aggregate pass per frame, no join.

Folds over TWO independently-seeded row hashes h1 = xxhash64(cols)
and h2 = xxhash64(lit(seed2), cols): row count, bit-XOR of h1,
sum of h1 mod p1, and sum of SQUARED h2 mod p2. The first three folds
are all functions of h1, so a pair of distinct rows colliding in h1
(~2^-64 per pair) defeats them together — but such a pair still has
independent h2 values, so it must ALSO satisfy h2_a^2 ≡ h2_b^2 mod p2
(~2^-30) to pass the fourth fold: ~2^-94 per adversarial pair, and
birthday-scale accidental risk stays far below gate sizes. Full
row-set equality stays pinned at sf0.001 in pytest wherever a
signature gates an entry.

Trust boundary (ADVICE r13): since round 13 signatures may GATE
computation, not just certify it — cc_two_phase_rounds reuses the
previous round's frame when consecutive round signatures match, so a
collision would return wrong rows, not just a wrong flag. The count is
fold 1, so "equal signature" always implies equal cardinality
(belt-and-braces against any single-fold reasoning), and every gating
site keeps an exact-equality pytest pin at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_P1 = 1_000_000_007
_P2 = 998_244_353
# Second-hash seed: prepended literal re-keys xxhash64 (whose own seed is
# fixed in Spark), making h2 independent of h1 for distinct rows.
_SEED2 = "__sig_seed2__"


def rowset_signature(df: DataFrame, cols: list[str | Column]) -> tuple:
    """(count, xor h1, sum h1 mod p1, sum h2^2 mod p2) over dual-seeded xxhash64.

    ``cols`` entries may be column names or Column expressions (e.g.
    ``F.array_sort("arr")``) — both hash identically on both frames as
    long as the same expressions are passed for both.
    """
    h = df.withColumn("__h", F.xxhash64(*cols)).withColumn(
        "__h2", F.xxhash64(F.lit(_SEED2), *cols)
    )
    hp = F.pmod(F.col("__h"), F.lit(_P1))
    hq = F.pmod(F.col("__h2"), F.lit(_P2))
    r = h.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(__h)").alias("x"),
        F.pmod(F.sum(hp), F.lit(_P1)).alias("s1"),
        F.pmod(F.sum(F.pmod(hq * hq, F.lit(_P2))), F.lit(_P2)).alias("s2"),
    ).collect()[0]
    return (r["n"], r["x"], r["s1"], r["s2"])


def rowsets_equal(a: DataFrame, b: DataFrame, cols: list[str | Column]) -> bool:
    return rowset_signature(a, cols) == rowset_signature(b, cols)
