"""Order-invariant row-set signatures for certification flags.

Several entries certify "this DataFrame equals that one as a row SET"
(index read-back vs from-scratch rebuild, incremental vs full
recompute) without shuffling the full row set through an equi-join:
hash each row to 64 bits, then reduce with commutative folds. One
map-side-combined aggregate pass per frame, no join.

Folds: row count, bit-XOR of row hashes, sum of row hashes mod p1,
and sum of SQUARED row hashes mod p2. XOR and the two modular sums
are algebraically independent — a pair of differing rows that cancels
in the XOR fold (h_a ^ h_b preserved) must ALSO collide in both sums
(h_a + h_b and h_a^2 + h_b^2 mod distinct primes), so a false pass
needs a 3-way coincidence (~2^-180 for adversarial pairs, vanishing
for accidental ones). Full row-set equality stays pinned at sf0.001
in pytest wherever a signature gates an entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_P1 = 1_000_000_007
_P2 = 998_244_353


def rowset_signature(df: DataFrame, cols: list[str]) -> tuple:
    """(count, xor, sum mod p1, sum-of-squares mod p2) over xxhash64(cols)."""
    h = df.withColumn("__h", F.xxhash64(*cols))
    hp = F.pmod(F.col("__h"), F.lit(_P1))
    hq = F.pmod(F.col("__h"), F.lit(_P2))
    r = h.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(__h)").alias("x"),
        F.pmod(F.sum(hp), F.lit(_P1)).alias("s1"),
        F.pmod(F.sum(F.pmod(hq * hq, F.lit(_P2))), F.lit(_P2)).alias("s2"),
    ).collect()[0]
    return (r["n"], r["x"], r["s1"], r["s2"])


def rowsets_equal(a: DataFrame, b: DataFrame, cols: list[str]) -> bool:
    return rowset_signature(a, cols) == rowset_signature(b, cols)
