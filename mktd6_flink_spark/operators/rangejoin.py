"""Bin-bucketed bounded range join — the shuffle-safe batch form of
"pair each left row with right rows whose timestamp falls in
[left.ts + lo, left.ts + hi]".

Why not a plain conditional join: Catalyst executes an equi-key +
range-predicate join as an equi-join on the key with the range as a
post-filter, so every key's full left×right product is materialized in
the reducer before filtering — O(rows_per_key²) per key. Fine at test
scale; fatal for a hot key at 100 TB (this is the batch analogue of the
SymmetricHashJoinStateManager per-key linear scan documented on the
streaming interval join).

The bucket trick bounds the blowup by TIME instead of by key: slice the
timeline into bins exactly as wide as the interval (hi − lo). A right
row lands in one bin; a left row's interval [ts+lo, ts+hi] overlaps at
most TWO consecutive bins, so exploding the left side 2× and
equi-joining on (key, bin) yields every candidate pair while each
reducer only ever sees one bin's worth of rows per key — work is
O(rows-per-interval), not O(rows-per-key), and both sides shuffle
exactly once. The exact bounds are re-checked post-join, so the result
is identical to the naive join row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(left: DataFrame, right: DataFrame,
                        keys: list[str], left_ts: str, right_ts: str,
                        lo: int, hi: int) -> DataFrame:
    """All (left, right) pairs with equal ``keys`` and
    ``right_ts ∈ [left_ts + lo, left_ts + hi]`` (inclusive; integer
    units — µs in this repo). Requires ``hi > lo``; bin width is the
    interval length, never a tuning knob.
    """
    if hi <= lo:
        raise ValueError(f"empty interval: lo={lo}, hi={hi}")
    width = hi - lo
    r = right.withColumn("_bin", F.floor(F.col(right_ts) / F.lit(width)))
    lb0 = F.floor((F.col(left_ts) + F.lit(lo)) / F.lit(width))
    l = (left.withColumn("_bin", F.explode(F.array(lb0, lb0 + 1))))
    out = l.join(r, keys + ["_bin"]).filter(
        (F.col(right_ts) >= F.col(left_ts) + F.lit(lo))
        & (F.col(right_ts) <= F.col(left_ts) + F.lit(hi)))
    return out.drop("_bin")
