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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Collision-resistant internal join key; inputs carrying it are rejected
# rather than silently overwritten/dropped.
_BIN = "__rangejoin_bin__"


def _bin_of(ts: Column, width: int) -> Column:
    """Exact integer floor-division ``floor(ts / width)`` for int64 ts.

    ``F.floor(ts / width)`` converts to double first: exact only while
    |ts| < ~2^53 (ns-scale epochs or large ts/width ratios silently
    mis-bin and DROP matches). Instead subtract ``pmod`` (non-negative,
    so the difference is floor-aligned even for negative ts) to get an
    exactly-divisible numerator, then divide as decimal(38,0) — every
    step is exact over the full int64 range.
    """
    aligned = (ts - F.pmod(ts, F.lit(width))).cast("decimal(38,0)")
    return (aligned / F.lit(width).cast("decimal(38,0)")).cast("long")


def bucketed_range_join(left: DataFrame, right: DataFrame,
                        keys: list[str], left_ts: str, right_ts: str,
                        lo: int, hi: int) -> DataFrame:
    """All (left, right) pairs with equal ``keys`` and
    ``right_ts ∈ [left_ts + lo, left_ts + hi]`` (inclusive; integer
    units — µs in this repo). Requires ``hi > lo``; bin width is the
    interval length, never a tuning knob.

    NULL semantics match the naive equi-join + range-filter form: a NULL
    key or NULL timestamp on either side pairs with nothing.
    """
    if hi <= lo:
        raise ValueError(f"empty interval: lo={lo}, hi={hi}")
    for side, df in (("left", left), ("right", right)):
        if _BIN in df.columns:
            raise ValueError(f"{side} input already has a {_BIN} column")
    width = hi - lo
    r = right.withColumn(_BIN, _bin_of(F.col(right_ts), width))
    lb0 = _bin_of(F.col(left_ts) + F.lit(lo), width)
    l = left.withColumn(_BIN, F.explode(F.array(lb0, lb0 + 1)))
    out = l.join(r, keys + [_BIN]).filter(
        (F.col(right_ts) >= F.col(left_ts) + F.lit(lo))
        & (F.col(right_ts) <= F.col(left_ts) + F.lit(hi)))
    return out.drop(_BIN)
