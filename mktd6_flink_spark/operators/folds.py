"""Batch fold equivalents of the reference's keyed-state operators
(SURVEY.md §2.6) as JVM-native ``F.aggregate`` folds over per-key
time-ordered arrays.

Pattern: ``groupBy(key).agg(array_sort(collect_list(struct(order..., payload))))``
then ``F.aggregate(seq, init, merge)``.  The fold runs inside whole-stage
codegen — no Python in the loop — and distributes per key.  This is the right
batch shape for order-dependent per-key recurrences (EMA, ledger folds): one
shuffle on the key, then sequential-in-key / parallel-across-keys.

Scale note: per-key state is O(1); the collected array is O(rows-per-key).
For keys whose history exceeds executor memory, the streaming versions in
``streaming/stateful.py`` process incrementally with O(1) state instead.

The streaming (per-event-emission) versions of the same recurrences live in
``streaming/stateful.py``; these batch folds are their oracle-checkable twins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sorted_seq(order_cols: list[str], payload_cols: list[str]) -> Column:
    """array_sort(collect_list(struct(order..., payload...))) — structs sort
    lexicographically by field order, so order columns go first."""
    return F.array_sort(
        F.collect_list(F.struct(*[F.col(c) for c in order_cols + payload_cols]))
    )


def ema_fold(seq: Column, value_field: str, alpha: float) -> Column:
    """ST1 — exponential moving average (Chapter04:86-113,168-178):
    ``ema = first ? x : x*α + ema*(1-α)``.  Returns the final EMA.

    Fold order and arithmetic (``x*α + acc*(1-α)``) are kept exactly as the
    reference computes them, so float64 results are bit-identical to the
    kata-04 golden sequence.
    """
    return F.aggregate(
        seq,
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x[value_field]).otherwise(
            x[value_field] * F.lit(alpha) + acc * F.lit(1.0 - alpha)
        ),
    )


def product_fold(seq: Column, value_field: str) -> Column:
    """ST2 — multiplicative accumulator (SharePriceDataflow.java:72-96):
    ``acc = (acc or 1) * mult``.  Returns the final product."""
    return F.aggregate(
        seq,
        F.lit(1.0).cast("double"),
        lambda acc, x: acc * x[value_field],
    )


# ---------------------------------------------------------------------------
# ST6 — the trader-state settlement fold (MarketDataflow.java:284-310 +
# TraderStateUpdater.java:115-139 + TraderState.java:69-83).  The core
# correctness target of the reference.
# ---------------------------------------------------------------------------

def trader_fold_init() -> Column:
    """Initial TraderState: 10 coins, 5 shares (TraderState.java:76-83).

    Built lazily — ``F.lit`` needs an active SparkSession in classic mode,
    so this must not run at import time.
    """
    return F.struct(
        F.lit(10.0).cast("double").alias("coins"),
        F.lit(5).cast("int").alias("shares"),
        F.lit(0).cast("int").alias("bailouts"),
        F.lit(0).cast("int").alias("fedMonkeys"),
        F.lit(0).cast("int").alias("inFlightInvestments"),
    )


def trader_fold_step(acc: Column, upd: Column) -> Column:
    """One TraderStateUpdater applied to a TraderState.

    Exact semantics of TraderStateUpdater.update()
    (monkey-flink-exchange/.../model/TraderStateUpdater.java:115-139):

      1. apply deltas: coins+=coinsDiff, shares+=sharesDiff,
         bailouts+=(addBailout?1:0), fedMonkeys+=fedMonkeys,
         inFlight+=investDiff  -> ``newState`` (lines 119-124);
      2. auto-bailout on the NEW state (lines 126-132): if type != BAILOUT
         and newState.inFlight<=0 and newState.coins<=3 and
         newState.shares<=0, recursively apply BAILOUT_UPDATER
         (+10 coins, +5 shares, bailouts+1 — line 17-18); the recursive
         update validates too, so a still-negative balance keeps newState;
      3. validate (TraderState.java:69-74): coins<0 -> INSUFFICIENT_COINS
         else shares<0 -> INSUFFICIENT_SHARES else ACCEPTED; a rejected
         update keeps the ORIGINAL pre-delta state (lines 134-138).

    ``upd`` fields: type, coinsDiff, sharesDiff, addBailout, fedMonkeys,
    investDiff.  ``acc`` is the kept TraderState.
    """
    new_coins = acc["coins"] + upd["coinsDiff"]
    new_shares = acc["shares"] + upd["sharesDiff"]
    new_bailouts = acc["bailouts"] + F.when(upd["addBailout"], 1).otherwise(0)
    new_fed = acc["fedMonkeys"] + upd["fedMonkeys"]
    new_inflight = acc["inFlightInvestments"] + upd["investDiff"]

    needs_bailout = (
        (upd["type"] != "BAILOUT")
        & (new_inflight <= 0)
        & (new_coins <= 3.0)
        & (new_shares <= 0)
    )
    # Recursive BAILOUT_UPDATER.update(newState): its own validation only
    # accepts when the boosted balances are non-negative.
    bail_ok = (new_coins + 10.0 >= 0) & (new_shares + 5 >= 0)
    apply_bail = needs_bailout & bail_ok
    b_coins = F.when(apply_bail, new_coins + 10.0).otherwise(new_coins)
    b_shares = F.when(apply_bail, new_shares + 5).otherwise(new_shares)
    b_bailouts = F.when(apply_bail, new_bailouts + 1).otherwise(new_bailouts)

    accepted = (b_coins >= 0) & (b_shares >= 0)
    return F.struct(
        F.when(accepted, b_coins).otherwise(acc["coins"]).alias("coins"),
        F.when(accepted, b_shares).otherwise(acc["shares"]).alias("shares"),
        F.when(accepted, b_bailouts).otherwise(acc["bailouts"]).alias("bailouts"),
        F.when(accepted, new_fed).otherwise(acc["fedMonkeys"]).alias("fedMonkeys"),
        F.when(accepted, new_inflight)
        .otherwise(acc["inFlightInvestments"])
        .alias("inFlightInvestments"),
    )


def trader_state_fold(seq: Column) -> Column:
    """Fold a time-ordered array of updater structs into the final
    TraderState."""
    return F.aggregate(seq, trader_fold_init(), trader_fold_step)


def fold_by_key(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    payload_cols: list[str],
    fold,
    out_name: str,
) -> DataFrame:
    """groupBy(keys) -> time-sorted array -> fold.  One shuffle, then codegen."""
    return (
        df.groupBy(*keys)
        .agg(sorted_seq(order_cols, payload_cols).alias("_seq"))
        .select(*keys, fold(F.col("_seq")).alias(out_name))
    )
