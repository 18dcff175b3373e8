"""Deterministic range blocking for the two-phase scalable plans.

The scalable as-of join (``asof.asof_join(scalable=True)``) and prefix sum
(``windows.running_sum_scalable``) split each key's stream into
order-contiguous blocks, compute block-local results in parallel, and stitch
blocks with a tiny per-block carry table. The block id must be CONSISTENT
between the block-local subtree and the carry subtree of the same query.

``repartitionByRange + spark_partition_id()`` is NOT consistent: the range
exchange samples its bounds with an RDD-id-seeded RNG, so when the frame is
not materialized each consumer re-plans the exchange with different bounds
and ``spark_partition_id()`` disagrees across subplans — the carry join then
stitches blocks that never existed (observed as run-to-run nondeterminism in
``dataflow_market_ledger`` whenever the conditional persist was skipped).

``with_block_id`` instead derives the block id as a PURE FUNCTION of the
row: per-key equal-width buckets over the leading order column, with the
per-key [min, max] span coming from an exact one-pass aggregate (map-side
combined, deterministic). Properties:

- deterministic: same row → same block id, in every subplan, every run;
- order-monotone: ``order_col`` ties land in one block, and block id is
  non-decreasing in ``order_col`` — exactly what the carry stitch needs;
- balanced for roughly uniform order columns (timestamps of an event
  stream, 64-bit hash orderings); skewed distributions degrade to fewer
  effective blocks but never to incorrectness — and the per-key window
  inside one block is still the plain-plan shape, so the worst case equals
  the non-scalable plan.

The span table has one row per key: the scalable plans target LOW-cardinality
(or constant, the reference's "FOO" hotspot) keys, where the plain analytic
window would funnel everything through one partition. High-cardinality keys
don't need either trick — the plain window already parallelizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double",
            "decimal"}


def _as_double(df: DataFrame, order_col: str) -> Column:
    dtype = dict(df.dtypes)[order_col].split("(")[0]
    if dtype == "date":
        return F.col(order_col).cast("timestamp").cast("double")
    if dtype == "timestamp" or dtype in _NUMERIC:
        return F.col(order_col).cast("double")
    raise ValueError(
        f"deterministic range blocking needs a numeric/timestamp/date "
        f"leading order column, got {order_col}: {dtype}")


def with_block_id(df: DataFrame, key_cols: list[str], order_col: str,
                  n: int) -> DataFrame:
    """Return ``df`` with two extra columns — ``_jk`` (struct of
    ``key_cols``; struct equality matches NULL fields, so NULL keys group
    exactly like a window's partitionBy) and ``_pid`` (deterministic block
    id in [0, n)) — hash-repartitioned on (``_jk``, ``_pid``).

    ``order_col`` is the LEADING sort column of the caller's total order;
    ties in it (resolved by the caller's further tiebreak columns) always
    stay within one block, so blocking on it alone preserves the order
    contract.

    Integer magnitudes above 2^53 coarsen bucket BALANCE (the double
    cast collapses adjacent large values into one bucket) but never
    break correctness — the double mapping stays monotone, so block ids
    remain monotone with the sort order.
    """
    jk = F.struct(*[F.col(c) for c in key_cols])
    num = _as_double(df, order_col)
    is_float = dict(df.dtypes)[order_col].split("(")[0] in (
        "float", "double")
    # NaN is GREATER than every number under Spark's asc ordering (and
    # poisons min/max), so for float/double order columns: exclude NaN
    # from the span aggregate and pin NaN rows to the LAST block, keeping
    # block id monotone with the sort order (NULL < numbers < NaN).
    span_src = F.when(~F.isnan(num), num) if is_float else num
    spans = (
        df.groupBy(jk.alias("_jk"))
        .agg(F.min(span_src).alias("_lo"), F.max(span_src).alias("_hi"))
    )
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(n))
    pid = (
        F.when(F.col("_hi") <= F.col("_lo"), F.lit(0))
        .otherwise(
            F.least(F.lit(n - 1),
                    F.floor((num - F.col("_lo")) / width).cast("int")))
    )
    # NULL must be handled explicitly BEFORE the arithmetic branch:
    # F.least SKIPS nulls (least(n-1, NULL) = n-1), so without this guard
    # a NULL order value would silently land in the LAST block even
    # though NULL sorts first under Spark's asc ordering.
    pid = F.when(num.isNull(), F.lit(0)).otherwise(pid)
    if is_float:
        pid = F.when(F.isnan(num), F.lit(n - 1)).otherwise(pid)
    return (
        df.withColumn("_jk", jk)
        .join(F.broadcast(spans), ["_jk"])
        # NULL order values sort first under Spark's asc ordering → the
        # first block; NaN (float/double only) sorts last → block n-1.
        .withColumn("_pid", F.coalesce(pid, F.lit(0)))
        .drop("_lo", "_hi")
        .repartition(n, "_jk", "_pid")
    )


def global_hash_rank(df: DataFrame, id_col: str,
                     prefix: str = "epoch1:") -> DataFrame:
    """Dense global rank (0..n-1) of every row in md5(prefix+id) order
    WITHOUT a global window: the first hex byte of the key is a
    256-way range bucket whose lexicographic order equals its numeric
    order, so the 256-row cumulative bucket offsets (broadcast) plus a
    per-bucket row_number reproduce the global row_number exactly —
    the single-partition sort a naive global rank needs never forms.
    Returns (id_col, shuffle_key, shuffle_rank). Deterministic and
    seed-stable: same prefix → same permutation, new prefix → fresh
    permutation. Ties impossible (id is part of the sort key).
    Raise the prefix to two bytes (65536 buckets) when n/256 exceeds
    a comfortable per-task sort."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    d = df.select(
        F.col(id_col),
        F.md5(F.concat(F.lit(prefix), F.col(id_col).cast("string")))
        .alias("shuffle_key"))
    d = d.withColumn("_bucket",
                     F.conv(F.substring("shuffle_key", 1, 2), 16, 10)
                     .cast("long"))
    counts = d.groupBy("_bucket").agg(F.count(F.lit(1)).alias("_c"))
    woff = Window.orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    offsets = counts.select(
        "_bucket", (F.sum("_c").over(woff) - F.col("_c")).alias("_off"))
    win = Window.partitionBy("_bucket").orderBy("shuffle_key", id_col)
    return (
        d.join(F.broadcast(offsets), "_bucket")
        .withColumn("_intra", F.row_number().over(win))
        .select(id_col, "shuffle_key",
                (F.col("_off") + F.col("_intra") - 1).alias("shuffle_rank"))
    )
