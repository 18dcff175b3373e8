"""As-of join — the batch analog of the reference's "buffer orders until a
price is known, then settle at the latest price" operator (ST5,
MarketDataflow.java:190-268), and a generally useful operator Spark lacks
as a built-in.

Semantics (LEFT ASOF): for each left row, attach the most recent right row
with ``right.time <= left.time`` within the same key. Rows earlier than the
first right row get ``fallback`` treatment — the reference FLUSHES buffered
orders at the first price (MarketDataflow.java:243-267), i.e. they settle at
the first observed price, so ``fallback="first"`` reproduces ST5;
``fallback="null"`` gives the standard SQL ASOF LEFT JOIN (DuckDB parity).

Implementation — scale-first, no Python, no O(n²):
tagged-union both sides (routing.tagged_union), one shuffle on the key,
then a single analytic window pass carrying ``last(right_value,
ignorenulls=True)`` forward in time order. This is the classic
union+last_value as-of technique: cost = one shuffle + one sort, identical
shape to a sort-merge join, and it never builds the per-key cartesian
product a naive range-join would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import cache
from .blocks import with_block_id


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_time: str, right_time: str,
              value_cols: list[str], fallback: str = "null",
              scalable: bool = False,
              partitions: int | None = None) -> DataFrame:
    """LEFT ASOF join: left rows enriched with the latest ``value_cols`` from
    ``right`` at or before the left row's time, per ``on`` key.

    ``fallback="first"`` additionally back-fills rows that precede the first
    right row with the FIRST right value (ST5 flush semantics,
    MarketDataflow.java:243-267).

    ``scalable=True`` selects the two-phase range-partition plan for
    low-cardinality (or constant, the reference's "FOO" hotspot) keys:
    the plain analytic window funnels each key through ONE partition, so
    a constant key serializes the whole stream. The scalable plan
    (same shape as windows.running_sum_scalable):

    1. block the tagged union by (key, time) — deterministic
       equal-width time buckets (operators/blocks.py), globally ordered
       across block ids, parallel within;
    2. per-partition local last-value fill (window over (key, _pid));
    3. per-block last/first right values — a tiny table (#partitions
       rows) whose per-key carry-in offsets cost one trivially small
       window;
    4. broadcast the carry-ins back and coalesce.

    Unlike a prefix SUM there is no float reassociation — the fill picks
    values, it doesn't combine them — so both plans return bit-identical
    results; ``scalable`` is purely a physical-plan choice.

    Precondition for that bit-identical guarantee: right timestamps must
    be UNIQUE per key. With duplicate right timestamps the pick among
    the duplicates is nondeterministic in BOTH plans (the window's sort
    and the scalable plan's max_by/min_by structs order only on
    (time, side)), and the two plans may pick different duplicates.
    Callers here dedupe the right side first (e.g. the per-ts max-price
    dedup in plans/driver_queries._prices). NULL key columns are
    supported and group together, matching the plain plan's
    partitionBy semantics (internal joins go through a struct key,
    which matches NULL fields).
    """
    collide = set(value_cols) & set(left.columns)
    if collide:
        raise ValueError(
            "asof_join value_cols collide with left columns "
            f"{sorted(collide)}; alias the right value columns first")
    lcols = left.columns
    l = left.select(
        *on,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols if c not in on and c != left_time],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}")
          for c in value_cols],
    )
    r = right.select(
        *on,
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(t).alias(c)
          for c, t in left.dtypes if c not in on and c != left_time],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    u = l.unionByName(r)

    if scalable:
        n = partitions or max(
            left.sparkSession.sparkContext.defaultParallelism * 2, 8)
        # Block id is a DETERMINISTIC function of the row (blocks.py):
        # per-key equal-width buckets over _t. Three consumers (local
        # fill, pid spine, per-block summaries) read this frame; a
        # repartitionByRange + spark_partition_id() id here is re-sampled
        # per consumer when the frame isn't materialized, silently
        # stitching blocks that never existed. With a pure-function id
        # the subplans agree whether or not the persist below kicks in.
        # All internal grouping/joining keys on `_jk = struct(*on)`:
        # struct equality matches NULL fields, so left rows with NULL
        # join keys form their own group exactly like the plain window
        # plan's partitionBy — a bare equi-join on the key columns
        # would silently drop them.
        # maybe_persist is a pure PERF choice (pay the shuffle once when
        # the frame is big, see cache.py) — never a correctness one.
        parts = cache.maybe_persist(with_block_id(u, on, "_t", n))
        # Right rows sort before left rows at equal timestamps so a price
        # at t settles an order at t (<= semantics) — same order as the
        # plain plan, but local to each range block.
        wloc = (
            Window.partitionBy("_jk", "_pid")
            .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        enriched = parts
        for c in value_cols:
            enriched = enriched.withColumn(
                f"_asof_{c}", F.last(f"_r_{c}", ignorenulls=True).over(wloc)
            )
        # Tiny per-(key, block) summary: last/first right value per block
        # (one row per block after map-side partial aggregation).
        spine = parts.select("_jk", "_pid").distinct()
        blocks = spine
        for c in value_cols:
            bc = (
                parts.filter(F.col(f"_r_{c}").isNotNull())
                .groupBy("_jk", "_pid")
                .agg(
                    F.max_by(f"_r_{c}", F.struct("_t", "_is_left"))
                    .alias(f"_bl_{c}"),
                    F.min_by(f"_r_{c}", F.struct("_t", "_is_left"))
                    .alias(f"_bf_{c}"),
                )
            )
            blocks = blocks.join(bc, ["_jk", "_pid"], "left")
        woff = (
            Window.partitionBy("_jk").orderBy("_pid")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        wall = (
            Window.partitionBy("_jk").orderBy("_pid")
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing)
        )
        carry_cols = []
        for c in value_cols:
            blocks = blocks.withColumn(
                f"_carry_{c}",
                F.last(f"_bl_{c}", ignorenulls=True).over(woff))
            carry_cols.append(f"_carry_{c}")
            if fallback == "first":
                blocks = blocks.withColumn(
                    f"_gfirst_{c}",
                    F.first(f"_bf_{c}", ignorenulls=True).over(wall))
                carry_cols.append(f"_gfirst_{c}")
        carry = F.broadcast(blocks.select("_jk", "_pid", *carry_cols))
        enriched = enriched.join(carry, ["_jk", "_pid"])
        for c in value_cols:
            filled = F.coalesce(F.col(f"_asof_{c}"), F.col(f"_carry_{c}"))
            if fallback == "first":
                filled = F.coalesce(filled, F.col(f"_gfirst_{c}"))
            enriched = enriched.withColumn(f"_asof_{c}", filled)
        enriched = enriched.drop("_jk", "_pid", *carry_cols)
    else:
        # Right rows sort before left rows at equal timestamps so a price
        # at t settles an order at t (<= semantics).
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        enriched = u
        for c in value_cols:
            enriched = enriched.withColumn(
                f"_asof_{c}", F.last(f"_r_{c}", ignorenulls=True).over(w)
            )
        if fallback == "first":
            wf = (
                Window.partitionBy(*on)
                .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
                .rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing)
            )
            for c in value_cols:
                enriched = enriched.withColumn(
                    f"_asof_{c}",
                    F.coalesce(
                        F.col(f"_asof_{c}"),
                        F.first(f"_r_{c}", ignorenulls=True).over(wf),
                    ),
                )

    keep = [c for c in lcols if c not in on and c != left_time]
    return (
        enriched.filter(F.col("_is_left") == 1)
        .select(
            *on,
            F.col("_t").alias(left_time),
            *keep,
            *[F.col(f"_asof_{c}").alias(f"asof_{c}") for c in value_cols],
        )
    )
