"""Skew-mitigation salted equi-join.

The reference never joins at scale (its joins are the coGroup/connect
patterns, W4/ST4/ST10), but a 100 TB deployment of this engine joins
fact streams against dimensions constantly, and low-cardinality keys
(20 traders, 5 teams) are exactly the shape that melts a shuffle join:
every row of a hot key lands on ONE reducer.

``salted_join`` is the declarative cure: the fact side gets a
deterministic salt from a uniform hash, the dimension side is replicated
``salt_buckets`` times, and the join key becomes (key, salt) — each hot
key spreads across ``salt_buckets`` reducers. Results are exactly the
plain join's (the salt only splits partitions; every fact row still
meets its dimension row). AQE's skew-join split handles sort-merge cases
adaptively at runtime; explicit salting is the plan-level form that also
covers shuffled-hash joins and feeds downstream keyed ops a
pre-spread distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(left: DataFrame, right: DataFrame, on: list[str],
                salt_col: str, salt_buckets: int = 8,
                how: str = "inner") -> DataFrame:
    """Equi-join ``left`` (fact, skewed) with ``right`` (dimension) on
    ``on``, salting the fact side by a uniform hash of ``salt_col`` (any
    high-cardinality column — an event id, a content hash). The salt is
    hash-derived, so the plan is deterministic and re-shard stable (no
    RNG state, same property as the sampling operators).

    ``right`` rows replicate ``salt_buckets`` times — keep the dimension
    side small relative to the fact side (replication is the price of
    spreading the hot keys).
    """
    if "_salt" in left.columns or "_salt" in right.columns:
        raise ValueError("salted_join reserves the column name _salt")
    if how not in ("inner", "left", "left_outer", "leftsemi",
                   "left_semi", "leftanti", "left_anti"):
        # right/full joins would emit each unmatched dimension row once
        # PER REPLICA — semantics diverge from the plain join
        raise ValueError(
            f"salted_join supports inner/left-family joins, got {how!r}")
    l = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col(salt_col)), F.lit(salt_buckets))
        .cast("int"))
    r = right.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))))
    return l.join(r, [*on, "_salt"], how).drop("_salt")
