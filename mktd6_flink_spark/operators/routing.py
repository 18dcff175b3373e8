"""Routing operators R1–R3 (SURVEY.md §2.4): split/select, union, connect.

Flink's ``split(OutputSelector)`` / ``select(tag)`` and ``connect`` have no
direct Spark equivalents; the idiomatic mappings are:

- R1 split/select  -> derive a ``tag`` column once, then one
  ``filter(tag == x)`` per consumed branch. Catalyst pushes each branch's
  predicate into the shared scan, so at 100 TB the N branches cost one pass
  (or N pushdown-pruned passes — never a materialized split).
- R2 union         -> ``unionByName`` (position-independent, works for
  streaming DataFrames too).
- R3 connect       -> a tagged union: both streams are widened to a common
  schema with null side-columns plus a ``_side`` discriminator, so ONE
  downstream stateful operator (``applyInPandasWithState`` /
  ``fold_by_key``) can consume both, keyed identically — exactly how the
  reference's CoFlatMaps see an interleaved two-typed stream.

Reference: split/select Chapter02_SplitSelectUnion.java:201-217 (buy/sell/
invalid) and MonkeyStockChampion.java:233-246 (market/feed/investment);
union Chapter02:186-191, MarketDataflow.java:130-132; connect
SharePriceDataflow.java:125-127, MarketDataflow.java:99-112.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_select(df: DataFrame, tag: Column, *tags: str) -> dict[str, DataFrame]:
    """R1 — tag each record then return the named sub-streams
    (Chapter02:201-217). ``tag`` is any Column expression producing one of
    ``tags``; each branch is a filter over the shared (pushdown-friendly)
    plan, not a materialization."""
    tagged = df.withColumn("_tag", tag)
    return {t: tagged.filter(F.col("_tag") == t).drop("_tag") for t in tags}


def union_all(*dfs: DataFrame) -> DataFrame:
    """R2 — merge same-typed streams (Chapter02:186-191,
    MarketDataflow.java:130-132)."""
    return reduce(lambda a, b: a.unionByName(b), dfs)


def tagged_union(left: DataFrame, right: DataFrame,
                 left_tag: str = "L", right_tag: str = "R",
                 key_cols: list[str] | None = None) -> DataFrame:
    """R3 — emulate Flink ``connect``: widen both inputs to the union of
    their schemas (missing columns become typed nulls), add a ``_side``
    discriminator, and union. Shared columns (e.g. the key, the event time)
    keep their names so downstream keying/ordering sees one stream.

    The single downstream stateful consumer then dispatches on ``_side`` —
    the same shape as CoFlatMapFunction.flatMap1/flatMap2
    (SharePriceDataflow.java:227-266, MarketDataflow.java:190-268).
    """
    key_cols = key_cols or []
    lf = {f.name: f.dataType for f in left.schema.fields}
    rf = {f.name: f.dataType for f in right.schema.fields}

    def widen(df: DataFrame, own: dict, other: dict, tag: str) -> DataFrame:
        cols = [F.col(n) for n in own]
        cols += [F.lit(None).cast(t).alias(n) for n, t in other.items()
                 if n not in own]
        cols.append(F.lit(tag).alias("_side"))
        return df.select(*cols)

    out = widen(left, lf, rf, left_tag).unionByName(
        widen(right, rf, lf, right_tag), allowMissingColumns=False
    )
    return out
