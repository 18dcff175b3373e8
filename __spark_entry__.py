"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship ST6 trader-ledger fold at sf0.001;
``queries``/``oracle_sql`` expose the full operator registry
(mktd6_flink_spark/plans/driver_queries.py) — one entry per implemented
operator from SURVEY.md §2 plus the LLM-pipeline layer, each with a DuckDB
oracle twin built from engine-portable expressions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mktd6_flink_spark.plans import driver_queries as dq


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the ST6 trader-state
    settlement ledger (MarketDataflow.java:284-310) folded per trader."""
    return dq.st6_trader_ledger(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(dq.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(dq.ORACLES)
