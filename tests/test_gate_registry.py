"""Gate-window invariants: the driver grades the FIRST 50 registered
queries, so registry ordering is part of the product contract."""

from __future__ import annotations

from mktd6_flink_spark.plans import driver_queries as dq


def test_gate_window_is_exactly_the_priority_list():
    names = list(dq.QUERIES)
    assert len(dq._GATE_PRIORITY) == 50
    assert names[:50] == dq._GATE_PRIORITY
    assert len(set(names)) == len(names)


def test_every_query_has_an_oracle_or_is_documented():
    """Every registered query should carry a DuckDB oracle twin — a
    missing oracle silently downgrades the driver's check to rows-only.
    (Exceptions would need an explicit allowlist here.)"""
    missing = [n for n in dq.QUERIES if n not in dq.ORACLES]
    assert missing == [], missing


def test_oracle_sql_uses_portable_rounding():
    """No oracle may call bare round() — Spark HALF_UPs the shortest
    decimal repr while DuckDB rounds the binary value; ROUND6 (floor
    form) is the portable spelling and expand_round6 should have
    resolved it everywhere."""
    offenders = [n for n, sql in dq.ORACLES.items()
                 if "ROUND6(" in sql]
    assert offenders == [], offenders
