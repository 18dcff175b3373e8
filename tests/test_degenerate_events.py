"""Degenerate-events cross-engine sweep: every BATCH registry entry
whose oracle reads ONLY the events table runs against a pathological
events file — NULL value, NULL/garbage props, duplicate timestamps
(same user, same microsecond), value extremes (0, negative, 1e9),
single-event users, one user with many events — in BOTH engines, and
results must match under the driver's canonicalization.

Contract boundary (documented, matches the generator and any sane
ingest): identity columns event_id / ts / user_id / event_type are
NOT NULL and event_id is unique; value and props are nullable; values
are finite (NaN/Inf are an ingest-reject, not an operator input).

Streaming entries are exercised at sf-corpus scale elsewhere; the
file here is written via pyarrow as a single events.parquet with the
same timestamp[us] encoding as the driver's testdata so the
ts-normalizing loader takes its production path.
"""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pytest

from mktd6_flink_spark.plans import driver_queries as dq

T0 = datetime.datetime(2024, 3, 1, 0, 0, 0)


def _ts(seconds):
    return T0 + datetime.timedelta(seconds=seconds)


EVENTS = [
    # one user with a burst at the SAME microsecond (tie-order stress)
    (0, _ts(0), 1, "click", 10.0, '{"k": 1}'),
    (1, _ts(0), 1, "click", 20.0, '{"k": 2}'),
    (2, _ts(0), 1, "purchase", 30.0, None),
    # NULL value / garbage props
    (3, _ts(5), 2, "view", None, "not json at all"),
    (4, _ts(6), 2, "view", 0.0, ""),
    (5, _ts(7), 2, "error", -17.25, "{}"),
    # value extremes, single-event users
    (6, _ts(100), 3, "signup", 1.0e9, '{"k": 3}'),
    (7, _ts(200), 4, "purchase", 0.01, '{"k": 4}'),
    # a second day for windowed/daily entries
    (8, _ts(86400 + 10), 1, "view", 5.5, '{"k": 5}'),
    (9, _ts(86400 + 11), 5, "click", None, None),
    (10, _ts(86400 + 12), 5, "purchase", 42.0, '{"k": 6}'),
    # a NULL-value PURCHASE: a quote that carries no price. Spark's
    # as-of fill (last ignorenulls) would skip it while DuckDB's ASOF
    # JOIN matches it and emits NULL — the engines diverge unless the
    # quote side excludes valueless purchases (the fix this row locks
    # in: asof_join_* / _PRICES / streaming st5+st10 price sides all
    # filter value IS NOT NULL).
    (11, _ts(86400 + 13), 1, "purchase", None, '{"k": 7}'),
]


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def _events_only_entries():
    names = []
    for name, sql in dq.ORACLES.items():
        low = sql.lower()
        if "events" not in low:
            continue
        if any(t in low for t in (
                "documents", "embeddings", "lineitem", "orders ",
                "orders\n", "customer", "supplier", "nation", "region")):
            continue
        if name.startswith("streaming_") or name.startswith("scan_"):
            continue
        if name in (
            # two-phase/global plans that assume corpus-scale stats, or
            # entries that stage their own inputs
            "join_salted_skew",      # joins a second derived table of itself — fine but slow
        ):
            continue
        names.append(name)
    return names


@pytest.fixture(scope="module")
def degenerate_events_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("degen_ev")
    cols = list(zip(*EVENTS))
    table = pa.table({
        "event_id": pa.array(cols[0], pa.int64()),
        "ts": pa.array(cols[1], pa.timestamp("us")),
        "user_id": pa.array(cols[2], pa.int64()),
        "event_type": pa.array(cols[3], pa.string()),
        "value": pa.array(cols[4], pa.float64()),
        "props": pa.array(cols[5], pa.string()),
    })
    pq.write_table(table, str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("name", _events_only_entries())
def test_degenerate_events_cross_engine(spark, degenerate_events_dir, name):
    got_df = dq.QUERIES[name](spark, degenerate_events_dir)
    got = _canon([tuple(r) for r in got_df.collect()], got_df.columns)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"'{os.path.join(degenerate_events_dir, 'events.parquet')}'")
    cur = con.execute(dq.ORACLES[name])
    cols = [c[0] for c in cur.description]
    want = _canon(cur.fetchall(), cols)
    assert got_df.columns and sorted(got_df.columns) == sorted(cols), (
        name, got_df.columns, cols)
    assert got == want, (name, got[:4], want[:4])
