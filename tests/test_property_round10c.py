"""Brute-force property tests for the late round-10 statistics
operators, each against an independent Python oracle over random small
inputs (the cross-engine gate already pins Spark == DuckDB; these pin
both == the textbook formula):

* events_gini_concentration == the direct Gini formula over sorted
  per-user revenues (including the two-phase-rank path);
* events_autocorr_daily == Pearson over consecutive-day pairs computed
  from exact integer moments in Python;
* events_cusum_changepoint == argmax |N*S_t - t*S_N| with the
  earliest-day tie rule;
* pipeline_quality_classifier separates an obviously separable corpus
  (clean English vs junk) with high held-out accuracy.
"""

from __future__ import annotations

import math
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mktd6_flink_spark.plans import driver_queries as dq


def _write_valued_events(path: str, rows):
    """(event_id, seconds, user_id, event_type, value) -> events.parquet
    with the driver's timestamp[us] encoding."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = datetime.datetime(2024, 3, 1)
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([t0 + datetime.timedelta(seconds=r[1])
                        for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([None] * len(rows), pa.string()),
    }), os.path.join(path, "events.parquet"))


ev_strategy = st.lists(
    st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 6),
              st.integers(0, 5),
              st.integers(0, 500)),   # cents, non-negative
    min_size=1, max_size=40)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(data=ev_strategy)
def test_gini_matches_direct_formula(spark, tmp_path_factory, data):
    d = str(tmp_path_factory.mktemp("gini"))
    rows = [(i, day * 86400 + i, u, t, cents / 100.0)
            for i, (t, day, u, cents) in enumerate(data)]
    _write_valued_events(d, rows)
    got = {r.event_type: r for r in dq.QUERIES[
        "events_gini_concentration"](spark, d).collect()}
    rev = {}
    for t, _day, u, cents in data:
        rev.setdefault(t, {})
        rev[t][u] = rev[t].get(u, 0) + cents
    assert set(got) == set(rev)
    for t, users in rev.items():
        xs = [x for _u, x in sorted(users.items(),
                                    key=lambda kv: (kv[1], kv[0]))]
        n, s = len(xs), sum(xs)
        r = got[t]
        assert r.n_users == n and r.total_cents == s
        if s == 0:
            assert r.gini is None
        else:
            num = 2 * sum((i + 1) * x for i, x in enumerate(xs)) \
                - (n + 1) * s
            assert r.gini == float(num) / float(n * s)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(data=ev_strategy)
def test_autocorr_matches_direct_formula(spark, tmp_path_factory, data):
    d = str(tmp_path_factory.mktemp("ac"))
    rows = [(i, day * 86400 + i, u, t, cents / 100.0)
            for i, (t, day, u, cents) in enumerate(data)]
    _write_valued_events(d, rows)
    got = {r.event_type: r for r in dq.QUERIES[
        "events_autocorr_daily"](spark, d).collect()}
    series = {}
    for t, day, _u, cents in data:
        series.setdefault(t, {})
        series[t][day] = series[t].get(day, 0) + cents
    assert set(got) == set(series)
    for t, by_day in series.items():
        pairs = [(by_day[d0], by_day[d0 + 1])
                 for d0 in sorted(by_day) if d0 + 1 in by_day]
        r = got[t]
        assert r.n_pairs == len(pairs)
        if not pairs:
            assert r.autocorr_lag1 is None
            continue
        n = len(pairs)
        sa = sum(a for a, _ in pairs)
        sb = sum(b for _, b in pairs)
        sab = sum(a * b for a, b in pairs)
        saa = sum(a * a for a, _ in pairs)
        sbb = sum(b * b for _, b in pairs)
        va, vb = n * saa - sa * sa, n * sbb - sb * sb
        if va == 0 or vb == 0:
            assert r.autocorr_lag1 is None
        else:
            want = (float(n * sab - sa * sb)
                    / math.sqrt(float(va)) / math.sqrt(float(vb)))
            assert r.autocorr_lag1 == want


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(data=ev_strategy)
def test_cusum_matches_direct_argmax(spark, tmp_path_factory, data):
    d = str(tmp_path_factory.mktemp("cusum"))
    rows = [(i, day * 86400 + i, u, t, cents / 100.0)
            for i, (t, day, u, cents) in enumerate(data)]
    _write_valued_events(d, rows)
    got = {r.event_type: r for r in dq.QUERIES[
        "events_cusum_changepoint"](spark, d).collect()}
    series = {}
    for t, day, _u, cents in data:
        series.setdefault(t, {})
        series[t][day] = series[t].get(day, 0) + cents
    base_day = 19783  # 2024-03-01 as epoch days
    assert set(got) == set(series)
    for t, by_day in series.items():
        days = sorted(by_day)
        n = len(days)
        sn = sum(by_day.values())
        best = None
        s = 0
        for i, d0 in enumerate(days, start=1):
            s += by_day[d0]
            dev = abs(n * s - i * sn)
            if best is None or dev > best[0]:
                best = (dev, d0)
        r = got[t]
        assert r.n_days == n
        assert r.cp_day_idx == base_day + best[1]
        assert r.cp_dev == float(best[0])


def test_quality_classifier_separates_clean_from_junk(
        spark, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    good = ("the quick brown fox jumps over the lazy dog and then "
            "walks back home with a friendly smile that people have "
            "seen many times before in stories from that old town")
    docs = []
    for i in range(40):
        if i % 4 < 2:
            text = good + f" chapter {i} continues the tale nicely"
        else:
            text = "zzz qqq " * 3 + f"x{i}"
        docs.append((i, text))
    d = str(tmp_path_factory.mktemp("nbq"))
    pq.write_table(pa.table({
        "doc_id": pa.array([i for i, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string()),
        "lang": pa.array(["en"] * len(docs), pa.string()),
        "source": pa.array(["test"] * len(docs), pa.string()),
        "n_chars": pa.array([len(t) for _, t in docs], pa.int64()),
    }), os.path.join(d, "documents.parquet"))
    rows = dq.QUERIES["pipeline_quality_classifier"](spark, d).collect()
    total = sum(r.n_docs for r in rows)
    correct = sum(r.n_docs for r in rows
                  if r.actual_keep == r.pred_keep)
    assert total == 20  # the odd-id held-out half
    assert correct / total >= 0.9, rows
