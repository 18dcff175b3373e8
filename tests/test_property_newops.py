"""Property tests (hypothesis) for the late round-8 operators: each is
checked against a brute-force Python oracle over random small inputs,
covering the space the fixed-corpus gate entries cannot (degenerate
docs, tie-heavy interval sets, empty groups).

* containment_pairs == brute-force |A∩B| / min over distinct n-grams;
* events-style sweep-line peak concurrency == brute-force max overlap
  at interval endpoints (validates the tie-order-invariance argument
  the operator's determinism rests on);
* forward as-of (time negation) == brute-force earliest right row
  at-or-after each left row.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mktd6_flink_spark.functions import dedup as dd
from mktd6_flink_spark.operators import asof, windows

WORDS = ["aa", "bb", "cc", "dd", "ee"]

doc_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12),
    min_size=2, max_size=6)


def _grams(tokens, n=3):
    return {" ".join(tokens[i:i + n]) for i in range(len(tokens) - n + 1)}


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(docs=doc_strategy)
def test_containment_matches_bruteforce(spark, docs):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): (r.common_ngrams, r.na, r.nb)
           for r in dd.containment_pairs(df, threshold_pct=50).collect()}
    gram_sets = {i: _grams(toks) for i, toks in enumerate(docs)}
    want = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            inter = gram_sets[a] & gram_sets[b]
            if not inter:
                continue  # pairs sharing no gram never meet in the join
            na, nb = len(gram_sets[a]), len(gram_sets[b])
            if 100 * len(inter) >= 50 * min(na, nb):
                want[(a, b)] = (len(inter), na, nb)
    assert got == want


interval_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 50)),
    min_size=1, max_size=25)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=interval_strategy)
def test_sweepline_peak_matches_bruteforce(spark, data):
    """+1/-1 boundary points through running_sum_scalable keyed by day;
    the per-day MAX must equal the brute-force maximum number of
    intervals covering any single point — including tie-heavy inputs
    (identical endpoints, zero-length intervals)."""
    spans = [(d, min(a, b), max(a, b)) for d, a, b in data]
    rows = ([(d, s, 1) for d, s, _ in spans]
            + [(d, e, -1) for d, _, e in spans])
    df = (spark.createDataFrame(rows, "day long, t long, delta int")
          .withColumn("_nd", -F.col("delta")))
    run = windows.running_sum_scalable(
        df, ["day"], ["t", "_nd"], "delta", out="conc")
    got = {r.day: r.m for r in
           run.groupBy("day").agg(F.max("conc").alias("m")).collect()}
    for day in {d for d, _, _ in spans}:
        day_spans = [(s, e) for d, s, e in spans if d == day]
        points = {p for s, e in day_spans for p in (s, e)}
        want = max(sum(1 for s, e in day_spans if s <= p <= e)
                   for p in points)
        assert got[day] == want, (day, got[day], want)


asof_strategy = st.tuples(
    st.lists(st.integers(0, 30), min_size=1, max_size=12),   # left times
    st.lists(st.tuples(st.integers(0, 30), st.integers(0, 9)),
             min_size=0, max_size=12))                       # (t, price)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=asof_strategy)
def test_forward_asof_via_negation_matches_bruteforce(spark, data):
    lts, rts = data
    # dedupe right times (the operator contract: unique (key, time))
    rmap = {}
    for t, p in rts:
        rmap[t] = p
    left = spark.createDataFrame(
        [(i, "k", -t) for i, t in enumerate(lts)],
        "lid long, k string, _negt long")
    right = spark.createDataFrame(
        [("k", -t, float(p)) for t, p in rmap.items()],
        "k string, _negt long, price double")
    if not rmap:
        right = spark.createDataFrame([], "k string, _negt long, price double")
    out = {r.lid: r.asof_price for r in asof.asof_join(
        left, right, on=["k"], left_time="_negt", right_time="_negt",
        value_cols=["price"], fallback="null").collect()}
    for i, t in enumerate(lts):
        nxt = [rt for rt in rmap if rt >= t]
        want = float(rmap[min(nxt)]) if nxt else None
        assert out[i] == want, (i, t, out[i], want)
