"""Property tests (hypothesis) for the round-10 set-algebra /
association operators, each against a brute-force Python oracle over
random small inputs:

* sketch_kmv_jaccard: when every pair's union holds fewer than k
  distinct hashes the sketch saw EVERYTHING, so every estimated column
  (union_est, inter_est, jaccard_micro) must EQUAL its exact self-audit
  twin — the exact-under-k contract the estimator's branches encode,
  and a wiring check on the split-division identity;
* events_sliding_hll_uniques: merging daily registers into a trailing
  window must BIT-EXACTLY equal sketching each window's union directly
  (merge-of-shards == sketch-of-union, per register) for random
  (day, user) multisets — the union contract applied per window
  position, driven through the primitives;
* basket_lift_pairs: support / directional confidence / ROUND6 lift
  against brute-force pair enumeration over random baskets, including
  single-line and duplicate-line orders.

The KMV merge-losslessness property itself (bottom-k of a union ==
bottom-k of merged bottom-k sketches) is already pinned for random
partitions by test_property_sketches.py::test_kmv_merge_equals_whole —
the pair union here is the 2-shard case of that theorem.
"""

from __future__ import annotations

import math
import os

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mktd6_flink_spark.functions import sketches as sk
from mktd6_flink_spark.plans import driver_queries as dq


def _write_events(path: str, rows):
    """(event_id, seconds, user_id, event_type) -> events.parquet with
    the driver's timestamp[us] encoding."""
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
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array([None] * len(rows), pa.string()),
    }), os.path.join(path, "events.parquet"))


# Two or three types over a small user universe: every union stays far
# below k=64, so sketch == exact everywhere.
sets_strategy = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 30)),
    min_size=2, max_size=50)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(data=sets_strategy)
def test_kmv_jaccard_exact_under_k(spark, tmp_path_factory, data):
    d = str(tmp_path_factory.mktemp("kmvj"))
    rows = [(i, i, u, t) for i, (t, u) in enumerate(data)]
    _write_events(d, rows)
    got = {(r.type_a, r.type_b): r
           for r in dq.QUERIES["sketch_kmv_jaccard"](spark, d).collect()}
    sets = {}
    for t, u in data:
        sets.setdefault(t, set()).add(u)
    types = sorted(sets)
    want_pairs = {(a, b) for i, a in enumerate(types)
                  for b in types[i + 1:]}
    assert set(got) == want_pairs
    for (a, b), r in got.items():
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        assert r.union_k_used == union
        assert r.union_est == union, (a, b, r)
        assert r.inter_in_sketch == inter
        assert r.inter_est == inter, (a, b, r)
        assert r.exact_inter == inter and r.exact_union == union
        assert r.jaccard_micro == inter * 1000000 // union
        assert r.exact_jaccard_micro == r.jaccard_micro


slide_strategy = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 40)),
    min_size=1, max_size=60)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=slide_strategy)
def test_sliding_hll_merge_equals_direct_sketch(spark, data):
    df = spark.createDataFrame([(d, f"u{u}") for d, u in data],
                               "d long, v string")
    regs_daily = sk.hll_registers(df.withColumnRenamed("d", "_day"),
                                  ["_day"], F.col("v"))
    days = df.select(F.col("d").alias("g")).distinct()
    merged = (regs_daily
              .select(F.explode(F.sequence(F.col("_day"),
                                           F.col("_day") + F.lit(6)))
                      .alias("g"), "_bucket", "_M")
              .join(days, "g")
              .groupBy("g", "_bucket").agg(F.max("_M").alias("_M")))
    windowed = (days.join(
        df, (F.col("d") >= F.col("g") - 6) & (F.col("d") <= F.col("g"))))
    direct = sk.hll_registers(windowed, ["g"], F.col("v"))
    got = sorted(map(tuple, merged.collect()))
    want = sorted(map(tuple, direct.collect()))
    assert got == want


chunks_strategy = st.lists(
    st.lists(st.integers(0, 200), min_size=0, max_size=30),
    min_size=1, max_size=5)


@settings(max_examples=20, deadline=None)
@given(chunks=chunks_strategy)
def test_kmv_stream_step_merge_is_lossless(chunks):
    """The streaming KMV state after folding the hashes chunk by chunk
    (any micro-batching) must equal the bottom-k of the full multiset —
    the union-theorem claim streaming_sketch_kmv rests on."""
    import pandas as pd

    from mktd6_flink_spark.streaming import stateful

    k = 8
    step = stateful.kmv_sketch_step(k=k)
    state = None
    for i, ch in enumerate(chunks):
        if not ch:
            continue
        out, state = step.vectorized(pd.DataFrame({"_h": ch}), state)
        assert out["hashes"][0] == state[0]
        assert state[0] == sorted(state[0]) and len(state[0]) <= k
    want = sorted({h for ch in chunks for h in ch})[:k]
    got = list(state[0]) if state else []
    assert got == want
    seqs = state[1] if state else 0
    assert seqs == sum(1 for ch in chunks if ch)


basket_strategy = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 5)),
    min_size=1, max_size=30)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(data=basket_strategy)
def test_basket_lift_matches_bruteforce(spark, tmp_path_factory, data):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("basket"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([ok for ok, _ in data], pa.int64()),
        "l_partkey": pa.array([pk for _, pk in data], pa.int64()),
    }), os.path.join(d, "lineitem.parquet"))
    got = {(r.part_a, r.part_b): r
           for r in dq.QUERIES["basket_lift_pairs"](spark, d).collect()}
    baskets = {}
    for ok, pk in data:
        baskets.setdefault(ok, set()).add(pk)
    n_orders = len(baskets)
    cnt = {}
    support = {}
    for items in baskets.values():
        s = sorted(items)
        for pk in s:
            cnt[pk] = cnt.get(pk, 0) + 1
        for i, a in enumerate(s):
            for b in s[i + 1:]:
                support[(a, b)] = support.get((a, b), 0) + 1
    want = sorted(support.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert set(got) == {p for p, _ in want}
    for (a, b), sup in want:
        r = got[(a, b)]
        assert r.support == sup
        assert r.n_a == cnt[a] and r.n_b == cnt[b]
        assert r.conf_a_to_b_micro == sup * 1000000 // cnt[a]
        assert r.conf_b_to_a_micro == sup * 1000000 // cnt[b]
        lift = sup * float(n_orders) / (cnt[a] * float(cnt[b]))
        assert r.lift == math.floor(lift * 1e6 + 0.5) / 1e6
    ranks = sorted(r.rank for r in got.values())
    assert ranks == list(range(1, len(got) + 1))


def test_mmr_diversity_dial_direction(spark):
    """The MMR dial must point the advertised way on real data: for
    every query the MMR selection's intra-list similarity sum is <=
    the plain top-k selection's (diversity never gets worse), its
    relevance sum is <= (MMR trades relevance away, never gains), and
    whenever the two selections differ at all the total pairwise
    similarity strictly drops — otherwise the knob does nothing."""
    rows = dq.QUERIES["sim_mmr_diversity"](
        spark, "/root/testdata/sf0.001").collect()
    assert rows
    diff_total = 0
    rel_identical = True
    for r in rows:
        assert r.n_topk == r.n_mmr
        assert r.mmr_rel_sum <= r.topk_rel_sum
        assert r.mmr_pairsim_sum <= r.topk_pairsim_sum
        diff_total += r.topk_pairsim_sum - r.mmr_pairsim_sum
        rel_identical &= r.mmr_rel_sum == r.topk_rel_sum
    # the knob must DO something: either some query's selection
    # diverged from pure relevance order (then total intra-list
    # similarity strictly dropped), or every MMR selection already
    # equals its top-k set (then the relevance sums match everywhere)
    assert diff_total > 0 or rel_identical


@settings(max_examples=20, deadline=None)
@given(chunks=st.lists(st.lists(st.integers(0, 9), min_size=0,
                                max_size=8),
                       min_size=1, max_size=5))
def test_basket_pair_step_chunking_invariant(chunks):
    """The incremental pair generator must emit every (a < b) pair of
    the basket's distinct item set EXACTLY ONCE, under any
    micro-batching — the claim streaming_basket_pairs' support counts
    rest on."""
    import pandas as pd

    from mktd6_flink_spark.streaming import stateful

    step = stateful.basket_pair_step()
    state = None
    emitted = []
    for ch in chunks:
        if not ch:
            continue
        out, state = step.vectorized(pd.DataFrame({"pk": ch}), state)
        emitted.extend(zip(out["part_a"], out["part_b"]))
    items = sorted({x for ch in chunks for x in ch})
    want = {(a, b) for i, a in enumerate(items) for b in items[i + 1:]}
    assert len(emitted) == len(set(emitted)), "pair emitted twice"
    assert set(emitted) == want
    assert state is None or list(state[0]) == items
