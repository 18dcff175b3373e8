"""Property tests (hypothesis) for the two physical-plan pairs that must
be result-identical: plain vs scalable as-of join, and plain vs two-phase
running sum — over adversarial shapes the randomized differential doesn't
shrink to (constant keys, NULL keys, empty right sides, partition counts
smaller/larger than the data)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mktd6_flink_spark.operators import asof, windows

KEYS = [None, "a", "b"]

left_rows = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 12)),
    min_size=1, max_size=12)
right_rows = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 12),
              st.integers(0, 99)),
    max_size=8, unique_by=lambda r: (r[0], r[1]))


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(lrows=left_rows, rrows=right_rows,
       fallback=st.sampled_from(["null", "first"]),
       partitions=st.sampled_from([2, 5]))
def test_asof_scalable_equals_plain(spark, lrows, rrows, fallback,
                                    partitions):
    lrows = [(k, t, i) for i, (k, t) in enumerate(lrows)]
    left = spark.createDataFrame(lrows, "k string, t long, lid long")
    right = spark.createDataFrame(rrows or [(None, -99, -1)],
                                  "k string, t long, price long")
    if not rrows:
        right = right.filter("t > 0")
    plain = asof.asof_join(left, right, ["k"], "t", "t", ["price"],
                           fallback=fallback)
    scal = asof.asof_join(left, right, ["k"], "t", "t", ["price"],
                          fallback=fallback, scalable=True,
                          partitions=partitions)
    p = sorted((r.lid, r.asof_price) for r in plain.collect())
    s = sorted((r.lid, r.asof_price) for r in scal.collect())
    assert p == s


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=st.lists(st.tuples(st.sampled_from(["x", "y"]),
                               st.integers(-1000, 1000)),
                     min_size=1, max_size=20),
       partitions=st.sampled_from([2, 7]))
def test_running_sum_scalable_equals_plain(spark, rows, partitions):
    rows = [(k, i, v) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(rows, "k string, seq long, v long")
    plain = windows.running_sum(df, ["k"], ["seq"], "v", "rs")
    scal = windows.running_sum_scalable(df, ["k"], ["seq"], "v", "rs",
                                        partitions=partitions)
    p = sorted((r.seq, r.rs) for r in plain.collect())
    s = sorted((r.seq, r.rs) for r in scal.collect())
    assert p == s


range_left = st.lists(
    st.tuples(st.sampled_from(["a", "b", None]),
              st.one_of(st.integers(-50, 50), st.none())),
    min_size=1, max_size=15)
range_right = st.lists(
    st.tuples(st.sampled_from(["a", "b", None]),
              st.one_of(st.integers(-50, 50), st.none())),
    max_size=15)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(lrows=range_left, rrows=range_right,
       lo=st.integers(-20, 19), width=st.integers(1, 40))
def test_bucketed_range_join_equals_naive_fuzz(spark, lrows, rrows, lo,
                                               width):
    """Fuzzed differential: the bin-bucketed range join must equal the
    naive conditional join for ANY bounds (negative timestamps and
    lower bounds included — floor division must bin negatives
    correctly) and any key/timestamp collision pattern."""
    from pyspark.sql import functions as F

    from mktd6_flink_spark.operators.rangejoin import bucketed_range_join

    hi = lo + width
    lrows = [(k, t, i) for i, (k, t) in enumerate(lrows)]
    rrows = [(k, t, 100 + i) for i, (k, t) in enumerate(rrows)]
    left = spark.createDataFrame(lrows, "k string, lt long, lid long")
    right = spark.createDataFrame(rrows or [("z", 0, -1)],
                                  "k string, rt long, rid long")
    if not rrows:
        right = right.filter("rid > 0")
    got = {(r.lid, r.rid) for r in bucketed_range_join(
        left, right, ["k"], "lt", "rt", lo, hi).collect()}
    want = {(r.lid, r.rid) for r in left.join(
        right, (left.k == right.k)
        & (right.rt >= left.lt + F.lit(lo))
        & (right.rt <= left.lt + F.lit(hi))).collect()}
    assert got == want


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(ids=st.lists(st.integers(-10**9, 10**9), min_size=1, max_size=60,
                    unique=True),
       prefix=st.sampled_from(["epoch1:", "epoch2:", "x:"]))
def test_global_hash_rank_is_the_global_row_number(spark, ids, prefix):
    """global_hash_rank's two-phase rank must BE the global sort rank:
    for any id set and seed prefix, ranks are the dense permutation
    0..n-1 in md5(prefix+id) order with the id tie-break — the same
    thing a single-partition row_number would produce."""
    import hashlib

    from mktd6_flink_spark.operators.blocks import global_hash_rank

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r.doc_id: r.shuffle_rank
           for r in global_hash_rank(df, "doc_id", prefix).collect()}
    expect_order = sorted(
        ids, key=lambda i: (hashlib.md5(
            f"{prefix}{i}".encode()).hexdigest(), i))
    assert got == {i: r for r, i in enumerate(expect_order)}
