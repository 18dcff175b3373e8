"""Property tests (hypothesis) for sketch MERGEABILITY — the 100 TB
union contract the docstrings promise (sketches.py): building one
sketch per shard and merging must BIT-EXACTLY equal building a single
sketch over the whole corpus, for EVERY partitioning of the data.

The fixed 2-way split in test_functions.py::test_sketch_merge_contracts
pins the happy path; these drive random multisets (duplicates, single
values) through random shard assignments (including empty shards, the
degenerate case a real cluster hits whenever a task gets no rows):

* HLL merges by re-MAXing per-bucket registers;
* CMS merges by slot-wise SUMMING counters;
* Bloom merges by bitwise-ORing bitmap words.
"""

from __future__ import annotations

from functools import reduce

import os

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mktd6_flink_spark.functions import sketches as sk

# Fast/full tier (r18 — the r17 verdict's task 2: the 723-test suite
# outgrew the driver's pytest budget): each hypothesis example here
# runs ~10 Spark jobs, so example count is the wall-time knob. The
# default tier keeps enough examples to exercise every merge law on
# random shardings; SPARK_GRAFT_FULL_SWEEP=1 restores the full count
# (run it when touching the sketch kernels).
_EXAMPLES = 6 if os.environ.get("SPARK_GRAFT_FULL_SWEEP") == "1" else 2

# (value id, shard id) pairs: value ids collide on purpose (duplicates
# must not change any of the three sketches' merge results), shard ids
# may leave some shards empty.
data_strategy = st.lists(
    st.tuples(st.integers(0, 25), st.integers(0, 3)),
    min_size=1, max_size=40)


@settings(max_examples=_EXAMPLES, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=data_strategy, nparts=st.sampled_from([2, 3]))
def test_sketch_merge_equals_whole_for_random_partitions(
        spark, data, nparts):
    rows = [(f"v{v}", p % nparts) for v, p in data]
    df = (spark.createDataFrame(rows, "v string, p int")
          .withColumn("g", F.lit("g")))
    shards = [df.filter(F.col("p") == i) for i in range(nparts)]

    # --- HLL: re-max registers across shards ---
    whole_hll = sk.hll_finalize(
        sk.hll_registers(df, ["g"], F.col("v")), ["g"]).collect()
    merged_regs = (
        reduce(lambda a, b: a.unionByName(b),
               [sk.hll_registers(s, ["g"], F.col("v")) for s in shards])
        .groupBy("g", "_bucket").agg(F.max("_M").alias("_M")))
    merged_hll = sk.hll_finalize(merged_regs, ["g"]).collect()
    assert [(r.hll_est, r.hll_empty_buckets) for r in whole_hll] == \
        [(r.hll_est, r.hll_empty_buckets) for r in merged_hll]

    # --- CMS: slot-wise counter sums across shards ---
    probes = spark.createDataFrame(
        sorted({(f"v{v}",) for v, _ in data}) + [("absent",)],
        "v string")
    whole_cms = {r._key: r.cms_est for r in sk.cms_estimate(
        sk.cms_counters(df, df.v), probes, F.col("v")).collect()}
    merged_counters = (
        reduce(lambda a, b: a.unionByName(b),
               [sk.cms_counters(s, s.v) for s in shards])
        .groupBy("_row", "_slot").agg(F.sum("_cnt").alias("_cnt")))
    merged_cms = {r._key: r.cms_est for r in sk.cms_estimate(
        merged_counters, probes, F.col("v")).collect()}
    assert whole_cms == merged_cms

    # --- Bloom: bitwise-OR of bitmap words across shards ---
    whole_arr = sk.bloom_bitmap(df, F.col("v")).collect()[0][0]
    shard_arrs = [sk.bloom_bitmap(s, F.col("v")).collect()[0][0]
                  for s in shards]
    merged_arr = [reduce(lambda a, b: a | b, words)
                  for words in zip(*shard_arrs)]
    assert merged_arr == whole_arr


quant_data = st.lists(
    st.tuples(st.floats(-500.0, 500.0, allow_nan=False),
              st.integers(0, 3)),
    min_size=1, max_size=40)


@settings(max_examples=_EXAMPLES, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=quant_data, nparts=st.sampled_from([2, 3]))
def test_qhist_merge_equals_whole_and_error_bound(spark, data, nparts):
    """Quantile-histogram sketch: (a) bin tables merged by summing _c
    across ANY shard partitioning equal the whole-corpus bin table and
    give identical percentile estimates; (b) every estimate is within
    one bin width BELOW the true type-1 quantile (est <= q_true <
    est + width) — the hard bound the docstring promises."""
    from functools import reduce as _red

    import math

    rows = [(float(v), p % nparts) for v, p in data]
    df = spark.createDataFrame(rows, "value double, p int")
    shards = [df.filter(F.col("p") == i) for i in range(nparts)]

    whole = {(r.pct): (r.est_cents, r.n_rows) for r in
             sk.qhist_quantiles(sk.qhist_bins(df, df.value)).collect()}
    merged_bins = (
        _red(lambda a, b: a.unionByName(b),
             [sk.qhist_bins(s, s.value) for s in shards])
        .groupBy("_bin").agg(F.sum("_c").alias("_c")))
    merged = {(r.pct): (r.est_cents, r.n_rows) for r in
              sk.qhist_quantiles(merged_bins).collect()}
    assert whole == merged

    cents = sorted(math.floor(v * 100.0 + 0.5) for v, _ in rows)
    n = len(cents)
    for p in (50, 90, 99):
        true_q = cents[max(0, math.ceil(p * n / 100) - 1)]
        est, n_out = whole[p]
        assert n_out == n
        assert est <= true_q < est + sk.QHIST_WIDTH_CENTS


@settings(max_examples=_EXAMPLES, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=data_strategy, nparts=st.sampled_from([2, 3]))
def test_kmv_merge_equals_whole_for_random_partitions(spark, data, nparts):
    """KMV: bottom-k tables from ANY shard partitioning, unioned and
    re-bottom-k'd, must bit-exactly equal the whole-corpus sketch (the
    k smallest distinct hashes of a union are each the k smallest in
    some shard), and the finalized estimates must agree."""
    rows = [(f"v{v}", p % nparts) for v, p in data]
    df = (spark.createDataFrame(rows, "v string, p int")
          .withColumn("g", F.lit("g")))
    shards = [df.filter(F.col("p") == i) for i in range(nparts)]

    whole_mins = sorted(
        r._h for r in sk.kmv_bottomk(df, ["g"], F.col("v")).collect())
    shard_union = reduce(
        lambda a, b: a.unionByName(b),
        [sk.kmv_bottomk(s, ["g"], F.col("v")).select("g", "_h")
         for s in shards])
    # re-bottom-k the union: dedup (shared hashes appear in 2+ shards),
    # then k smallest — the merge operation a 100 TB shard tree runs
    merged_mins = sorted({r._h for r in shard_union.collect()})[:sk.KMV_K]
    assert whole_mins == merged_mins

    whole_est = sk.kmv_estimate(
        sk.kmv_bottomk(df, ["g"], F.col("v")), ["g"]).collect()[0]
    n_true = len({v for v, _ in rows})
    if whole_est.kmv_k_used < sk.KMV_K:
        # under-full sketch counts exactly
        assert whole_est.kmv_est == n_true == whole_est.kmv_k_used
