"""Conditional-persist policy for the two-phase plans
(operators/cache.py): size-thresholded, registry-bounded, identical
results with or without the cache."""

from __future__ import annotations

from pyspark.sql import functions as F

from mktd6_flink_spark.operators import cache, windows


def _with_threshold(spark, value):
    spark.conf.set(cache.THRESHOLD_CONF, value)


def test_small_frame_not_persisted(spark):
    cache.release_twophase_caches()  # isolate from earlier tests
    _with_threshold(spark, str(cache.DEFAULT_THRESHOLD_BYTES))
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    out = cache.maybe_persist(df)
    assert out.storageLevel.useMemory is False
    assert not cache._LIVE
    spark.conf.unset(cache.THRESHOLD_CONF)


def test_always_persists_and_siblings_stay_live(spark):
    """Round-12 lifetime contract: maybe_persist never evicts sibling
    caches (one entry may hold several live frames — the curation_v2
    clobber); release happens at entry boundaries via
    release_twophase_caches (the registry wrapper calls it)."""
    _with_threshold(spark, "always")
    a = cache.maybe_persist(spark.range(10).withColumn("v", F.col("id")))
    assert a.storageLevel.useMemory
    assert len(cache._LIVE) == 1
    b = cache.maybe_persist(spark.range(20).withColumn("v", F.col("id")))
    # BOTH stay live until the next entry boundary
    assert len(cache._LIVE) == 2
    assert a.storageLevel.useMemory and b.storageLevel.useMemory
    assert cache.release_twophase_caches() == 2
    assert a.storageLevel.useMemory is False
    assert b.storageLevel.useMemory is False
    spark.conf.unset(cache.THRESHOLD_CONF)


def test_never_skips_persist(spark):
    _with_threshold(spark, "never")
    out = cache.maybe_persist(spark.range(10).withColumn("v", F.col("id")))
    assert out.storageLevel.useMemory is False
    assert not cache._LIVE
    spark.conf.unset(cache.THRESHOLD_CONF)


def test_running_sum_scalable_identical_with_and_without_persist(spark):
    rows = [(f"k{i % 3}", i, (i * 7) % 11) for i in range(500)]
    df = spark.createDataFrame(rows, "key string, seq long, c long")
    expect = (
        windows.running_sum(df, ["key"], ["seq"], "c", "rs")
        .select("key", "seq", "rs").collect())
    for mode in ("always", "never"):
        _with_threshold(spark, mode)
        got = (
            windows.running_sum_scalable(df, ["key"], ["seq"], "c", "rs")
            .select("key", "seq", "rs").collect())
        assert sorted(got) == sorted(expect), mode
    cache.release_twophase_caches()
    spark.conf.unset(cache.THRESHOLD_CONF)
