"""Round-13 hardening tests: ADVICE fixes (P5 non-positive dims, cache
soft bound, priority-sample replay dedup) plus this round's features."""

from __future__ import annotations

import pytest


# ---------------------------------------------------------------- P5 dims

def test_parse_p5_rejects_nonpositive_dims():
    from mktd6_flink_spark.functions.multimodal import _parse_p5

    for payload in (b"P5\n0 5\n255\n", b"P5\n5 0\n255\n",
                    b"P5\n-4 3\n255\n" + bytes(12),
                    b"P5\n0 0\n255\n"):
        with pytest.raises(ValueError):
            _parse_p5(payload)


def test_zero_width_payload_is_dropped_not_fatal(spark):
    """One 0-width blob in a batch must be dropped per row — phash,
    resize, and the frame walk all divide/index by w*h downstream."""
    from mktd6_flink_spark.functions import multimodal as mm

    good = b"P5\n4 3\n255\n" + bytes(range(12))
    bad = b"P5\n0 5\n255\n"
    media = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(bad))],
        "media_id long, payload binary")
    assert [r["media_id"] for r in mm.phash_pgm(media).collect()] == [1]
    assert {r["media_id"] for r in mm.resize_pgm(media).collect()} == {1}
    assert {r["media_id"]
            for r in mm.decode_pgm(media).collect()} == {1}
    assert {r["media_id"]
            for r in mm.frame_sample_pgm(media).collect()} == {1}


# ------------------------------------------------------ cache soft bound

def test_live_cache_soft_bound(spark):
    from mktd6_flink_spark.operators import cache

    cache.release_twophase_caches()
    spark.conf.set(cache.THRESHOLD_CONF, "always")
    try:
        for i in range(cache.MAX_LIVE_CACHES + 5):
            cache.maybe_persist(spark.range(i + 1))
        assert len(cache._LIVE) == cache.MAX_LIVE_CACHES
    finally:
        spark.conf.set(cache.THRESHOLD_CONF,
                       str(cache.DEFAULT_THRESHOLD_BYTES))
        cache.release_twophase_caches()


# ------------------------------------------- priority sample replay dedup

def test_priority_sample_step_dedups_replayed_id():
    import pandas as pd

    from mktd6_flink_spark.streaming.stateful import priority_sample_step

    step = priority_sample_step(k=10)
    b1 = pd.DataFrame({"_prio": [5, 7], "_id": [100, 200],
                       "_w": [3, 4]})
    out1, state = step.vectorized(b1, None)
    # replay id=200 with a drifted weight and a better priority
    b2 = pd.DataFrame({"_prio": [2], "_id": [200], "_w": [9]})
    out2, state = step.vectorized(b2, state)
    ids = state[1]
    assert sorted(ids) == [100, 200], ids
    assert len(ids) == len(set(ids))
    # the smallest triple for id=200 won
    trips = list(zip(state[0], state[1], state[2]))
    assert (2, 200, 9) in trips and (7, 200, 4) not in trips


def test_priority_sample_step_still_lossless_merge():
    """Distinct-id path unchanged: merge of two batches == batch-built."""
    import pandas as pd

    from mktd6_flink_spark.streaming.stateful import priority_sample_step

    step = priority_sample_step(k=3)
    rows = [(p, i, 1) for i, p in enumerate([9, 2, 8, 1, 7, 3])]
    all_df = pd.DataFrame(rows, columns=["_prio", "_id", "_w"])
    _, st_once = step.vectorized(all_df, None)
    _, st_a = step.vectorized(all_df.iloc[:3], None)
    _, st_b = step.vectorized(all_df.iloc[3:], st_a)
    assert st_once[:3] == st_b[:3]
