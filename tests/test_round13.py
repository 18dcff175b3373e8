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


# ------------------------------------- multi-batch left-outer stream join

def test_streaming_join_left_outer_multi_file_multi_batch(spark, tmp_path):
    """The round-12 form required the whole source in ONE AvailableNow
    batch; the staged-sentinel form must produce the exact relational
    LEFT JOIN with the events source split into two time-ordered files
    AND maxFilesPerTrigger=1 forcing one file per micro-batch (data
    batch 0, data batch 1, sentinel batch 2)."""
    import duckdb
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001/events.parquet"
    tbl = pq.read_table(src).sort_by([("ts", "ascending"),
                                      ("event_id", "ascending")])
    half = tbl.num_rows // 2
    evdir = tmp_path / "events.parquet"
    evdir.mkdir()
    import os
    import time
    pq.write_table(tbl.slice(0, half), str(evdir / "part-000.parquet"))
    pq.write_table(tbl.slice(half), str(evdir / "part-001.parquet"))
    now = time.time()
    os.utime(evdir / "part-000.parquet", (now - 100, now - 100))
    os.utime(evdir / "part-001.parquet", (now - 50, now - 50))

    from mktd6_flink_spark.plans.driver_queries import (
        streaming_join_left_outer)

    got = sorted(
        tuple(r) for r in streaming_join_left_outer(
            spark, str(tmp_path), max_files=1)
        .select("click_id", "purchase_id", "user_id", "lag_us",
                "purchase_value").collect())
    want = sorted(tuple(r) for r in duckdb.sql(f"""
        WITH ev AS (SELECT * FROM read_parquet('{src}')),
        c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS c_us
              FROM ev WHERE event_type = 'click'),
        p AS (SELECT event_id AS purchase_id, user_id,
                     epoch_us(ts) AS p_us, value
              FROM ev WHERE event_type = 'purchase')
        SELECT c.click_id, p.purchase_id, c.user_id,
               p.p_us - c.c_us AS lag_us, p.value AS purchase_value
        FROM c LEFT JOIN p ON p.user_id = c.user_id
                          AND p.p_us >= c.c_us
                          AND p.p_us <= c.c_us + 3600000000
        """).fetchall())
    assert got == want and len(got) > 0
