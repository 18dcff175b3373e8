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


# --------------------------------------------- state-schema audit tool

def test_state_schema_validator_catches_int32_timestamp():
    """The validator must catch the round-11 CEP bug shape: a state
    field declared int (32-bit) holding an epoch-micros value."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "state_schema_audit",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools", "state_schema_audit.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    specs = [("s_last", "int", True, None), ("n", "bigint", True, None)]
    ok = mod.validate_state_tuple(specs, (5, 1722470400000000))
    assert ok == []
    bad = mod.validate_state_tuple(specs, (1722470400000000, 1))
    assert bad and "out-of-range" in bad[0]
    # wrong python type, arity, non-nullable None, array element range
    assert mod.validate_state_tuple(specs, ("x", 1))
    assert mod.validate_state_tuple(specs, (1,))
    assert mod.validate_state_tuple(
        [("a", "int", False, None)], (None,))
    arr = [("hs", "array", True, "int")]
    assert mod.validate_state_tuple(arr, ([1, 2, 1 << 40],))
    assert mod.validate_state_tuple(arr, ([1, 2, 3],)) == []


# ------------------------------------------ Kafka wire-shape contract

def _wire_value(dt, name):
    """Deterministic non-null sample for a wire-contract field (nulls
    are dropped by to_json and would weaken the byte-level check)."""
    from datetime import datetime

    from pyspark.sql.types import (BooleanType, DoubleType, IntegerType,
                                   StringType, StructType, TimestampType)

    if isinstance(dt, StructType):
        return tuple(_wire_value(f.dataType, f.name) for f in dt.fields)
    if isinstance(dt, TimestampType):
        return datetime(2024, 5, 17, 12, 34, 56, 789000)
    if isinstance(dt, StringType):
        return f"s-{name}"
    if isinstance(dt, IntegerType):
        return 3
    if isinstance(dt, DoubleType):
        return 1.25
    if isinstance(dt, BooleanType):
        return True
    raise AssertionError(f"unhandled wire type {dt} for {name}")


def test_every_topic_round_trips_the_kafka_wire_frame(spark):
    """S1/K1 wire contract for EVERY TopicDef: typed row -> encode ->
    the exact Kafka frame (binary key/value + metadata columns) ->
    decode -> re-encode must be BYTE-identical to the first encoding,
    and timestamps must serialize as ISO-8601 millis strings
    (BaseJsonSerde.java:20-22), never epochs."""
    import re

    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType, TimestampType

    from mktd6_flink_spark.model import TOPICS

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    iso = re.compile(
        r'"time":"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}'
        r'(Z|[+-]\d{2}:\d{2})"')
    assert len(TOPICS) == 11
    for name, topic in TOPICS.items():
        full = StructType(
            list(topic.key_schema.fields) + list(topic.value_schema.fields))
        row = tuple(_wire_value(f.dataType, f.name) for f in full.fields)
        typed = spark.createDataFrame([row], full)
        first = topic.encode(typed).collect()[0]
        if any(isinstance(f.dataType, TimestampType)
               for f in topic.value_schema.fields):
            assert iso.search(first["value"]), (name, first["value"])
            assert '"time":1' not in first["value"], name  # no epochs
        wire = topic.encode(typed).select(
            F.col("key").cast("binary").alias("key"),
            F.col("value").cast("binary").alias("value"),
            F.lit(name).alias("topic"),
            F.lit(0).alias("partition"),
            F.lit(0).cast("long").alias("offset"),
            F.current_timestamp().alias("timestamp"),
            F.lit(0).alias("timestampType"))
        second = topic.encode(topic.decode(wire)).collect()[0]
        assert (second["key"], second["value"]) == (
            first["key"], first["value"]), name


def test_kafka_decode_golden_plan(spark):
    """Golden analyzed-plan assertion for the kafka_source decode path:
    on a mock wire frame, kafka_decode must analyze to the from_json
    projection under an EventTimeWatermark node with the 10 ms delay,
    and the output schema must be the topic's typed columns."""
    from pyspark.sql import functions as F

    from mktd6_flink_spark.model import TOPICS
    from mktd6_flink_spark.streaming.sources import kafka_decode

    topic = TOPICS["share-price"]
    mock = spark.createDataFrame(
        [(bytearray(b'"FOO"'),
          bytearray(b'{"time":"2024-05-17T12:34:56.789Z",'
                    b'"coins":2.5,"forecastMult":1.01}'),
          "share-price", 0, 0, None, 0)],
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp, timestampType int")
    out = kafka_decode(mock, topic)
    assert out.schema.simpleString() == (
        "struct<key:string,time:timestamp,coins:double,"
        "forecastMult:double>")
    # the analyzer ELIMINATES EventTimeWatermark on batch children, so
    # pin the node on the pre-analysis logical plan (a real kafka
    # stream keeps it; the mock frame is batch) and the projection on
    # the analyzed one
    logical = out._jdf.queryExecution().logical().toString()
    assert "EventTimeWatermark" in logical and "0.01 seconds" in logical
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "from_json" in analyzed
    got = out.select("key", F.unix_millis("time").alias("ms"),
                     "coins", "forecastMult").collect()[0]
    assert tuple(got) == ("FOO", 1715949296789, 2.5, 1.01)


# ----------------------------------------------- BPE greedy merge parity

def test_bpe_merge_syms_matches_regex_greedy():
    """_bpe_merge_syms (greedy leftmost non-overlapping) must agree
    with an independent reference on single-char symbol lists: python
    re.sub is DEFINED as leftmost non-overlapping replacement, so
    replacing the 2-char pattern pins the same semantics — including
    the (a, a) self-pair run case the oracle handles via run parity."""
    import itertools
    import re

    from mktd6_flink_spark.plans.driver_queries import _bpe_merge_syms

    for n in range(0, 9):
        for tup in itertools.product("ab", repeat=n):
            word = "".join(tup)
            for a, b in (("a", "b"), ("a", "a"), ("b", "a")):
                got = _bpe_merge_syms(list(word), a, b, "M")
                want = list(re.sub(re.escape(a + b), "\x00", word)
                            .replace("\x00", "M"))
                want = [w if w != "M" else "M" for w in want]
                # rebuild reference symbol list: each non-M char is a
                # symbol, each M is the merged symbol
                assert got == want, (word, a, b, got, want)


def test_bpe_train_thirty_ranks_monotone_counts(spark):
    """The 30-rule table on the sf0.001 corpus: ranks are 1..30 dense,
    every merged symbol is the concat of its pair, and pair counts
    never increase with rank for identical pairs re-counted (sanity of
    the recount-after-apply loop, not a strict global monotone)."""
    from mktd6_flink_spark.plans.driver_queries import _BPE_N, _bpe_train, load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    vocab, merges = _bpe_train(docs, _BPE_N, apply_last=True)
    assert [m["rank"] for m in merges] == list(range(1, _BPE_N + 1))
    assert all(m["m"] == m["a"] + m["b"] for m in merges)
    assert all(m["cnt"] > 0 for m in merges)
    # multi-char subword units actually got learned
    assert any(len(m["m"]) >= 3 for m in merges)
    # the trained vocab tokenizes: every word's symbols concat to it
    assert all("".join(s) == w for w, _f, s in vocab)


# ------------------------------------------------ JPEG near-dup recall

def test_jpeg_phash_planted_recall(spark):
    """Measured planted recall through the compressed codec (the
    round-12 lesson: never trust a dedup entry's hit path without
    measuring its plants): of the 40 suffix-perturbed copies, the
    banded aHash join over DECODED JPEG tile grids must recover most
    — 38/40 at sf0.001 when written; pin a safe floor."""
    from mktd6_flink_spark.plans.driver_queries import mm_jpeg_phash_dedup

    rows = mm_jpeg_phash_dedup(spark, "/root/testdata/sf0.001").collect()
    planted = sum(1 for r in rows if r["dup_id"] == r["keep_id"] + 20000)
    assert planted >= 32, planted
    assert all(r["hamming"] <= 8 for r in rows)


def test_staged_sentinel_int64_nanos_encoding(spark, tmp_path):
    """events.parquet has shipped with TWO ts encodings across rounds;
    the staged-sentinel source must write its sentinel file in the
    DATA files' own encoding. Cover the int64-nanos branch (the sf
    testdata is currently timestamp[us], so only this test exercises
    it)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    base_ns = 1_700_000_000_000_000_000
    rows = {
        "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "ts": pa.array([base_ns, base_ns + 10**9, base_ns + 2 * 10**9,
                        base_ns + 3 * 10**9], type=pa.int64()),
        "user_id": pa.array([7, 7, 8, 7], type=pa.int64()),
        "event_type": pa.array(["click", "purchase", "click", "click"],
                               type=pa.string()),
        "value": pa.array([0.0, 9.5, 0.0, 0.0], type=pa.float64()),
        "props": pa.array([None] * 4, type=pa.string()),
    }
    pq.write_table(pa.table(rows), str(tmp_path / "events.parquet"))

    from mktd6_flink_spark.plans.driver_queries import (
        streaming_join_left_outer)

    got = sorted(tuple(r) for r in streaming_join_left_outer(
        spark, str(tmp_path))
        .select("click_id", "purchase_id", "user_id", "lag_us",
                "purchase_value").collect())
    want = sorted(tuple(r) for r in duckdb.sql(f"""
        WITH ev AS (SELECT event_id, ts // 1000 AS us, user_id,
                           event_type, value
                    FROM read_parquet('{tmp_path}/events.parquet')),
        c AS (SELECT event_id AS click_id, user_id, us AS c_us
              FROM ev WHERE event_type = 'click'),
        p AS (SELECT event_id AS purchase_id, user_id, us AS p_us,
                     value
              FROM ev WHERE event_type = 'purchase')
        SELECT c.click_id, p.purchase_id, c.user_id,
               p.p_us - c.c_us AS lag_us, p.value AS purchase_value
        FROM c LEFT JOIN p ON p.user_id = c.user_id
                          AND p.p_us >= c.c_us
                          AND p.p_us <= c.c_us + 3600000000
        """).fetchall())
    assert got == want and len(got) == 3


# --------------------------------------------- review-pass codec fixes

def test_jpeg_rejects_oversized_dims_and_subsampled_luma():
    import numpy as np

    from mktd6_flink_spark.functions.jpeg import (decode_baseline_jpeg,
                                                  encode_dc_jpeg)

    good = encode_dc_jpeg(np.zeros((1, 16), dtype=np.uint8))
    # splice huge dims into the SOF (h=w=65528): must ValueError, not
    # attempt a 32 GiB plane allocation
    sof_at = good.find(b"\xff\xc0")
    huge = bytearray(good)
    huge[sof_at + 5:sof_at + 9] = (65528).to_bytes(2, "big") * 2
    with pytest.raises(ValueError, match="cap"):
        decode_baseline_jpeg(bytes(huge))


def test_jpeg_accepts_fill_bytes_between_segments():
    import numpy as np

    from mktd6_flink_spark.functions.jpeg import (decode_baseline_jpeg,
                                                  encode_dc_jpeg)

    vals = np.arange(32, dtype=np.uint8).reshape(2, 16) + 50
    good = encode_dc_jpeg(vals)
    # T.81 B.1.1.2: insert fill 0xFF bytes before the SOF marker
    sof_at = good.find(b"\xff\xc0")
    filled = good[:sof_at] + b"\xff\xff\xff" + good[sof_at:]
    _w, _h, plane = decode_baseline_jpeg(filled)
    assert (plane[4::8, 4::8] == vals).all()


def test_png_decompression_bomb_is_valueerror():
    import struct
    import zlib

    from mktd6_flink_spark.functions.png import decode_png_gray

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d)))

    ihdr = struct.pack(">IIBBBBB", 64, 64, 8, 0, 0, 0, 0)
    bomb = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * (512 << 20), 9))
            + chunk(b"IEND", b""))
    assert len(bomb) < (2 << 20)  # the payload itself is small
    with pytest.raises(ValueError):
        decode_png_gray(bomb)


def test_raster_builders_cap_giant_documents(spark):
    """A document longer than RASTER_MAX_CHARS must truncate (builder
    AND oracle), never kill the encode stage or diverge engines."""
    import duckdb

    from mktd6_flink_spark.functions import multimodal as mm

    n_over = mm.RASTER_MAX_CHARS + 321
    docs = spark.createDataFrame([(1, "a" * n_over)],
                                 "doc_id long, text string")
    jp = mm.decode_jpeg(mm.jpeg_media_from_documents(docs)).collect()
    png = mm.decode_png(mm.png_media_from_documents(docs)).collect()
    assert {r["height"] for r in jp} == {
        mm.RASTER_MAX_CHARS // mm.JPEG_BLOCKS_W * 8}
    assert {r["height"] for r in png} == {
        mm.RASTER_MAX_CHARS // mm.PGM_WIDTH}
    # cross-engine: the capped oracle agrees on the truncated doc
    import pandas as pd

    con = duckdb.connect()
    con.register("documents",
                 pd.DataFrame({"doc_id": [1], "text": ["a" * n_over]}))
    want = con.execute(
        mm.sql_decode_pgm("documents", cap=mm.RASTER_MAX_CHARS)
    ).fetchall()
    got = sorted((r["media_id"], r["width"], r["height"], r["n_frames"],
                  r["band"], r["feat_micro"]) for r in png)
    assert got == sorted(tuple(r) for r in want)
