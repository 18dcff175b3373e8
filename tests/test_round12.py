"""Round-12 operator tests: perceptual-hash near-dup, benchmark
decontamination, priority sampling, and the streaming absence twin's
shared input builder."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F


def _ref_ahash(clean_text: str) -> int:
    """Independent aHash reference from first principles (no shared
    code with phash_pgm): rebuild the 64-wide zero-padded raster,
    8x8 integer resample, strict 64*p > total bits, LSB-first."""
    n = len(clean_text)
    h = max(-(-n // 64), 1)
    raster = np.zeros((h, 64), dtype=np.int64)
    flat = [ord(c) for c in clean_text]
    raster.ravel()[:n] = flat
    rows = (np.arange(8) * h) // 8
    cols = (np.arange(8) * 64) // 8
    px = raster[np.ix_(rows, cols)].ravel()
    total = int(px.sum())
    ph = sum(1 << j for j in range(64) if 64 * int(px[j]) > total)
    return ph - (1 << 64) if ph >= 1 << 63 else ph


def test_phash_matches_independent_reference(spark):
    from mktd6_flink_spark.functions import multimodal as mm

    texts = ["hello world this is a test image", "a" * 300, "",
             "zebra stripes " * 40, "0123456789 " * 13]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r["media_id"]: r["phash"]
           for r in mm.phash_pgm(mm.pgm_media_from_documents(df))
           .collect()}
    for i, t in enumerate(texts):
        clean = "".join(ch for ch in t.lower()
                        if ch.isascii() and (ch.isalnum() or ch == " "))
        assert got[i] == _ref_ahash(clean), (i, t)


def test_phash_drops_malformed_payload(spark):
    from mktd6_flink_spark.functions import multimodal as mm

    media = spark.createDataFrame(
        [(1, bytearray(b"P5\n4 3\n255\n" + bytes(range(12)))),
         (2, bytearray(b"GARBAGE")),
         (3, bytearray(b"P5\n4 3\n255\n" + bytes(range(5))))],
        "media_id long, payload binary")
    rows = mm.phash_pgm(media).collect()
    assert [r["media_id"] for r in rows] == [1]


def test_phash_near_dup_small_hamming(spark):
    """A tail-perturbed copy of a long doc must land within the
    banded-join Hamming threshold of the original."""
    from mktd6_flink_spark.functions import multimodal as mm

    base = "the quick brown fox jumps over the lazy dog " * 30
    df = spark.createDataFrame(
        [(0, base), (1, base + " qq")], "doc_id long, text string")
    got = {r["media_id"]: r["phash"]
           for r in mm.phash_pgm(mm.pgm_media_from_documents(df))
           .collect()}
    ham = bin((got[0] ^ got[1]) & ((1 << 64) - 1)).count("1")
    assert ham <= 8


def test_decontam_flags_exact_gram_leak(spark, tmp_path):
    """A training doc embedding a verbatim benchmark 8-gram inside
    otherwise-novel text must be flagged; a disjoint doc must not."""
    from mktd6_flink_spark.plans import driver_queries as dq

    bench = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [
        (7, bench, "en", "s", len(bench)),                   # eval slice
        (1, "totally different words only here nine ten",
         "en", "s", 44),                                     # clean
        (2, "prefix words then " + bench + " then suffix",
         "en", "s", 60),                                     # leaked gram
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    d = str(tmp_path / "sfdc")
    import os
    os.makedirs(d)
    df.write.parquet(d + "/documents.parquet")
    out = {r["doc_id"]: (r["n_hit_grams"], r["keep"])
           for r in dq.QUERIES["pipeline_benchmark_decontam"](
               spark, d).collect()}
    assert out[1] == (0, 1)
    assert out[2][0] >= 1 and out[2][1] == 0


def test_priority_sample_prefers_heavy_docs(spark, tmp_path):
    """Priority sampling must overrepresent heavy docs: with 100
    weight-1000 docs among 400 weight-1 docs, far more than the
    uniform 20% of the k=50 sample must be heavy (deterministic given
    the fixed hash salt)."""
    from mktd6_flink_spark.plans import driver_queries as dq

    rows = [(i, "x", "en", "s", 1000 if i % 5 == 0 else 1)
            for i in range(500)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    d = str(tmp_path / "sfws")
    import os
    os.makedirs(d)
    df.write.parquet(d + "/documents.parquet")
    sample = dq.QUERIES["pipeline_weighted_sample"](spark, d).collect()
    assert len(sample) == 50
    heavy = sum(1 for r in sample if r["weight"] == 1000)
    assert heavy > 35  # uniform draw would give ~10 of 50
    assert [r["rank"] for r in sample[:5]] == [1, 2, 3, 4, 5] or \
        sorted(r["rank"] for r in sample) == list(range(1, 51))


def test_cep_absence_twins_share_input(spark):
    """The batch and streaming absence entries must consume the SAME
    input builder (sentinel drift between twins was the round-11
    hazard class) — checked structurally, not by rerun."""
    import inspect

    from mktd6_flink_spark.plans import driver_queries as dq

    for name in ("events_cep_absence", "streaming_cep_absence"):
        src = inspect.getsource(dq.QUERIES[name])
        assert "_cep_absence_input(" in src, name


def test_cache_lifetime_entry_scoped(spark):
    """maybe_persist must never evict sibling caches mid-build (the
    curation_v2 clobber), and the registered-entry wrapper must
    release the previous entry's caches on invocation."""
    from mktd6_flink_spark.operators import cache
    from mktd6_flink_spark.plans import driver_queries as dq

    cache.release_twophase_caches()
    spark.conf.set(cache.THRESHOLD_CONF, "always")
    try:
        a = cache.maybe_persist(spark.range(10))
        b = cache.maybe_persist(spark.range(20))
        assert a.storageLevel.useMemory and b.storageLevel.useMemory
        # invoking any registered entry releases both
        dq.QUERIES["tpch_q6"](spark, "/root/testdata/sf0.001").collect()
        assert not a.storageLevel.useMemory
        assert not b.storageLevel.useMemory
    finally:
        spark.conf.unset(cache.THRESHOLD_CONF)
        cache.release_twophase_caches()


def test_wav_payloads_open_with_stdlib_wave(spark):
    """HONESTY check for the audio path: python's stdlib `wave`
    module — a completely independent RIFF reader — must open every
    synthesized payload with the declared params, and its frame bytes
    must equal the cleaned text codepoints."""
    import io
    import re
    import wave

    from mktd6_flink_spark.functions import multimodal as mm

    texts = {1: "hello wav world", 2: "", 3: None,
             4: "x" * 1000, 5: "UPPER & punct!!"}
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string")
    rows = mm.wav_media_from_documents(docs).collect()
    assert len(rows) == 5
    for r in rows:
        with wave.open(io.BytesIO(bytes(r.payload))) as wf:
            assert wf.getnchannels() == 1
            assert wf.getsampwidth() == 1
            assert wf.getframerate() == mm.WAV_RATE
            assert wf.getnframes() >= 1
            got = wf.readframes(wf.getnframes())
        t = re.sub(r"[^a-z0-9 ]+", "", (texts[r.media_id] or "").lower())
        want = t.encode("ascii") or b"\x00"
        assert got == want, r.media_id


def test_decode_wav_drops_malformed_rows(spark):
    """One bad blob must not kill the job: truncated / non-RIFF
    payloads drop, well-formed siblings survive."""
    from mktd6_flink_spark.functions import multimodal as mm

    docs = spark.createDataFrame([(1, "good doc")],
                                 "doc_id long, text string")
    good = mm.wav_media_from_documents(docs)
    import struct

    def wav_with_rate(rate):
        data = b"abc"
        fmt = struct.pack("<HHIIHH", 1, 1, rate, rate, 1, 8)
        body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    bad = spark.createDataFrame(
        [(90, bytearray(b"RIFF\x04\x00\x00\x00JUNK")),
         (91, bytearray(b"not audio at all")),
         (92, bytearray(b"RIFF")),
         # rate = 0 must DROP (ValueError), never ZeroDivisionError
         (93, bytearray(wav_with_rate(0)))],
        "media_id long, payload binary").select(
            "media_id", F.lit("audio").alias("kind"), "payload",
            F.lit(None).cast(
                "struct<format:string,width:int,height:int,"
                "duration_ms:bigint,n_bytes:bigint>").alias("meta"))
    out = mm.decode_wav(good.unionByName(bad)).collect()
    assert [r.media_id for r in out] == [1]


def test_frame_stream_walks_to_declared_frame_count(spark):
    """The concatenated-P5 stream must parse frame by frame to exactly
    the declared n_frames, and every=1 sampling must equal a per-frame
    decode (cursor exactness across frame boundaries)."""
    from mktd6_flink_spark.functions import multimodal as mm

    fb = mm.FRAME_W * mm.FRAME_H
    docs = spark.createDataFrame(
        [(1, "a" * (fb * 3)),          # exactly 3 frames
         (2, "b" * (fb + 1)),          # 2 frames, second nearly empty
         (3, "short"), (4, ""), (5, None)],
        "doc_id long, text string")
    media = mm.pgm_stream_from_documents(docs)
    # full decode (every=1): n_frames per doc
    rows = mm.frame_sample_pgm(media, every=1).collect()
    byid = {}
    for r in rows:
        byid.setdefault(r.media_id, []).append(r)
    assert {m: len(v) for m, v in byid.items()} == {
        1: 3, 2: 2, 3: 1, 4: 1, 5: 1}
    for m, v in byid.items():
        assert all(r.n_frames == len(v) for r in v)
    # frame means: doc1 all 'a' -> ord('a') exactly, every frame
    assert all(r.mean_micro == ord("a") * 1_000_000 for r in byid[1])
    # doc2 frame1 holds exactly one 'b' byte, rest zero padding
    f1 = [r for r in byid[2] if r.frame_idx == 1][0]
    assert f1.mean_micro == ord("b") * 1_000_000 // fb
    # every=2 keeps exactly the even frames
    sampled = mm.frame_sample_pgm(media, every=2).collect()
    s1 = sorted(r.frame_idx for r in sampled if r.media_id == 1)
    assert s1 == [0, 2]


def test_priority_sample_step_merge_is_lossless():
    """The streaming priority-sample state after folding candidates
    chunk by chunk (any micro-batching) must equal the bottom-k of the
    full corpus — the union argument streaming_weighted_sample rests
    on. Random weights/ids over adversarial chunk splits."""
    import pandas as pd

    from mktd6_flink_spark.streaming import stateful

    rng = np.random.RandomState(7)
    k = 5
    items = [(int(rng.randint(0, 1 << 40)) // int(w), int(i), int(w))
             for i, w in ((i, rng.randint(1, 2000)) for i in range(60))]
    for n_chunks in (1, 2, 7, 60):
        step = stateful.priority_sample_step(k)
        state = None
        bounds = sorted(
            rng.choice(range(1, 60), size=n_chunks - 1, replace=False)
        ) if n_chunks > 1 else []
        chunks = np.split(np.arange(60), bounds)
        for ch in chunks:
            pdf = pd.DataFrame({
                "_prio": [items[j][0] for j in ch],
                "_id": [items[j][1] for j in ch],
                "_w": [items[j][2] for j in ch]})
            out, state = step.vectorized(pdf, state)
        want = sorted(items)[:k]
        got = list(zip(state[0], state[1], state[2]))
        assert got == want, n_chunks


def test_video_dedup_finds_planted_majority(spark):
    """The planted perturbed copies (' qq' appended — only the final
    frame disturbed) must dominate the video near-dup output: a
    majority of the 40 planted pairs recovered (the misses are docs
    too short for two sampled frames — the documented recall trade),
    and every reported pair must share >= the match threshold."""
    from mktd6_flink_spark.plans import driver_queries as dq

    rows = dq.QUERIES["mm_video_dedup"](
        spark, "/root/testdata/sf0.001").collect()
    assert all(r.n_frame_matches >= dq._VDUP_MIN_MATCH for r in rows)
    planted = [r for r in rows if r.dup_id == r.keep_id + 20000]
    assert len(planted) >= 20, len(planted)


def test_audio_dedup_finds_all_planted(spark):
    """The length-preserving prefix plants must ALL land within the
    Hamming threshold (only window 0's energy moves), and every
    reported pair must respect it."""
    from mktd6_flink_spark.plans import driver_queries as dq

    rows = dq.QUERIES["mm_audio_dedup"](
        spark, "/root/testdata/sf0.001").collect()
    assert all(r.hamming <= dq._ADUP_HAM_T for r in rows)
    planted = [r for r in rows if r.dup_id == r.keep_id + 20000]
    assert len(planted) == 40, len(planted)


def test_persist_audit_detects_python_stage_recompute(spark):
    """The two-pass persist audit's PY pass must flag a mapInPandas
    output consumed twice WITHOUT a persist (the silent no-op persist
    class), and pass the same plan once persisted."""
    import sys
    sys.path.insert(0, "tools")
    import persist_audit as pa

    from pyspark.sql import functions as F

    def ident(it):
        for pdf in it:
            yield pdf

    base = (spark.range(100)
            .select(F.col("id"), (F.col("id") * 2).alias("v"))
            .filter(F.col("v") > 4)
            .select("id", "v", (F.col("v") + 1).alias("w"))
            .filter(F.col("w") % 3 != 0))
    py = base.mapInPandas(ident, schema="id long, v long, w long")
    unper = py.groupBy().sum("v").crossJoin(py.groupBy().max("v"))
    flags = pa._audit_plan(
        unper._jdf.queryExecution().optimizedPlan(), py_only=True)
    assert flags, "unpersisted double-consumed mapInPandas must flag"

    pyc = py.persist()
    per = pyc.groupBy().sum("v").crossJoin(pyc.groupBy().max("v"))
    flags2 = pa._audit_plan(
        per._jdf.queryExecution().optimizedPlan(), py_only=True)
    pyc.unpersist()
    assert not flags2, "persisted plan must audit clean"


def test_priority_sample_state_survives_restart(spark, tmp_path):
    """The streaming priority sample must be LOSSLESS across real
    micro-batch boundaries AND a cold restart: run 1 samples from the
    first slice of docs, run 2 (new query, same checkpoint) folds a
    second slice into the state-store-restored bottom-k — and the
    final sample must equal the batch bottom-k over EVERYTHING seen,
    which is the union-theorem claim streaming_weighted_sample rests
    on, exercised on the live engine instead of the unit merge."""
    from mktd6_flink_spark.plans.driver_queries import _WSAMP_SALT
    from mktd6_flink_spark.streaming import sources, stateful

    schema = "doc_id long, n_chars long"
    in_dir = str(tmp_path / "ws_in")
    ckpt = str(tmp_path / "ws_ckpt")
    out_dir = str(tmp_path / "ws_out")
    k = 7

    def run(n):
        stream = sources.file_stream_source(spark, in_dir, schema)
        w = F.greatest(F.col("n_chars"), F.lit(1))
        src = stream.select(
            F.lit("all").alias("_k"),
            F.col("doc_id").alias("_id"),
            w.cast("long").alias("_w"),
            F.expr(f"conv(substring(md5(concat('{_WSAMP_SALT}', "
                   f"cast(doc_id as string))), 1, 15), 16, 10)")
            .cast("long").alias("_h")).withColumn(
                "_prio", F.expr("_h div _w"))
        out = stateful.apply_per_event_stream(
            src, ["_k"], ["_id"],
            lambda: stateful.priority_sample_step(k),
            "_k string, seq long, prios array<long>, ids array<long>, "
            "ws array<long>",
            "prios array<long>, ids array<long>, ws array<long>, "
            "seq long",
            pack=lambda s: (s[0], s[1], s[2], s[3]),
            unpack=lambda r: (list(r[0]), list(r[1]), list(r[2]),
                              int(r[3])))
        run_dir = f"{out_dir}/{n}"
        q = (out.writeStream.foreachBatch(
                lambda bdf, bid: bdf.write.mode("append")
                .parquet(run_dir))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = spark.read.parquet(run_dir).collect()
        last = max(rows, key=lambda r: r.seq)
        return sorted(zip(last.prios, last.ids, last.ws))

    def prio(i, w):
        import hashlib
        h = int(hashlib.md5(
            f"{_WSAMP_SALT}{i}".encode()).hexdigest()[:15], 16)
        return h // max(w, 1)

    batch1 = [(i, (i * 37) % 900 + 1) for i in range(0, 40)]
    batch2 = [(i, (i * 53) % 900 + 1) for i in range(40, 90)]
    sources.write_stream_input(spark, in_dir, batch1, schema)
    got1 = run(1)
    want1 = sorted((prio(i, w), i, w) for i, w in batch1)[:k]
    assert got1 == want1
    sources.write_stream_input(spark, in_dir, batch2, schema)
    got2 = run(2)
    want2 = sorted((prio(i, w), i, w)
                   for i, w in batch1 + batch2)[:k]
    assert got2 == want2
