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
