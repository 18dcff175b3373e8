"""Degenerate-MEDIA sweep: payload-level malformation across every
binary decoder. The cross-engine documents sweep covers degenerate TEXT
(the oracles synthesize well-formed payloads from text), so this file
covers what that net cannot reach: blobs whose BYTES are broken —
empty, truncated headers, truncated rasters/chunks, zero dimensions,
zero-length data chunks, single-frame streams. The 100 TB contract
under test: one bad blob is dropped data, never a dead job, and every
minimal well-formed payload still decodes exactly."""

from __future__ import annotations

import pytest


def _wav(rate=8000, samples=b"\x10\x20\x30\x40", afmt=1, channels=1,
         bits=8, fmt_size=16, data=True):
    """Hand-assembled RIFF/WAV (little-endian), parameterized so each
    case breaks exactly one invariant."""
    fmt_body = (afmt.to_bytes(2, "little") + channels.to_bytes(2, "little")
                + rate.to_bytes(4, "little")
                + (rate * channels * bits // 8).to_bytes(4, "little")
                + (channels * bits // 8).to_bytes(2, "little")
                + bits.to_bytes(2, "little"))[:fmt_size]
    chunks = b"fmt " + len(fmt_body).to_bytes(4, "little") + fmt_body
    if data:
        chunks += b"data" + len(samples).to_bytes(4, "little") + samples
        if len(samples) & 1:
            chunks += b"\x00"
    body = b"WAVE" + chunks
    return b"RIFF" + len(body).to_bytes(4, "little") + body


GOOD_P5 = b"P5\n4 3\n255\n" + bytes(range(12))
GOOD_VIDEO_2F = GOOD_P5 + GOOD_P5
GOOD_WAV = _wav()

P5_BAD = [
    b"",                                   # empty payload
    b"P5",                                 # truncated header
    b"P5\n4 3\n",                          # header stops before maxval
    b"P5\n4 3\n255\n" + bytes(5),          # truncated raster
    b"P5\n0 5\n255\n",                     # zero width
    b"P5\n4 3\n65535\n" + bytes(12),       # unsupported maxval
    b"P6\n4 3\n255\n" + bytes(36),         # wrong magic (PPM)
]
WAV_BAD = [
    b"",                                    # empty payload
    b"RIFF\x00\x00\x00\x00WAV",             # truncated header
    _wav(data=False),                       # missing data chunk
    _wav(rate=0),                           # zero sample rate
    _wav(afmt=3),                           # float PCM (unsupported)
    _wav(channels=3),                       # 3-channel (unsupported;
                                            # stereo DECODES since r15)
    _wav(channels=2, samples=b"\x01\x02\x03"),  # stereo with a
                                            # misaligned frame count
    _wav(fmt_size=10),                      # short fmt block
    GOOD_WAV[:-2],                          # truncated final chunk
]


def _media(spark, payloads):
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "media_id long, payload binary")


@pytest.mark.parametrize("fn_name", [
    "decode_pgm", "phash_pgm", "resize_pgm"])
def test_p5_decoders_drop_malformed_keep_good(spark, fn_name):
    from mktd6_flink_spark.functions import multimodal as mm

    fn = getattr(mm, fn_name)
    media = _media(spark, [GOOD_P5] + P5_BAD)
    rows = fn(media).collect()
    assert {r["media_id"] for r in rows} == {0}, (fn_name, rows)
    assert len(rows) > 0


@pytest.mark.parametrize("fn_name", [
    "frame_sample_pgm", "frame_phash_pgm"])
def test_p5_stream_walkers_drop_malformed_keep_good(spark, fn_name):
    from mktd6_flink_spark.functions import multimodal as mm

    fn = getattr(mm, fn_name)
    media = _media(spark, [GOOD_VIDEO_2F, GOOD_P5] + P5_BAD)
    rows = fn(media).collect()
    # 0 = two-frame stream, 1 = single-frame video (a valid stream!)
    assert {r["media_id"] for r in rows} == {0, 1}, (fn_name, rows)


def test_single_frame_video_walks_exactly_one_frame(spark):
    from mktd6_flink_spark.functions import multimodal as mm

    media = _media(spark, [GOOD_P5])
    rows = mm.frame_sample_pgm(media).collect()
    assert [r["frame_idx"] for r in rows] == [0]


@pytest.mark.parametrize("fn_name", ["decode_wav", "afp_wav"])
def test_wav_decoders_drop_malformed_keep_good(spark, fn_name):
    from mktd6_flink_spark.functions import multimodal as mm

    fn = getattr(mm, fn_name)
    media = _media(spark, [GOOD_WAV] + WAV_BAD)
    rows = fn(media).collect()
    assert {r["media_id"] for r in rows} == {0}, (fn_name, rows)


def test_zero_length_data_chunk_is_dropped_not_divided(spark):
    """A structurally VALID WAV whose data chunk is empty must drop
    (0 samples has no duration/mean), not divide by zero."""
    from mktd6_flink_spark.functions import multimodal as mm

    media = _media(spark, [_wav(samples=b""), GOOD_WAV])
    for fn in (mm.decode_wav, mm.afp_wav):
        assert {r["media_id"] for r in fn(media).collect()} == {1}


def test_good_wav_decodes_exactly(spark):
    from mktd6_flink_spark.functions import multimodal as mm

    rows = mm.decode_wav(_media(spark, [GOOD_WAV])).collect()
    assert len(rows) == 1
    r = rows[0]
    # 4 samples at 8 kHz: duration 4*1000//8000 = 0 ms; mean of
    # (16,32,48,64) = 40 -> 40_000_000 micros; peak 64
    assert (r["n_samples"], r["sample_rate"], r["duration_ms"],
            r["mean_micro"], r["peak"]) == (4, 8000, 0, 40000000, 64)


def test_jpeg_decoder_drops_malformed_keeps_good(spark):
    from mktd6_flink_spark.functions import multimodal as mm
    from mktd6_flink_spark.functions.jpeg import encode_dc_jpeg
    import numpy as np

    good = encode_dc_jpeg(
        np.arange(16, dtype=np.uint8).reshape(1, 16) + 60)
    bad = [b"", b"\xff\xd8", good[:20], b"NOTAJPEG",
           good.replace(b"\xff\xc0", b"\xff\xc2", 1),  # progressive
           good[:-4]]                                  # truncated scan
    media = _media(spark, [good] + bad)
    rows = mm.decode_jpeg(media).collect()
    assert {r["media_id"] for r in rows} == {0}
    # the good payload's tile values decode exactly into band features
    assert sum(1 for r in rows if r["media_id"] == 0) == 8


def test_png_decoder_drops_malformed_keeps_good(spark):
    import numpy as np

    from mktd6_flink_spark.functions import multimodal as mm
    from mktd6_flink_spark.functions.png import encode_png_gray

    good = encode_png_gray(
        (np.arange(128, dtype=np.uint8) % 256).reshape(2, 64))
    corrupt = bytearray(good)
    corrupt[good.find(b"IDAT") + 6] ^= 0x55  # CRC mismatch
    bad = [b"", b"\x89PNG", good[:25], bytes(corrupt), good[:-12]]
    media = _media(spark, [good] + bad)
    rows = mm.decode_png(media).collect()
    assert {r["media_id"] for r in rows} == {0}
    assert sum(1 for r in rows if r["media_id"] == 0) == 8


def test_png_rgb_decoder_drops_malformed_keeps_good(spark):
    import numpy as np

    from mktd6_flink_spark.functions import multimodal as mm
    from mktd6_flink_spark.functions.png import (encode_png_gray,
                                                 encode_png_rgb)

    rng = np.random.RandomState(53)
    good = encode_png_rgb(rng.randint(0, 256, (2, 64, 3), dtype=np.uint8))
    corrupt = bytearray(good)
    corrupt[good.find(b"IDAT") + 6] ^= 0x55  # CRC mismatch
    gray = encode_png_gray(np.zeros((2, 64), dtype=np.uint8))
    bad = [b"", b"\x89PNG", good[:25], bytes(corrupt), good[:-12],
           gray]  # wrong color type for the RGB path
    media = _media(spark, [good] + bad)
    rows = mm.decode_png_rgb_features(media).collect()
    assert {r["media_id"] for r in rows} == {0}
    assert sum(1 for r in rows if r["media_id"] == 0) == 24  # 3ch x 8


def test_jpeg_restart_decoder_drops_malformed_keeps_good(spark):
    """Restart-marker JPEGs on the mapInPandas hot path: a valid
    DRI/RSTn payload decodes; an out-of-sequence RSTn and a stripped
    DRI drop per row."""
    import numpy as np

    from mktd6_flink_spark.functions import multimodal as mm
    from tests.test_jpeg import encode_baseline

    rng = np.random.RandomState(59)
    plane = rng.randint(0, 256, (16, 64), dtype=np.uint8)
    good = encode_baseline([plane], [(1, 1)], restart_interval=3)
    out_of_seq = good.replace(b"\xff\xd0", b"\xff\xd6", 1)
    dri_at = good.find(b"\xff\xdd")
    no_dri = good[:dri_at] + good[dri_at + 6:]
    media = _media(spark, [good, out_of_seq, no_dri])
    rows = mm.decode_jpeg(media).collect()
    assert {r["media_id"] for r in rows} == {0}
    assert sum(1 for r in rows if r["media_id"] == 0) == 8
