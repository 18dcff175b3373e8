"""Round-15 additions: 16-bit PCM WAV decode (+ builder honesty
against python's stdlib `wave`), and the decode attrition report."""

from __future__ import annotations

import io
import re
import struct
import wave

import numpy as np
import pytest


def _clean(t):
    return re.sub(r"[^a-z0-9 ]+", "", (t or "").lower())


def test_wav16_payloads_open_with_stdlib_wave(spark):
    """Independent-reader honesty check for the 16-bit lane: stdlib
    `wave` must open every synthesized payload as 16-bit mono at the
    declared rate, and its frame bytes must equal the v*257 - 32768
    samples of the cleaned text."""
    from mktd6_flink_spark.functions import multimodal as mm

    texts = {1: "sixteen bit pcm", 2: "", 3: None,
             4: "z" * 999, 5: "MIXED & punct?!"}
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string")
    rows = mm.wav16_media_from_documents(docs).collect()
    assert len(rows) == 5
    for r in rows:
        with wave.open(io.BytesIO(bytes(r.payload))) as wf:
            assert wf.getnchannels() == 1
            assert wf.getsampwidth() == 2
            assert wf.getframerate() == mm.WAV_RATE
            got = wf.readframes(wf.getnframes())
        v = np.frombuffer(_clean(texts[r.media_id]).encode("ascii"),
                          dtype=np.uint8).astype(np.int64)
        if v.size == 0:
            v = np.zeros(1, dtype=np.int64)
        assert got == (v * 257 - 32768).astype("<i2").tobytes(), \
            r.media_id


def test_wav16_parse_folds_to_exact_codepoints():
    """_parse_wav on a 16-bit payload recovers the u8 domain exactly
    on the builder grid, and the (s + 32768) >> 8 fold matches an
    independent biased-top-byte computation on arbitrary samples."""
    from mktd6_flink_spark.functions.multimodal import (WAV_RATE,
                                                        _parse_wav)

    def wav16(samples_i16: np.ndarray) -> bytes:
        data = samples_i16.astype("<i2").tobytes()
        return (b"RIFF" + struct.pack("<I", 36 + len(data))
                + b"WAVEfmt " + struct.pack("<IHHIIHH", 16, 1, 1,
                                            WAV_RATE, WAV_RATE * 2,
                                            2, 16)
                + b"data" + struct.pack("<I", len(data)) + data)

    v = np.arange(256, dtype=np.int64)
    rate, got = _parse_wav(wav16(v * 257 - 32768))
    assert rate == WAV_RATE
    assert (got == v).all()
    rng = np.random.RandomState(15)
    s = rng.randint(-32768, 32768, 500, dtype=np.int64)
    _, got = _parse_wav(wav16(s))
    want = ((s + 32768) // 256).astype(np.uint8)
    assert (got == want).all()


def test_wav16_error_contract():
    from mktd6_flink_spark.functions.multimodal import (WAV_RATE,
                                                        _parse_wav)

    def wav(fmt_body: bytes, data: bytes) -> bytes:
        return (b"RIFF" + struct.pack("<I", 20 + len(fmt_body)
                                      + len(data))
                + b"WAVEfmt " + struct.pack("<I", len(fmt_body))
                + fmt_body
                + b"data" + struct.pack("<I", len(data)) + data)

    fmt16 = struct.pack("<HHIIHH", 1, 1, WAV_RATE, WAV_RATE * 2, 2, 16)
    # odd byte count cannot be 16-bit samples
    with pytest.raises(ValueError, match="odd 16-bit"):
        _parse_wav(wav(fmt16, b"\x00\x01\x02"))
    # 24-bit PCM PARSES since round 16 (0 bias-folds to u8 128);
    # ADPCM (fmt 2) and a float fmt at a non-32 width stay rejected;
    # stereo 16-bit PARSES since the stereo lane landed (downmix of
    # equal channels = the channel value)
    fmt24 = struct.pack("<HHIIHH", 1, 1, WAV_RATE, WAV_RATE * 3, 3, 24)
    _rate, s24 = _parse_wav(wav(fmt24, b"\x00" * 6))
    assert list(s24) == [128, 128]
    fmt_adpcm = struct.pack("<HHIIHH", 2, 1, WAV_RATE, WAV_RATE, 1, 8)
    with pytest.raises(ValueError, match="unsupported"):
        _parse_wav(wav(fmt_adpcm, b"\x00" * 4))
    fmt_f16 = struct.pack("<HHIIHH", 3, 1, WAV_RATE, WAV_RATE * 2, 2, 16)
    with pytest.raises(ValueError, match="unsupported"):
        _parse_wav(wav(fmt_f16, b"\x00" * 4))
    fmt_st = struct.pack("<HHIIHH", 1, 2, WAV_RATE, WAV_RATE * 4, 4, 16)
    _rate, st = _parse_wav(wav(fmt_st, b"\x00" * 8))
    assert list(st) == [128, 128]
    # 16-bit with a valid even payload parses: 0x8000 = -32768 folds
    # to u8 0, 0x0000 = 0 folds to the u8 midpoint 128
    rate, got = _parse_wav(wav(fmt16, b"\x00\x80\x00\x00"))
    assert list(got) == [0, 128]


def test_decode_wav16_equals_u8_twin(spark):
    """The two widths must land on IDENTICAL clip features for the
    same documents — the property that lets them share one oracle."""
    from mktd6_flink_spark.functions import multimodal as mm

    docs = spark.createDataFrame(
        [(1, "same features either width"), (2, ""), (3, "a" * 300)],
        "doc_id long, text string")
    a = {r.media_id: r for r in mm.decode_wav(
        mm.wav_media_from_documents(docs)).collect()}
    b = {r.media_id: r for r in mm.decode_wav(
        mm.wav16_media_from_documents(docs)).collect()}
    assert a.keys() == b.keys() and len(a) == 3
    for k in a:
        assert a[k] == b[k]


# --------------------------------------- decode attrition report (r15)

def test_attrition_classes_pin_reasons():
    """One payload per (modality, class): the corrupted payload must
    fail with a message classified to EXACTLY the class's mapped
    reason, and the intact payload must decode — the per-class
    contract the mm_decode_report oracle counts on."""
    from mktd6_flink_spark.functions import multimodal as mm
    from mktd6_flink_spark.functions.jpeg import encode_dc_jpeg
    from mktd6_flink_spark.functions.jpeg_progressive import (
        decode_jpeg_any, encode_dc_jpeg_progressive)
    from mktd6_flink_spark.functions.png import (decode_png_gray,
                                                 encode_png_gray)

    grid = np.arange(6, dtype=np.uint8).reshape(2, 3) * 40
    v = np.array([104, 105], dtype=np.int64)  # "hi"
    wav8 = (b"RIFF" + struct.pack("<I", 36 + 2) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
            + b"data" + struct.pack("<I", 2) + bytes([104, 105]))
    wav16 = (b"RIFF" + struct.pack("<I", 36 + 4) + b"WAVEfmt "
             + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
             + b"data" + struct.pack("<I", 4)
             + (v * 257 - 32768).astype("<i2").tobytes())
    cases = [
        ("image_jpeg", encode_dc_jpeg(grid), decode_jpeg_any),
        ("image_jpeg", encode_dc_jpeg_progressive(grid),
         decode_jpeg_any),
        ("image_png", encode_png_gray(grid), decode_png_gray),
        ("audio_wav", wav8, mm._parse_wav),
        ("audio_wav", wav16, mm._parse_wav),
    ]
    for modality, payload, decode in cases:
        decode(bytes(payload))  # class 0 must decode
        for cls in range(1, 5):
            bad = mm._corrupt_for_report(bytes(payload), cls, modality)
            with pytest.raises(ValueError) as exc:
                decode(bytes(bad))
            got = mm.classify_decode_error(str(exc.value))
            want = mm._REPORT_CLS_REASON[cls]
            assert got == want, (modality, cls, str(exc.value), got)


def test_classify_decode_error_unknown_is_other():
    from mktd6_flink_spark.functions.multimodal import (
        classify_decode_error)

    assert classify_decode_error("some future message") == "other"
    assert classify_decode_error("chunk CRC mismatch") == "bad_crc"
    # known vocabulary spot checks
    assert classify_decode_error("not a JPEG payload (no SOI)") == \
        "bad_magic"
    assert classify_decode_error("entropy data exhausted") == \
        "truncated"
    assert classify_decode_error(
        "unsupported PNG color type 4 (want 0)") == "unsupported_profile"
    assert classify_decode_error(
        "image dimensions exceed decode cap") == "header_invalid"


# ------------------------------------------------- stereo WAV (r15)

def test_wav_stereo_payloads_open_with_stdlib_wave(spark):
    """stdlib `wave` must open both planted stereo widths with 2
    channels and the right sample width, and the frame bytes must
    equal the interleaved L/R derivation."""
    from mktd6_flink_spark.functions import multimodal as mm

    texts = {2: "even is u8 stereo", 3: "odd is sixteen bit", 4: "",
             5: None}
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string")
    rows = mm.wav_stereo_media_from_documents(docs).collect()
    assert len(rows) == 4
    for r in rows:
        with wave.open(io.BytesIO(bytes(r.payload))) as wf:
            assert wf.getnchannels() == 2
            assert wf.getsampwidth() == (1 if r.media_id % 2 == 0
                                         else 2)
            assert wf.getframerate() == mm.WAV_RATE
            got = wf.readframes(wf.getnframes())
        v = np.frombuffer(_clean(texts[r.media_id]).encode("ascii"),
                          dtype=np.uint8).astype(np.int64)
        if v.size == 0:
            v = np.zeros(1, dtype=np.int64)
        frames = np.stack([v, (v * 37) % 256], axis=-1)
        if r.media_id % 2 == 0:
            want = frames.astype(np.uint8).tobytes()
        else:
            want = (frames * 257 - 32768).astype("<i2").tobytes()
        assert got == want, r.media_id


def test_wav_stereo_downmix_exact():
    """Deinterleave + width-fold + (l + r) // 2 downmix, pinned on
    crafted frames in both widths."""
    from mktd6_flink_spark.functions.multimodal import (WAV_RATE,
                                                        _parse_wav)

    def wav(channels, bits, data):
        align = channels * (bits // 8)
        return (b"RIFF" + struct.pack("<I", 36 + len(data))
                + b"WAVEfmt " + struct.pack(
                    "<IHHIIHH", 16, 1, channels, WAV_RATE,
                    WAV_RATE * align, align, bits)
                + b"data" + struct.pack("<I", len(data)) + data)

    # u8 stereo: frames (10, 21), (255, 0), (7, 8)
    _, got = _parse_wav(wav(2, 8, bytes([10, 21, 255, 0, 7, 8])))
    assert list(got) == [(10 + 21) // 2, (255 + 0) // 2, (7 + 8) // 2]
    # 16-bit stereo on the lossless grid
    v = np.array([[3, 200], [128, 129]], dtype=np.int64)
    data = (v * 257 - 32768).astype("<i2").tobytes()
    _, got = _parse_wav(wav(2, 16, data))
    assert list(got) == [(3 + 200) // 2, (128 + 129) // 2]
    # stereo with an odd FRAME count (u8: 3 bytes) is malformed and
    # classifies as truncated
    from mktd6_flink_spark.functions.multimodal import (
        classify_decode_error)
    with pytest.raises(ValueError) as exc:
        _parse_wav(wav(2, 8, bytes([1, 2, 3])))
    assert classify_decode_error(str(exc.value)) == "truncated"
    # 3-channel stays rejected
    with pytest.raises(ValueError, match="unsupported"):
        _parse_wav(wav(3, 8, bytes([1, 2, 3])))
