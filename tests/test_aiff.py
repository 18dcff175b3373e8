"""AIFF codec (round 17 late addition): parser/builder roundtrip,
80-bit extended-float exactness, the stdlib ``aifc`` independent
cross-check, the wav16 feature-parity property (same fold, different
container), the error contract's attrition-taxonomy mapping, and
ValueError-totality fuzz."""

from __future__ import annotations

import io
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mktd6_flink_spark.functions.multimodal import (WAV_RATE,
                                                    _ext80_encode,
                                                    _ext80_to_int,
                                                    _parse_aiff,
                                                    classify_decode_error)


def _build(v: "np.ndarray", did: int) -> bytes:
    """Standalone twin of the aiff_media_from_documents inner builder
    (same profile rotation), so parser tests need no Spark session."""
    data = (v.astype(np.int64) * 257 - 32768).astype(">i2").tobytes()
    off = 2 if did % 2 else 0
    ssnd_body = struct.pack(">II", off, 0) + b"\xee" * off + data
    chunks = b""
    if did % 3 == 0:
        chunks += b"ANNO" + struct.pack(">I", 5) + b"mktd6\x00"
    chunks += (b"COMM" + struct.pack(">IHIH", 18, 1, v.size, 16)
               + _ext80_encode(WAV_RATE)
               + b"SSND" + struct.pack(">I", len(ssnd_body))
               + ssnd_body)
    return b"FORM" + struct.pack(">I", 4 + len(chunks)) + b"AIFF" \
        + chunks


@pytest.mark.parametrize("did", [0, 1, 2, 3, 6, 7])
def test_parse_roundtrip_all_profiles(did):
    rng = np.random.RandomState(did + 1)
    v = rng.randint(0, 128, 200).astype(np.uint8)
    rate, samples = _parse_aiff(_build(v, did))
    assert rate == WAV_RATE
    assert (samples == v).all()


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=1, max_value=(1 << 62) - 1))
def test_ext80_exact_integer_roundtrip(value):
    assert _ext80_to_int(_ext80_encode(value)) == value


def test_ext80_rejects_nonsense():
    for raw in (
        b"\x80\x00" + b"\x00" * 8,               # negative sign
        b"\x40\x0c" + b"\x00" * 8,               # zero mantissa
        b"\x7f\xff" + b"\xff" * 8,               # exponent too big
        _ext80_encode(3)[:2] + ((3 << 61) | 1).to_bytes(8, "big"),
    ):
        with pytest.raises(ValueError, match="sample rate"):
            _ext80_to_int(raw)


def test_stdlib_aifc_opens_payloads():
    """Honesty check: python's stdlib aifc reader (the independent
    implementation) opens the builder's payloads and returns the
    same frames. Offset-0 profile (aifc ignores the SSND offset
    field, so nonzero-offset payloads are checked by _parse_aiff's
    own roundtrip instead). Import-guarded: aifc leaves the stdlib
    in python 3.13."""
    aifc = pytest.importorskip("aifc")
    v = np.arange(100, dtype=np.uint8)
    payload = _build(v, did=2)  # even: offset 0; no ANNO
    with aifc.open(io.BytesIO(payload)) as f:
        assert f.getnchannels() == 1
        assert f.getsampwidth() == 2
        assert f.getframerate() == WAV_RATE
        assert f.getnframes() == 100
        frames = f.readframes(100)
    expect = (v.astype(np.int64) * 257 - 32768).astype(">i2").tobytes()
    assert frames == expect


def test_feature_parity_with_wav16_fold():
    """The AIFF fold must land in the same u8 feature domain as the
    16-bit WAV lane: mean/peak over the recovered v values."""
    rng = np.random.RandomState(9)
    v = rng.randint(0, 128, 500).astype(np.uint8)
    _, samples = _parse_aiff(_build(v, 1))
    assert int(samples.max()) == int(v.max())
    assert int(samples.sum()) == int(v.sum())


def test_aiff_error_contract_and_taxonomy():
    v = np.arange(10, dtype=np.uint8)
    good = _build(v, did=2)
    comm_at = good.find(b"COMM")
    ssnd_at = good.find(b"SSND")
    cases = [
        (b"XXXX" + good[4:], "not a FORM/AIFF", "bad_magic"),
        (good[:4] + struct.pack(">I", 10 ** 6) + good[8:],
         "truncated FORM", "truncated"),
        (good[:comm_at + 4] + struct.pack(">I", 4)
         + good[comm_at + 8:], "short COMM", "truncated"),
        # stereo
        (good[:comm_at + 8] + struct.pack(">H", 2)
         + good[comm_at + 10:], "unsupported AIFF",
         "unsupported_profile"),
        # 8-bit
        (good[:comm_at + 14] + struct.pack(">H", 8)
         + good[comm_at + 16:], "unsupported AIFF",
         "unsupported_profile"),
        # frame count beyond the SSND data
        (good[:comm_at + 10] + struct.pack(">I", 10 ** 6)
         + good[comm_at + 14:], "AIFF samples", "truncated"),
        # SSND offset beyond the chunk
        (good[:ssnd_at + 8] + struct.pack(">I", 10 ** 6)
         + good[ssnd_at + 12:], "AIFF samples", "truncated"),
        # mangled extended-float rate (negative)
        (good[:comm_at + 16] + b"\xff\xff" + good[comm_at + 18:],
         "sample rate", "header_invalid"),
    ]
    for payload, frag, reason in cases:
        with pytest.raises(ValueError, match=frag) as exc:
            _parse_aiff(bytes(payload))
        assert classify_decode_error(str(exc.value)) == reason, frag
    # missing SSND entirely: truncate right after COMM
    cut = good[:ssnd_at]
    fixed = cut[:4] + struct.pack(">I", len(cut) - 8) + cut[8:]
    with pytest.raises(ValueError, match="missing COMM or SSND") as exc:
        _parse_aiff(fixed)
    assert classify_decode_error(str(exc.value)) == "truncated"


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=300))
def test_aiff_parser_total_on_garbage(tail):
    for payload in (tail, b"FORM" + b"\x00\x00\x01\x00AIFF" + tail):
        try:
            _parse_aiff(payload)
        except ValueError:
            pass


def test_aiff_mutation_fuzz_valueerror_only():
    rng = np.random.RandomState(21)
    v = rng.randint(0, 128, 40).astype(np.uint8)
    for did in (0, 1):
        good = _build(v, did)
        for cut in range(0, len(good), 5):
            try:
                _parse_aiff(good[:cut])
            except ValueError:
                pass
        for i in range(0, len(good), 3):
            mut = bytearray(good)
            mut[i] ^= 0x5A
            try:
                _parse_aiff(bytes(mut))
            except ValueError:
                pass


def test_trailing_junk_after_declared_form_is_ignored():
    """Wild AIFFs commonly carry trailing non-IFF bytes after the
    declared FORM (ID3v1 'TAG' blocks, padding). The chunk walk is
    bounded by form_size, so an intact payload must decode
    identically with any suffix appended — and a chunk that overruns
    the DECLARED span must still raise."""
    v = np.arange(40, dtype=np.uint8)
    for did in (0, 1, 2, 3):
        good = _build(v, did)
        rate, samples = _parse_aiff(good)
        for junk in (b"TAG" + b"\x00" * 125,   # ID3v1-shaped
                     b"\xff" * 8, b"A"):
            rate2, samples2 = _parse_aiff(good + junk)
            assert rate2 == rate
            assert np.array_equal(samples2, samples)
    # a chunk header whose size runs past the declared FORM raises
    good = _build(v, 1)
    ssnd_at = good.find(b"SSND")
    over = (good[:ssnd_at + 4] + struct.pack(">I", 10 ** 5)
            + good[ssnd_at + 8:])
    with pytest.raises(ValueError, match="truncated"):
        _parse_aiff(over)
