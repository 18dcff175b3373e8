"""FLAC codec tests (round 17 late addition): roundtrips across
subframe kinds / partitions / escapes, hand-built streams for the
decode-only features (rice2 parameters, wasted bits), an independent
bit-serial CRC spelling against the table-driven one, a byte-exact
golden frame, UTF-8 frame-number coding to the 7-byte form, the
error contract with taxonomy classification, and truncation/mutation
fuzz (ValueError only)."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from mktd6_flink_spark.functions.flac import (BLOCKSIZE, _BitReader,
                                              _BitWriter, _parse_flac,
                                              _read_utf8, _utf8_code,
                                              crc8, crc16, encode_flac)
from mktd6_flink_spark.functions.multimodal import classify_decode_error


def _crc_bitwise(data: bytes, poly: int, width: int) -> int:
    """Independent bit-serial CRC spelling (no table)."""
    crc = 0
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    for b in data:
        for i in range(7, -1, -1):
            bit = (b >> i) & 1
            fb = ((crc >> (width - 1)) & 1) ^ bit
            crc = ((crc << 1) & mask) ^ (poly & mask if fb else 0)
    return crc


def test_crc_tables_match_bitwise_spelling():
    rng = np.random.RandomState(3)
    for _ in range(20):
        data = rng.bytes(rng.randint(1, 64))
        assert crc8(data) == _crc_bitwise(data, 0x07, 8)
        assert crc16(data) == _crc_bitwise(data, 0x8005, 16)


@pytest.mark.parametrize("n", [1, 5, 255, 256, 257, 300, 513, 1000])
def test_roundtrip_sizes_and_kinds(n):
    rng = np.random.RandomState(n)
    v = rng.randint(0, 128, n).astype(np.int64)
    s = v * 257 - 32768
    for seed, kinds in enumerate((
            None,
            lambda f: "verbatim",
            lambda f: ("fixed1", "fixed2", "fixed3", "fixed4")[f % 4],
            lambda f: "fixed0")):
        rate, out = _parse_flac(encode_flac(
            s, 8000, padding=seed == 1, vorbis=seed == 2, kinds=kinds))
        assert rate == 8000
        assert np.array_equal(out, s)


def test_constant_frames_and_compression_is_real():
    s = np.full(600, -1234, dtype=np.int64)
    payload = encode_flac(s, 8000)
    rate, out = _parse_flac(payload)
    assert np.array_equal(out, s)
    assert len(payload) < 600 * 2 // 10  # constant frames: tiny
    # a smooth ramp under fixed2 beats verbatim
    t = (np.arange(1000) % 200) * 7 - 500
    smooth = encode_flac(t, 8000, kinds=lambda f: "fixed2")
    verb = encode_flac(t, 8000, kinds=lambda f: "verbatim")
    assert len(smooth) < len(verb)
    assert np.array_equal(_parse_flac(smooth)[1], t)


def test_utf8_frame_number_coding_all_widths():
    for n in (0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000,
              0x1FFFFF, 0x3FFFFFF, 0x7FFFFFFF, (1 << 36) - 1):
        code = _utf8_code(n)
        v, pos = _read_utf8(code, 0)
        assert (v, pos) == (n, len(code))
    assert len(_utf8_code((1 << 36) - 1)) == 7
    with pytest.raises(ValueError, match="coding invalid"):
        _read_utf8(b"\x80", 0)  # bare continuation byte as lead


def test_golden_two_sample_stream_bytes():
    """Byte-exact golden: 2 samples, one VERBATIM frame — every
    field computed by hand (structure) or by the independent
    bit-serial CRC."""
    s = np.array([100, -200], dtype=np.int64)
    payload = encode_flac(s, 8000, kinds=lambda f: "verbatim")
    assert payload[:4] == b"fLaC"
    assert payload[4] == 0x80  # last-metadata flag | STREAMINFO
    assert payload[5:8] == b"\x00\x00\x22"  # 34-byte body
    info = payload[8:42]
    assert info[0:2] == struct.pack(">H", BLOCKSIZE)
    assert info[2:4] == struct.pack(">H", BLOCKSIZE)
    # rate 8000 in 20 bits, channels-1=0 in 3, bps-1=15 in 5, n=2 in 36
    packed = (8000 << 44) | (0 << 41) | (15 << 36) | 2
    assert info[10:18] == packed.to_bytes(8, "big")
    assert info[18:34] == hashlib.md5(
        s.astype("<i2").tobytes()).digest()
    frame = payload[42:]
    hdr = bytes([0xFF, 0xF8, 0x70, 0x08, 0x00, 0x00, 0x01])
    assert frame[:7] == hdr
    assert frame[7] == _crc_bitwise(hdr, 0x07, 8)
    body = bytes([0x02]) + struct.pack(">hh", 100, -200)
    assert frame[8:13] == body
    assert frame[13:15] == struct.pack(
        ">H", _crc_bitwise(frame[:13], 0x8005, 16))
    assert len(frame) == 15


def _hand_stream(build_subframe, bs: int, samples: "np.ndarray"):
    """Assemble a stream around a hand-built subframe bit pattern."""
    info = _BitWriter()
    info.write(BLOCKSIZE, 16)
    info.write(BLOCKSIZE, 16)
    info.write(0, 48)
    info.write(8000, 20)
    info.write(0, 3)
    info.write(15, 5)
    info.write(samples.size, 36)
    md5 = hashlib.md5(samples.astype("<i2").tobytes()).digest()
    out = bytearray(b"fLaC\x80\x00\x00\x22") + info.bytes() + md5
    hdr = bytearray([0xFF, 0xF8, 0x70, 0x08, 0x00])
    hdr += struct.pack(">H", bs - 1)
    hdr.append(crc8(bytes(hdr)))
    w = _BitWriter()
    build_subframe(w)
    w.align()
    frame = bytes(hdr) + w.bytes()
    out += frame + struct.pack(">H", crc16(frame))
    return bytes(out)


def test_rice2_parameters_decode():
    """Method 1 (5-bit rice2 parameters) is decode-only for the
    encoder; hand-build a FIXED-order-0 subframe using it."""
    s = np.array([5, -3, 0, 7], dtype=np.int64)

    def sub(w):
        w.write(0b001000 << 1, 8)  # fixed order 0
        w.write(0b01, 2)           # rice2
        w.write(0, 4)              # one partition
        w.write(2, 5)              # parameter 2
        for r in s.tolist():
            u = 2 * r if r >= 0 else -2 * r - 1
            w.write_unary(u >> 2)
            w.write(u, 2)

    rate, out = _parse_flac(_hand_stream(sub, 4, s))
    assert np.array_equal(out, s)


def test_wasted_bits_decode():
    """Samples sharing a factor of 4 stored with 2 wasted bits."""
    s = np.array([4, -8, 12, 0], dtype=np.int64)

    def sub(w):
        w.write(0b000001, 7)  # zero pad bit + VERBATIM type
        w.write(1, 1)         # wasted-bits flag
        w.write_unary(1)      # unary 1 -> wasted = 2
        for v in (s >> 2).tolist():
            w.write(int(v) & ((1 << 14) - 1), 14)

    rate, out = _parse_flac(_hand_stream(sub, 4, s))
    assert np.array_equal(out, s)


def test_escape_partition_width_zero():
    """An all-zero partition escapes with bit width 0 (no bits)."""
    s = np.zeros(8, dtype=np.int64) + 9  # constant-forced otherwise
    s[0] = 9  # fixed1: residuals all zero after warmup

    def sub(w):
        w.write((0b001000 | 1) << 1, 8)  # fixed order 1
        w.write(9, 16)                   # warmup
        w.write(0b00, 2)
        w.write(0, 4)
        w.write(0b1111, 4)               # escape
        w.write(0, 5)                    # width 0
    rate, out = _parse_flac(_hand_stream(sub, 8, s))
    assert np.array_equal(out, s)


def test_integrity_fields_are_verified():
    s = (np.arange(40, dtype=np.int64) % 50) * 11 - 100
    good = bytearray(encode_flac(s, 8000))
    # header CRC: flip the frame's blocksize byte
    b = bytearray(good)
    b[46] ^= 0x01
    with pytest.raises(ValueError, match="CRC mismatch"):
        _parse_flac(bytes(b))
    # frame CRC: flip one residual bit near the end of the frame
    b = bytearray(good)
    b[-3] ^= 0x40
    with pytest.raises(ValueError, match="CRC mismatch"):
        _parse_flac(bytes(b))
    # MD5: re-sign a frame whose samples changed -> MD5 catches it
    tampered = bytearray(encode_flac(s, 8000))
    frame_at = 42
    body = tampered[frame_at:-2]
    body_b = bytearray(body)
    body_b[8 + 1 + 2:8 + 1 + 4] = struct.pack(">h", 1234)  # verbatim s0
    hdr_len = 8  # sync..crc8 for the 40-sample single short frame
    body_b[hdr_len - 1] = crc8(bytes(body_b[:hdr_len - 1]))
    tampered[frame_at:-2] = body_b
    tampered[-2:] = struct.pack(">H", crc16(bytes(body_b)))
    with pytest.raises(ValueError, match="MD5 mismatch"):
        _parse_flac(bytes(tampered))


def test_error_contract_and_taxonomy():
    s = (np.arange(30, dtype=np.int64) % 40) * 3
    good = encode_flac(s, 8000)
    lpc = bytearray(good)
    # subframe header is the byte right after the frame header CRC-8
    sub_at = 42 + 8
    lpc[sub_at] = 0b100000 << 1  # LPC order 1
    cases = [
        (b"XXXX" + good[4:], "not a FLAC", "bad_magic"),
        (good[:20], "truncated FLAC", "truncated"),
        (bytes(lpc), None, None),  # CRC fires before the LPC type
    ]
    for payload, frag, reason in cases[:2]:
        with pytest.raises(ValueError, match=frag):
            _parse_flac(payload)
        try:
            _parse_flac(payload)
        except ValueError as e:
            assert classify_decode_error(str(e)) == reason
    # LPC subframes classify unsupported once the CRCs are re-signed
    body = bytearray(lpc[42:-2])
    body[7] = crc8(bytes(body[:7]))
    full = lpc[:42] + body + struct.pack(">H", crc16(bytes(body)))
    with pytest.raises(ValueError, match="unsupported FLAC subframe"):
        _parse_flac(bytes(full))
    assert classify_decode_error(
        "unsupported FLAC subframe (LPC)") == "unsupported_profile"


def test_truncation_and_mutation_fuzz_valueerror_only():
    rng = np.random.RandomState(11)
    v = rng.randint(0, 128, 90).astype(np.int64)
    good = encode_flac(v * 257 - 32768, 8000, padding=True)
    for cut in range(0, len(good), 3):
        try:
            _parse_flac(good[:cut])
        except ValueError:
            pass
    for i in range(len(good)):
        mut = bytearray(good)
        mut[i] ^= rng.randint(1, 255)
        try:
            _parse_flac(bytes(mut))
        except ValueError:
            pass


def test_bit_reader_writer_inverse():
    rng = np.random.RandomState(5)
    fields = [(int(rng.randint(0, 1 << w)), int(w))
              for w in rng.randint(1, 24, 200)]
    w = _BitWriter()
    for v, nb in fields:
        w.write(v, nb)
    w.align()
    r = _BitReader(w.bytes())
    for v, nb in fields:
        assert r.read(nb) == v


def test_trailing_junk_after_declared_total_is_ignored():
    """The RIFF/FORM trailing-junk rule, with STREAMINFO's
    total-samples field as the declared bound: an intact stream
    decodes identically with an ID3v1-style trailer appended."""
    rng = np.random.RandomState(17)
    v = rng.randint(0, 128, 300).astype(np.int64)
    s = v * 257 - 32768
    good = encode_flac(s, 8000)
    rate, out = _parse_flac(good)
    for junk in (b"TAG" + b"\x00" * 125, b"\xff" * 9, b"A"):
        rate2, out2 = _parse_flac(good + junk)
        assert rate2 == rate
        assert np.array_equal(out2, out)


def test_truncated_bs_code6_header_is_valueerror():
    """A frame header ending right where the 8-bit blocksize byte
    should be must raise ValueError (the drop-per-row contract),
    never IndexError."""
    s = np.array([1, 2, 3], dtype=np.int64)
    good = bytearray(encode_flac(s, 8000))
    hdr = bytearray(good[42:47])  # sync, codes, utf8(0)
    hdr[2] = (6 << 4) | (hdr[2] & 0x0F)  # bs_code 6: 8-bit field
    cut = bytes(good[:42]) + bytes(hdr)  # ends before the size byte
    with pytest.raises(ValueError, match="truncated FLAC"):
        _parse_flac(cut)


def test_explicit_rate_codes_validated_against_streaminfo():
    """Rate codes 12-14 carry the rate at the header's end; they must
    agree with STREAMINFO exactly like the table codes (a mismatch
    decoded silently before this test)."""
    s = np.array([5, -5, 9, 0], dtype=np.int64)
    good = bytearray(encode_flac(s, 8000))
    frame_at = 42
    # rebuild the header with rate_code 12 and an 8 kHz explicit byte
    hdr = bytearray(good[frame_at:frame_at + 7])  # FF F8 7x 08 00 HH HH
    hdr[2] = (hdr[2] & 0xF0) | 12
    ok_hdr = hdr + bytes([8])  # 8 kHz in kHz units
    bad_hdr = hdr + bytes([44])  # 44 kHz: mismatch
    body = good[frame_at + 8:-2]  # subframe bits after the old crc8
    for h, match in ((ok_hdr, None), (bad_hdr, "rate mismatch")):
        frame = bytes(h) + bytes([crc8(bytes(h))]) + bytes(body)
        full = (bytes(good[:frame_at]) + frame
                + struct.pack(">H", crc16(frame)))
        if match is None:
            rate, out = _parse_flac(full)
            assert np.array_equal(out, s)
        else:
            with pytest.raises(ValueError, match=match):
                _parse_flac(full)
