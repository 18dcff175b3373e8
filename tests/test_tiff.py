"""Baseline TIFF codec (round 17 late addition): roundtrips across
byte order x compression x strip layout x photometric, an INDEPENDENT
hand-packed writer as the cross-check (no stdlib TIFF reader exists),
PackBits packet-level properties, the error contract's
attrition-taxonomy mapping, and ValueError-totality fuzz."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mktd6_flink_spark.functions.multimodal import classify_decode_error
from mktd6_flink_spark.functions.tiff import (decode_tiff_gray,
                                              encode_tiff_gray,
                                              packbits_decode,
                                              packbits_encode)


@pytest.mark.parametrize("white_is_zero", [False, True])
@pytest.mark.parametrize("rps", [None, 1, 2, 5])
@pytest.mark.parametrize("packbits", [False, True])
@pytest.mark.parametrize("big_endian", [False, True])
def test_roundtrip_matrix(big_endian, packbits, rps, white_is_zero):
    rng = np.random.RandomState(7)
    grid = rng.randint(0, 256, (5, 9), dtype=np.uint8)
    payload = encode_tiff_gray(grid, big_endian=big_endian,
                               packbits=packbits, rows_per_strip=rps,
                               white_is_zero=white_is_zero)
    assert payload[:2] == (b"MM" if big_endian else b"II")
    w, h, out = decode_tiff_gray(payload)
    assert (w, h) == (9, 5)
    assert (out == grid).all()


def test_parity_with_independent_writer():
    """Independent cross-check: a hand-packed single-strip
    little-endian writer with the IFD FIRST (data after — the
    opposite file layout from the production encoder, legal because
    offsets are explicit) must decode identically."""
    rng = np.random.RandomState(11)
    grid = rng.randint(0, 256, (4, 6), dtype=np.uint8)
    n_ent = 9
    ifd_at = 8
    data_at = ifd_at + 2 + 12 * n_ent + 4

    def ent(tag, typ, count, inline4):
        return struct.pack("<HHI", tag, typ, count) + inline4

    short = lambda v: struct.pack("<H", v) + b"\x00\x00"
    lng = lambda v: struct.pack("<I", v)
    ifd = b"".join([
        ent(256, 3, 1, short(6)),    # width as SHORT (encoder: LONG)
        ent(257, 3, 1, short(4)),
        ent(258, 3, 1, short(8)),
        ent(259, 3, 1, short(1)),
        ent(262, 3, 1, short(1)),
        ent(273, 4, 1, lng(data_at)),
        ent(277, 3, 1, short(1)),
        ent(278, 3, 1, short(4)),    # RowsPerStrip as SHORT
        ent(279, 4, 1, lng(24)),
    ])
    naive = (b"II\x2a\x00" + struct.pack("<I", ifd_at)
             + struct.pack("<H", n_ent) + ifd + struct.pack("<I", 0)
             + grid.tobytes())
    a = decode_tiff_gray(naive)
    b = decode_tiff_gray(encode_tiff_gray(grid))
    assert a[:2] == b[:2] == (6, 4)
    assert (a[2] == grid).all() and (b[2] == grid).all()


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400))
def test_packbits_roundtrip_property(data):
    enc = packbits_encode(data)
    assert packbits_decode(enc, len(data)) == data


def test_packbits_uses_both_packet_kinds_and_noop():
    data = b"aaaaaabcdefg" + b"z" * 130 + b"xy"
    enc = packbits_encode(data)
    kinds = set()
    pos = 0
    while pos < len(enc):
        b = enc[pos]
        pos += 1
        if b < 128:
            kinds.add("literal")
            pos += b + 1
        elif b > 128:
            kinds.add("repeat")
            pos += 1
    assert kinds == {"literal", "repeat"}
    # decoder accepts the 0x80 noop mid-stream
    assert packbits_decode(b"\x80" + enc + b"\x80", len(data)) == data


def test_tiff_error_contract_and_taxonomy():
    grid = np.arange(24, dtype=np.uint8).reshape(4, 6)
    good = encode_tiff_gray(grid)
    le = lambda p, at, fmt, v: p[:at] + struct.pack("<" + fmt, v) + \
        p[at + struct.calcsize(fmt):]
    ifd_at, = struct.unpack("<I", good[4:8])

    def tag_field(payload, tag, off):
        for i in range(struct.unpack("<H",
                                     payload[ifd_at:ifd_at + 2])[0]):
            at = ifd_at + 2 + 12 * i
            if struct.unpack("<H", payload[at:at + 2])[0] == tag:
                return at + off
        raise AssertionError(tag)

    cases = [
        (b"XX" + good[2:], "not a TIFF", "bad_magic"),
        (good[:6], "truncated", "truncated"),
        (good[:ifd_at + 10], "IFD truncated", "truncated"),
        (le(good, tag_field(good, 258, 8), "H", 16),
         "unsupported TIFF bit depth", "unsupported_profile"),
        (le(good, tag_field(good, 259, 8), "H", 5),  # LZW code
         "unsupported TIFF compression", "unsupported_profile"),
        (le(good, tag_field(good, 262, 8), "H", 3),  # palette photo
         "unsupported TIFF photometric", "unsupported_profile"),
        (le(good, tag_field(good, 277, 8), "H", 3),
         "unsupported TIFF sample count", "unsupported_profile"),
        (le(good, tag_field(good, 256, 8), "I", 0),
         "invalid dimensions", "header_invalid"),
        (le(good, tag_field(good, 256, 2), "H", 99),  # FLOAT type
         "unsupported TIFF tag type", "unsupported_profile"),
        (le(good, tag_field(good, 279, 8), "I", 10 ** 6),
         "strip truncated", "truncated"),
        (le(good, tag_field(good, 278, 8), "I", 1),  # 4 strips? has 1
         "strip layout invalid", "header_invalid"),
    ]
    for payload, frag, reason in cases:
        with pytest.raises(ValueError, match=frag) as exc:
            decode_tiff_gray(bytes(payload))
        assert classify_decode_error(str(exc.value)) == reason, frag
    # a required tag gone entirely: retag width to a private number
    gone = le(good, tag_field(good, 256, 0), "H", 65000)
    with pytest.raises(ValueError, match="required tag") as exc:
        decode_tiff_gray(gone)
    assert classify_decode_error(str(exc.value)) == "header_invalid"
    # corrupt PackBits: flip the first packet byte (strip data starts
    # at offset 8 in the production layout) into an overshooting
    # repeat — must raise inside the taxonomy, never mis-decode
    pb = encode_tiff_gray(grid, packbits=True)
    bad = pb[:8] + b"\x82" + pb[9:]  # repeat 127 at pos 0 (24-px strip)
    with pytest.raises(ValueError) as exc:
        decode_tiff_gray(bad)
    assert classify_decode_error(str(exc.value)) in (
        "header_invalid", "truncated")


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=300))
def test_tiff_decoder_total_on_garbage(tail):
    for payload in (tail, b"II\x2a\x00" + tail, b"MM\x00\x2a" + tail):
        try:
            decode_tiff_gray(payload)
        except ValueError:
            pass


def test_tiff_mutation_fuzz_valueerror_only():
    rng = np.random.RandomState(17)
    grid = rng.randint(0, 256, (5, 6), dtype=np.uint8)
    goods = [
        encode_tiff_gray(grid),
        encode_tiff_gray(grid, big_endian=True, packbits=True,
                         rows_per_strip=2),
        encode_tiff_gray(grid, white_is_zero=True, rows_per_strip=1),
    ]
    for good in goods:
        for cut in range(0, len(good), 5):
            try:
                decode_tiff_gray(good[:cut])
            except ValueError:
                pass
        for i in range(0, len(good), 3):
            mut = bytearray(good)
            mut[i] ^= 0x5A
            try:
                decode_tiff_gray(bytes(mut))
            except ValueError:
                pass
