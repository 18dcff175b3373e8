"""ICO container tests (round 17 late addition): roundtrips across
all three image profiles, the largest-image selection rule, AND-mask
compositing, the 0-means-256 dimension bytes, the error contract with
attrition-taxonomy classification, and mutation/truncation fuzz
(ValueError only)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from mktd6_flink_spark.functions.ico import (decode_ico, encode_ico,
                                             _decode_dib, _dib_encode)
from mktd6_flink_spark.functions.multimodal import (_rgb_channels,
                                                    classify_decode_error)
from mktd6_flink_spark.functions.png import encode_png_rgb


def _grid(h: int, w: int, seed: int = 0) -> "np.ndarray":
    rng = np.random.RandomState(seed + 1)
    return rng.randint(0, 128, (h, w)).astype(np.uint8)


def _images_for(did: int, grid: "np.ndarray"):
    h, w = grid.shape
    if did % 3 == 0:
        rgb = _rgb_channels(grid.astype("int64"))
        img = ("png", encode_png_rgb(rgb), w, h)
    elif did % 3 == 1:
        img = ("dib8", grid,
               _rgb_channels(np.arange(256, dtype=np.int64)))
    else:
        img = ("dib24", _rgb_channels(grid.astype("int64")))
    images = [img]
    if did % 2:
        images.insert(0, ("dib24", np.full((1, 1, 3), 7, np.uint8)))
    return images


@pytest.mark.parametrize("did", [0, 1, 2, 3, 4, 5])
def test_roundtrip_all_profiles(did):
    grid = _grid(9, 64, did)
    w, h, rgb = decode_ico(encode_ico(_images_for(did, grid)))
    assert (w, h) == (64, 9)
    assert np.array_equal(rgb, _rgb_channels(grid.astype("int64")))


def test_largest_entry_wins_not_first():
    big = _grid(8, 8, 1)
    small = _grid(2, 2, 2)
    pal = _rgb_channels(np.arange(256, dtype=np.int64))
    payload = encode_ico([("dib8", small, pal), ("dib8", big, pal)])
    w, h, rgb = decode_ico(payload)
    assert (w, h) == (8, 8)
    assert np.array_equal(rgb, pal[big.astype(np.int64)])


def test_tie_keeps_first_entry():
    a = _grid(4, 4, 3)
    b = _grid(4, 4, 4)
    pal = _rgb_channels(np.arange(256, dtype=np.int64))
    w, h, rgb = decode_ico(encode_ico([("dib8", a, pal),
                                       ("dib8", b, pal)]))
    assert np.array_equal(rgb, pal[a.astype(np.int64)])


def test_zero_dimension_byte_means_256():
    grid = _grid(256, 64, 5)
    payload = encode_ico([("dib8", grid,
                           _rgb_channels(np.arange(256,
                                                   dtype=np.int64)))])
    # the directory height byte must be 0 (256 doesn't fit a u8)
    assert payload[7] == 0
    w, h, _ = decode_ico(payload)
    assert (w, h) == (64, 256)


def test_and_mask_composites_over_white():
    """Handcraft a DIB whose AND mask marks one pixel transparent:
    the decoder must return white there (the PNG-alpha rule), and the
    mask rows are stored bottom-up like the XOR rows."""
    grid = np.zeros((2, 2), dtype=np.uint8)
    pal = _rgb_channels(np.arange(256, dtype=np.int64))
    blob = bytearray(_dib_encode(grid, pal))
    # mask: 2 rows x 4 bytes, bottom-up; set bit for (row 0, col 1)
    mask_off = len(blob) - 8
    blob[mask_off + 4] = 0b01000000  # storage row 1 = display row 0
    w, h, rgb = _decode_dib(bytes(blob))
    expect = pal[np.zeros((2, 2), dtype=np.int64)].copy()
    expect[0, 1] = 255
    assert np.array_equal(rgb, expect)


def test_cur_resource_type_decodes():
    grid = _grid(3, 5, 6)
    payload = encode_ico(
        [("dib24", _rgb_channels(grid.astype("int64")))], cursor=True)
    w, h, rgb = decode_ico(payload)
    assert (w, h) == (5, 3)
    assert np.array_equal(rgb, _rgb_channels(grid.astype("int64")))


def test_error_contract_and_taxonomy():
    grid = _grid(4, 8, 7)
    pal = _rgb_channels(np.arange(256, dtype=np.int64))
    good = encode_ico([("dib8", grid, pal)])
    dib_at = 6 + 16
    cases = [
        (b"XX" + good[2:], "not an ICO", "bad_magic"),
        (good[:4] + struct.pack("<H", 0) + good[6:],
         "not an ICO", "bad_magic"),
        (good[:10], "ICO directory truncated", "truncated"),
        # directory size field runs past the blob
        (good[:14] + struct.pack("<I", 10 ** 6) + good[18:],
         "out of bounds", "header_invalid"),
        # unsupported bit depth in the DIB header
        (good[:dib_at + 14] + struct.pack("<H", 4)
         + good[dib_at + 16:], "unsupported ICO",
         "unsupported_profile"),
        # odd biHeight: cannot split into XOR + AND halves
        (good[:dib_at + 8] + struct.pack("<i", 9)
         + good[dib_at + 12:], "unsupported ICO",
         "unsupported_profile"),
        # directory dims disagree with the decoded DIB
        (good[:6] + bytes([7]) + good[7:], "size mismatch",
         "header_invalid"),
    ]
    for payload, frag, reason in cases:
        with pytest.raises(ValueError, match=frag):
            decode_ico(payload)
        try:
            decode_ico(payload)
        except ValueError as e:
            assert classify_decode_error(str(e)) == reason


def test_truncation_and_mutation_fuzz_valueerror_only():
    for did in (0, 1, 2):
        good = encode_ico(_images_for(did, _grid(5, 16, did)))
        for cut in range(0, len(good), 7):
            try:
                decode_ico(good[:cut])
            except ValueError:
                pass
        rng = np.random.RandomState(did)
        for i in range(0, len(good), 5):
            mut = bytearray(good)
            mut[i] ^= rng.randint(1, 255)
            try:
                decode_ico(bytes(mut))
            except ValueError:
                pass


def test_24bit_dib_with_clr_used_hint_skips_palette():
    """A 24-bit BI_RGB DIB may carry biClrUsed 'optimal palette'
    entries before the pixels; decoding must skip them (before this
    test the palette bytes silently decoded as pixel rows)."""
    rgb = _rgb_channels(_grid(3, 4, 9).astype("int64"))
    blob = bytearray(_dib_encode(rgb, None))
    hint = bytes(range(64))  # 16 BGRA quads
    blob[32:36] = struct.pack("<I", 16)  # biClrUsed = 16
    with_pal = bytes(blob[:40]) + hint + bytes(blob[40:])
    w, h, out = _decode_dib(with_pal)
    assert (w, h) == (4, 3)
    assert np.array_equal(out, rgb)
