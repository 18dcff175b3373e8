"""Cross-validate the grayscale PNG decoder against an independent
filtered encoder written from the spec in this file: it deliberately
emits Sub/Up/Average/Paeth-filtered scanlines, which the production
encoder (filter 0 only) never produces — agreement on random rasters
requires decode-side filter reconstruction to be exactly RFC-correct.
PNG is lossless, so every comparison is bit-exact equality."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from mktd6_flink_spark.functions.png import (decode_png_gray,
                                             encode_png_gray)


def _chunk(ctype, data):
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data)))


def _paeth_ref(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_filtered(raster, filter_of_row):
    """Independent encoder: per-row filter chosen by the caller."""
    h, w = raster.shape
    r = raster.astype(int)
    lines = bytearray()
    for y in range(h):
        f = filter_of_row(y)
        lines.append(f)
        for x in range(w):
            left = r[y][x - 1] if x else 0
            up = r[y - 1][x] if y else 0
            ul = r[y - 1][x - 1] if (x and y) else 0
            if f == 0:
                v = r[y][x]
            elif f == 1:
                v = r[y][x] - left
            elif f == 2:
                v = r[y][x] - up
            elif f == 3:
                v = r[y][x] - ((left + up) >> 1)
            else:
                v = r[y][x] - _paeth_ref(left, up, ul)
            lines.append(v & 0xFF)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(lines)))
            + _chunk(b"IEND", b""))


@pytest.mark.parametrize("policy", [
    lambda y: 0, lambda y: 1, lambda y: 2, lambda y: 3, lambda y: 4,
    lambda y: y % 5])
def test_all_filter_types_reconstruct_exactly(policy):
    rng = np.random.RandomState(31)
    raster = rng.randint(0, 256, (13, 37), dtype=np.uint8)
    w, h, got = decode_png_gray(encode_filtered(raster, policy))
    assert (w, h) == (37, 13)
    assert (got == raster).all()


def test_production_encoder_roundtrip():
    rng = np.random.RandomState(5)
    raster = rng.randint(0, 256, (64, 64), dtype=np.uint8)
    w, h, got = decode_png_gray(encode_png_gray(raster))
    assert (w, h) == (64, 64) and (got == raster).all()


def test_ancillary_chunks_are_skipped():
    raster = np.arange(16, dtype=np.uint8).reshape(4, 4)
    p = encode_png_gray(raster)
    # splice a tEXt chunk between IHDR and IDAT
    ihdr_end = 8 + 12 + 13
    spliced = (p[:ihdr_end] + _chunk(b"tEXt", b"comment\x00hi")
               + p[ihdr_end:])
    _w, _h, got = decode_png_gray(spliced)
    assert (got == raster).all()


def test_decoder_rejects_malformed():
    raster = np.zeros((4, 4), dtype=np.uint8)
    good = encode_png_gray(raster)
    # corrupt one IDAT byte -> CRC mismatch
    idat_at = good.find(b"IDAT")
    corrupt = bytearray(good)
    corrupt[idat_at + 5] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png_gray(bytes(corrupt))
    # color type 2 (truecolor)
    bad_ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    bad = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", bad_ihdr)
           + _chunk(b"IDAT", zlib.compress(b"\x00" * 52))
           + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="unsupported"):
        decode_png_gray(bad)
    # interlace METHOD 2 does not exist (Adam7 = 1 is now supported)
    il_ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 2)
    il = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", il_ihdr)
          + _chunk(b"IDAT", zlib.compress(b"\x00" * 20))
          + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="unsupported"):
        decode_png_gray(il)
    # an Adam7 stream with the WRONG total scanline byte count
    il_ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1)
    il = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", il_ihdr)
          + _chunk(b"IDAT", zlib.compress(b"\x00" * 20))
          + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="scanline length"):
        decode_png_gray(il)
    for payload in (b"", b"\x89PNG", good[:30], b"NOPE" * 10,
                    good[:-12]):  # missing IEND
        with pytest.raises(ValueError):
            decode_png_gray(payload)


def test_short_ihdr_with_valid_crc_raises_valueerror():
    """A short IHDR whose CRC is self-consistent must raise ValueError
    (struct.error would escape the decoders' per-row drop contract)."""
    short = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", b"\x00" * 9)
             + _chunk(b"IDAT", zlib.compress(b"\x00"))
             + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="IHDR"):
        decode_png_gray(short)


# ------------------------------------------------- truecolor RGB (r14)

def encode_filtered_rgb(raster, filter_of_row):
    """Independent truecolor encoder: per-row filter chosen by the
    caller; filter taps step by 3 bytes (the RGB pixel width) —
    computed from the [h, w, 3] raster directly, not via the
    decoder's stride logic."""
    h, w, _ = raster.shape
    flat = raster.astype(int).reshape(h, w * 3)
    lines = bytearray()
    for y in range(h):
        f = filter_of_row(y)
        lines.append(f)
        for x in range(w * 3):
            left = flat[y][x - 3] if x >= 3 else 0
            up = flat[y - 1][x] if y else 0
            ul = flat[y - 1][x - 3] if (x >= 3 and y) else 0
            if f == 0:
                v = flat[y][x]
            elif f == 1:
                v = flat[y][x] - left
            elif f == 2:
                v = flat[y][x] - up
            elif f == 3:
                v = flat[y][x] - ((left + up) >> 1)
            else:
                v = flat[y][x] - _paeth_ref(left, up, ul)
            lines.append(v & 0xFF)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(lines)))
            + _chunk(b"IEND", b""))


@pytest.mark.parametrize("policy", [
    lambda y: 0, lambda y: 1, lambda y: 2, lambda y: 3, lambda y: 4,
    lambda y: (y * 7) % 5])
def test_rgb_all_filter_types_reconstruct_exactly(policy):
    from mktd6_flink_spark.functions.png import decode_png_rgb

    rng = np.random.RandomState(43)
    raster = rng.randint(0, 256, (11, 17, 3), dtype=np.uint8)
    w, h, got = decode_png_rgb(encode_filtered_rgb(raster, policy))
    assert (w, h) == (17, 11)
    assert (got == raster).all()


def test_rgb_production_encoder_roundtrip():
    from mktd6_flink_spark.functions.png import (decode_png_rgb,
                                                 encode_png_rgb)

    rng = np.random.RandomState(47)
    raster = rng.randint(0, 256, (32, 24, 3), dtype=np.uint8)
    w, h, got = decode_png_rgb(encode_png_rgb(raster))
    assert (w, h) == (24, 32) and (got == raster).all()


def test_rgb_rejects_cross_type_and_malformed():
    from mktd6_flink_spark.functions.png import (decode_png_rgb,
                                                 encode_png_rgb)

    gray = encode_png_gray(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(ValueError, match="color type"):
        decode_png_rgb(gray)
    rgb = encode_png_rgb(np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="color type"):
        decode_png_gray(rgb)
    idat_at = rgb.find(b"IDAT")
    corrupt = bytearray(rgb)
    corrupt[idat_at + 5] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png_rgb(bytes(corrupt))
    for payload in (b"", rgb[:30], rgb[:-12]):
        with pytest.raises(ValueError):
            decode_png_rgb(payload)


# --------------------------------------- palette + Adam7 interlace (r15)

_ADAM7_REF = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def encode_filtered_adam7(r3, ctype, filter_of, palette=None):
    """Independent Adam7 encoder written straight from RFC 2083 §2.6:
    seven pass sub-images, each independently filtered with the filter
    chosen per (pass, row) by the caller. Shares NO geometry or filter
    code with the production module."""
    h, w, bpp = r3.shape
    lines = bytearray()
    for pi, (x0, y0, dx, dy) in enumerate(_ADAM7_REF):
        sub = r3[y0::dy, x0::dx, :]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        flat = sub.astype(int).reshape(ph, pw * bpp)
        for y in range(ph):
            f = filter_of(pi, y)
            lines.append(f)
            for x in range(pw * bpp):
                left = flat[y][x - bpp] if x >= bpp else 0
                up = flat[y - 1][x] if y else 0
                ul = flat[y - 1][x - bpp] if (x >= bpp and y) else 0
                if f == 0:
                    v = flat[y][x]
                elif f == 1:
                    v = flat[y][x] - left
                elif f == 2:
                    v = flat[y][x] - up
                elif f == 3:
                    v = flat[y][x] - ((left + up) >> 1)
                else:
                    v = flat[y][x] - _paeth_ref(left, up, ul)
                lines.append(v & 0xFF)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    return (out + _chunk(b"IDAT", zlib.compress(bytes(lines)))
            + _chunk(b"IEND", b""))


@pytest.mark.parametrize("shape", [(13, 37), (8, 8), (3, 5), (1, 1),
                                   (2, 9), (16, 4)])
def test_adam7_gray_filtered_reconstructs_exactly(shape):
    """Every pass filtered with a rotating filter type, across shapes
    that exercise empty passes (w or h below the pass origin)."""
    rng = np.random.RandomState(59)
    raster = rng.randint(0, 256, shape, dtype=np.uint8)
    p = encode_filtered_adam7(raster.reshape(*shape, 1), 0,
                              lambda pi, y: (pi + y) % 5)
    w, h, got = decode_png_gray(p)
    assert (w, h) == (shape[1], shape[0])
    assert (got == raster).all()


@pytest.mark.parametrize("shape", [(11, 17), (7, 3), (1, 9)])
def test_adam7_rgb_filtered_reconstructs_exactly(shape):
    from mktd6_flink_spark.functions.png import decode_png_rgb

    rng = np.random.RandomState(61)
    raster = rng.randint(0, 256, (*shape, 3), dtype=np.uint8)
    p = encode_filtered_adam7(raster, 2, lambda pi, y: (2 * pi + y) % 5)
    w, h, got = decode_png_rgb(p)
    assert (w, h) == (shape[1], shape[0])
    assert (got == raster).all()


def test_adam7_production_encoders_roundtrip():
    from mktd6_flink_spark.functions.png import (decode_png_rgb,
                                                 encode_png_rgb)

    rng = np.random.RandomState(67)
    g = rng.randint(0, 256, (21, 13), dtype=np.uint8)
    assert (decode_png_gray(encode_png_gray(g, interlace=True))[2]
            == g).all()
    c = rng.randint(0, 256, (10, 26, 3), dtype=np.uint8)
    assert (decode_png_rgb(encode_png_rgb(c, interlace=True))[2]
            == c).all()
    # interlaced and plain decode to the SAME raster (losslessness of
    # the pass scatter)
    assert (decode_png_rgb(encode_png_rgb(c, interlace=True))[2]
            == decode_png_rgb(encode_png_rgb(c))[2]).all()


def test_palette_roundtrip_plain_and_interlaced():
    from mktd6_flink_spark.functions.png import (decode_png_palette,
                                                 encode_png_palette)

    rng = np.random.RandomState(71)
    pal = rng.randint(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.randint(0, 256, (9, 14), dtype=np.uint8)
    want = pal[idx]
    for interlace in (False, True):
        w, h, got = decode_png_palette(
            encode_png_palette(idx, pal, interlace=interlace))
        assert (w, h) == (14, 9)
        assert (got == want).all()


def test_palette_filtered_adam7_independent_encoder():
    from mktd6_flink_spark.functions.png import decode_png_palette

    rng = np.random.RandomState(73)
    pal = rng.randint(0, 256, (64, 3), dtype=np.uint8)
    idx = rng.randint(0, 64, (12, 7), dtype=np.uint8)
    p = encode_filtered_adam7(idx.reshape(12, 7, 1), 3,
                              lambda pi, y: (pi * 3 + y) % 5,
                              palette=pal)
    _w, _h, got = decode_png_palette(p)
    assert (got == pal[idx]).all()


def test_palette_error_contract():
    from mktd6_flink_spark.functions.png import (decode_png_palette,
                                                 encode_png_palette)

    pal = np.arange(48, dtype=np.uint8).reshape(16, 3)
    idx = np.zeros((4, 4), dtype=np.uint8)
    good = encode_png_palette(idx, pal)
    # wrong color type in both directions
    with pytest.raises(ValueError, match="color type"):
        decode_png_gray(good)
    with pytest.raises(ValueError, match="color type"):
        decode_png_palette(encode_png_gray(idx))
    # PLTE chunk missing entirely
    plte_at = good.find(b"PLTE") - 4
    plte_len = 12 + 48
    no_plte = good[:plte_at] + good[plte_at + plte_len:]
    with pytest.raises(ValueError, match="PLTE"):
        decode_png_palette(no_plte)
    # index beyond the palette (index 15 valid, shrink palette to 8)
    idx2 = np.full((4, 4), 15, dtype=np.uint8)
    shrunk = encode_png_palette(idx2, pal)  # valid at build time
    # rebuild with an 8-entry PLTE but the same index raster
    body = pal[:8].tobytes()
    rebuilt = (shrunk[:plte_at] + _chunk(b"PLTE", body)
               + shrunk[plte_at + plte_len:])
    with pytest.raises(ValueError, match="beyond PLTE"):
        decode_png_palette(rebuilt)
    # PLTE with a non-multiple-of-3 length
    rebuilt = (shrunk[:plte_at] + _chunk(b"PLTE", b"\x00" * 4)
               + shrunk[plte_at + plte_len:])
    with pytest.raises(ValueError, match="PLTE length"):
        decode_png_palette(rebuilt)
    # encoder refuses an index beyond its palette
    with pytest.raises(ValueError, match="beyond palette"):
        encode_png_palette(np.full((2, 2), 16, dtype=np.uint8), pal)


def test_palette_fuzz_valueerror_only():
    """Truncations / bit flips over a palette+Adam7 payload must stay
    inside the ValueError drop-per-row contract."""
    from mktd6_flink_spark.functions.png import (decode_png_palette,
                                                 encode_png_palette)

    rng = np.random.RandomState(79)
    pal = rng.randint(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.randint(0, 256, (6, 11), dtype=np.uint8)
    good = encode_png_palette(idx, pal, interlace=True)
    for cut in range(0, len(good), 7):
        try:
            decode_png_palette(good[:cut])
        except ValueError:
            pass
    for i in range(0, len(good), 5):
        mut = bytearray(good)
        mut[i] ^= 0x40
        try:
            decode_png_palette(bytes(mut))
        except ValueError:
            pass


# ------------------------------------------ sub-byte depths (r15)

def _pack_bits_ref(row, depth):
    """Independent MSB-first packer (bit arithmetic, no numpy
    packbits): depth-bit samples into bytes, zero pad."""
    acc, nbits, out = 0, 0, bytearray()
    for v in row:
        acc = (acc << depth) | int(v)
        nbits += depth
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def encode_filtered_subbyte(raster, depth, ctype, filter_of,
                            palette=None, interlace=False):
    """Independent sub-byte encoder: pack each scanline FIRST, then
    filter the packed BYTES with 1-byte taps (RFC 2083 §2.3/§6.2) —
    plain or Adam7 (each pass packs and filters independently)."""
    h, w = raster.shape
    r = raster.astype(int)

    def filtered_lines(rows, tag):
        lines = bytearray()
        prev = [0] * len(rows[0]) if rows else []
        for y, packed in enumerate(rows):
            f = filter_of(tag, y)
            lines.append(f)
            cur = list(packed)
            for x in range(len(cur)):
                left = cur[x - 1] if x else 0
                up = prev[x] if y else 0
                ul = prev[x - 1] if (x and y) else 0
                if f == 0:
                    v = cur[x]
                elif f == 1:
                    v = cur[x] - left
                elif f == 2:
                    v = cur[x] - up
                elif f == 3:
                    v = cur[x] - ((left + up) >> 1)
                else:
                    v = cur[x] - _paeth_ref(left, up, ul)
                lines.append(v & 0xFF)
            prev = cur
        return lines

    lines = bytearray()
    if not interlace:
        rows = [_pack_bits_ref(r[y], depth) for y in range(h)]
        lines += filtered_lines(rows, 0)
    else:
        for pi, (x0, y0, dx, dy) in enumerate(_ADAM7_REF):
            sub = r[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            rows = [_pack_bits_ref(sub[y], depth)
                    for y in range(sub.shape[0])]
            lines += filtered_lines(rows, pi)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0,
                       int(interlace))
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    return (out + _chunk(b"IDAT", zlib.compress(bytes(lines)))
            + _chunk(b"IEND", b""))


@pytest.mark.parametrize("depth", [1, 2, 4])
@pytest.mark.parametrize("interlace", [False, True])
def test_subbyte_gray_filtered_reconstructs_exactly(depth, interlace):
    """Sub-byte gray across filters and both interlace methods, with
    widths that leave pad bits in the scanline; decoded samples scale
    by the exact 255/(2^d - 1) factor."""
    rng = np.random.RandomState(89 + depth)
    raster = rng.randint(0, 1 << depth, (11, 13)).astype(np.uint8)
    p = encode_filtered_subbyte(raster, depth, 0,
                                lambda tag, y: (tag + y) % 5,
                                interlace=interlace)
    w, h, got = decode_png_gray(p)
    assert (w, h) == (13, 11)
    assert (got == raster.astype(int) * (255 // ((1 << depth) - 1))).all()


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_palette_filtered_adam7(depth):
    from mktd6_flink_spark.functions.png import decode_png_palette

    rng = np.random.RandomState(97)
    pal = rng.randint(0, 256, (1 << depth, 3), dtype=np.uint8)
    idx = rng.randint(0, 1 << depth, (9, 7)).astype(np.uint8)
    p = encode_filtered_subbyte(idx, depth, 3,
                                lambda tag, y: (2 * tag + y) % 5,
                                palette=pal, interlace=True)
    _w, _h, got = decode_png_palette(p)
    assert (got == pal[idx]).all()


def test_subbyte_production_encoders_roundtrip():
    from mktd6_flink_spark.functions.png import (decode_png_palette,
                                                 encode_png_palette)

    rng = np.random.RandomState(101)
    for depth in (1, 2, 4):
        g = rng.randint(0, 1 << depth, (6, 19)).astype(np.uint8)
        w, h, got = decode_png_gray(
            encode_png_gray(g, interlace=True, depth=depth))
        assert (got == g.astype(int) * (255 // ((1 << depth) - 1))).all()
        pal = rng.randint(0, 256, (1 << depth, 3), dtype=np.uint8)
        _w, _h, got = decode_png_palette(
            encode_png_palette(g, pal, interlace=True, depth=depth))
        assert (got == pal[g]).all()


def test_subbyte_error_contract():
    from mktd6_flink_spark.functions.png import (decode_png_rgb,
                                                 encode_png_gray)

    # depth 3 is not a PNG depth; depth 16 is legal for gray since
    # round 16, so a 4-bit payload relabeled 16 now dies later as a
    # scanline-length mismatch (still a ValueError row-drop)
    g = np.zeros((4, 4), dtype=np.uint8)
    good = encode_png_gray(g, depth=4)
    ihdr_data = bytearray(good[16:29])
    for bad_depth, msg in ((3, "bit depth"), (16, "scanline length")):
        d = bytearray(ihdr_data)
        d[8] = bad_depth
        crc = zlib.crc32(b"IHDR" + bytes(d)).to_bytes(4, "big")
        p = good[:16] + bytes(d) + crc + good[33:]
        with pytest.raises(ValueError, match=msg):
            decode_png_gray(p)
    # depth 16 stays ILLEGAL for palette files (RFC 2083 §4.1.1)
    from mktd6_flink_spark.functions.png import (decode_png_palette,
                                                 encode_png_palette)
    pal = np.zeros((16, 3), dtype=np.uint8)
    pgood = encode_png_palette(g, pal, depth=4)
    pd = bytearray(pgood[16:29])
    pd[8] = 16
    crc = zlib.crc32(b"IHDR" + bytes(pd)).to_bytes(4, "big")
    p = pgood[:16] + bytes(pd) + crc + pgood[33:]
    with pytest.raises(ValueError, match="bit depth"):
        decode_png_palette(p)
    rgb4 = struct.pack(">IIBBBBB", 4, 4, 4, 2, 0, 0, 0)
    p = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", rgb4)
         + _chunk(b"IDAT", zlib.compress(b"\x00" * 28))
         + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="bit depth"):
        decode_png_rgb(p)
    # encoder guards
    with pytest.raises(ValueError, match="beyond bit depth"):
        encode_png_gray(np.full((2, 2), 4, dtype=np.uint8), depth=2)
    # 4-bit payload fuzz stays ValueError-only
    from mktd6_flink_spark.functions.png import decode_png_gray as dg
    for i in range(0, len(good), 5):
        mut = bytearray(good)
        mut[i] ^= 0x10
        try:
            dg(bytes(mut))
        except ValueError:
            pass


# ------------------------------- alpha + 16-bit profiles (round 16)

def encode_filtered_any(raster, ctype, depth, filter_of_row):
    """Independent non-interlaced encoder for ANY whole-byte profile
    (gray/rgb/gray+alpha/rgba at depth 8 or 16): filtering operates on
    the packed BYTES with the pixel's byte width as the tap step (RFC
    2083 §6.2) — 16-bit samples are serialized big-endian FIRST, so
    the filter taps straddle the two bytes of a sample exactly as the
    spec demands. Shares no code with the production module."""
    h, w = raster.shape[:2]
    nch = 1 if raster.ndim == 2 else raster.shape[2]
    r = raster.reshape(h, w, nch)
    if depth == 16:
        flat = np.frombuffer(r.astype(">u2").tobytes(),
                             np.uint8).reshape(h, w * nch * 2).astype(int)
        bpp = nch * 2
    else:
        flat = r.astype(int).reshape(h, w * nch)
        bpp = nch
    lines = bytearray()
    for y in range(h):
        f = filter_of_row(y)
        lines.append(f)
        for x in range(flat.shape[1]):
            left = flat[y][x - bpp] if x >= bpp else 0
            up = flat[y - 1][x] if y else 0
            ul = flat[y - 1][x - bpp] if (x >= bpp and y) else 0
            if f == 0:
                v = flat[y][x]
            elif f == 1:
                v = flat[y][x] - left
            elif f == 2:
                v = flat[y][x] - up
            elif f == 3:
                v = flat[y][x] - ((left + up) >> 1)
            else:
                v = flat[y][x] - _paeth_ref(left, up, ul)
            lines.append(v & 0xFF)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(lines)))
            + _chunk(b"IEND", b""))


_POLICIES = [lambda y: 0, lambda y: 1, lambda y: 2, lambda y: 3,
             lambda y: 4, lambda y: (y * 7) % 5]


@pytest.mark.parametrize("policy", _POLICIES)
@pytest.mark.parametrize("ctype,nch", [(4, 2), (6, 4)])
def test_alpha_profiles_all_filter_types_depth8(ctype, nch, policy):
    from mktd6_flink_spark.functions.png import (decode_png_gray_alpha,
                                                 decode_png_rgba)

    decode = decode_png_gray_alpha if ctype == 4 else decode_png_rgba
    rng = np.random.RandomState(41 + ctype)
    raster = rng.randint(0, 256, (11, 7, nch), dtype=np.uint8)
    w, h, got = decode(encode_filtered_any(raster, ctype, 8, policy))
    assert (w, h) == (7, 11)
    assert (got == raster).all()


@pytest.mark.parametrize("policy", _POLICIES)
@pytest.mark.parametrize("ctype,nch", [(0, 1), (2, 3), (4, 2), (6, 4)])
def test_16bit_profiles_all_filter_types(ctype, nch, policy):
    """Depth-16 filtering straddles sample bytes (bpp = 2*nch); the
    decoder must reconstruct then strip to the high byte."""
    from mktd6_flink_spark.functions import png as P

    decode = {0: P.decode_png_gray, 2: P.decode_png_rgb,
              4: P.decode_png_gray_alpha, 6: P.decode_png_rgba}[ctype]
    rng = np.random.RandomState(61 + ctype)
    shape = (9, 6) if nch == 1 else (9, 6, nch)
    raster = rng.randint(0, 65536, shape, dtype=np.uint16)
    w, h, got = decode(encode_filtered_any(raster, ctype, 16, policy))
    assert (got == (raster >> 8).astype(np.uint8)).all()


@pytest.mark.parametrize("ctype,nch,depth", [(4, 2, 8), (6, 4, 8),
                                             (0, 1, 16), (6, 4, 16)])
def test_adam7_alpha_and_16bit_production_roundtrip(ctype, nch, depth):
    """Production encoder, interlaced, new profiles: every Adam7 pass
    packs its scanlines independently at the wider pixel widths."""
    from mktd6_flink_spark.functions import png as P

    rng = np.random.RandomState(77 + ctype + depth)
    hi = 65536 if depth == 16 else 256
    dt = np.uint16 if depth == 16 else np.uint8
    shape = (13, 5) if nch == 1 else (13, 5, nch)
    raster = rng.randint(0, hi, shape, dtype=dt)
    enc = {(0): P.encode_png_gray, (2): P.encode_png_rgb,
           (4): P.encode_png_gray_alpha, (6): P.encode_png_rgba}[ctype]
    dec = {0: P.decode_png_gray, 2: P.decode_png_rgb,
           4: P.decode_png_gray_alpha, 6: P.decode_png_rgba}[ctype]
    payload = enc(raster, interlace=True, depth=depth)
    w, h, got = dec(payload)
    want = (raster >> 8).astype(np.uint8) if depth == 16 else raster
    assert (got == want).all()


def test_alpha_16bit_fuzz_valueerror_only():
    """Truncations and bit flips over RGBA-8 and RGBA-16 payloads
    must stay inside the ValueError drop-per-row contract."""
    from mktd6_flink_spark.functions.png import (decode_png_rgba,
                                                 encode_png_rgba)

    rng = np.random.RandomState(83)
    for depth in (8, 16):
        hi = 65536 if depth == 16 else 256
        dt = np.uint16 if depth == 16 else np.uint8
        raster = rng.randint(0, hi, (6, 9, 4), dtype=dt)
        good = encode_png_rgba(raster, depth=depth)
        for cut in range(0, len(good), 7):
            try:
                decode_png_rgba(good[:cut])
            except ValueError:
                pass
        for i in range(0, len(good), 5):
            mut = bytearray(good)
            mut[i] ^= 0x55
            try:
                decode_png_rgba(bytes(mut))
            except ValueError:
                pass


def test_cross_type_alpha_rejection_messages():
    """The want-ctype mismatch message is part of the attrition
    taxonomy: every pairwise mismatch must say 'color type'."""
    from mktd6_flink_spark.functions import png as P

    g = np.zeros((2, 2), dtype=np.uint8)
    payloads = {0: P.encode_png_gray(g),
                2: P.encode_png_rgb(np.zeros((2, 2, 3), np.uint8)),
                4: P.encode_png_gray_alpha(np.zeros((2, 2, 2), np.uint8)),
                6: P.encode_png_rgba(np.zeros((2, 2, 4), np.uint8))}
    decoders = {0: P.decode_png_gray, 2: P.decode_png_rgb,
                4: P.decode_png_gray_alpha, 6: P.decode_png_rgba}
    for have, payload in payloads.items():
        for want, dec in decoders.items():
            if have == want:
                continue
            with pytest.raises(ValueError, match="color type"):
                dec(payload)
