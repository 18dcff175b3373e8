"""PNG (RFC 2083 / ISO 15948) codec in stdlib zlib + numpy.

PNG is LOSSLESS, so unlike the JPEG path nothing restricts the corpus:
any 8-bit raster round-trips bit-exactly, and a DuckDB oracle can
reproduce decoded features from the raster's source text.

Decoder scope: color types 0 (grayscale), 2 (truecolor RGB — round
14) and 3 (palette-indexed via PLTE — round 15; icons/screenshots and
older web images are a large slice of real crawls), bit depths
1/2/4/8 for gray and palette (icons are typically 4-bit or less;
sub-byte samples unpack MSB-first per §2.3, gray scales by the exact
255/(2^d - 1) factor) and 8 for truecolor, compression 0, filter
method 0 with ALL FIVE per-scanline filter types
reconstructed (None/Sub/Up/Average/Paeth — §6 of the spec; the
left/upper-left taps step by the pixel's BYTE width, 1 or 3), and BOTH
interlace methods (0 = none, 1 = Adam7 — round 15: each of the seven
passes is an independently-filtered sub-image scattered back on the
8x8 grid per §2.6). Chunk CRCs are verified (zlib.crc32); everything
outside the profile raises ValueError so multimodal callers keep the
drop-per-row contract.

The encoders (used by the corpus builder) emit filter-0 scanlines in
either interlace method; the decoder's filter reconstructions are
exercised by an independent encoder in tests/test_png.py that
deliberately writes Sub/Up/Average/Paeth-filtered scanlines in all
color types, interlaced and not.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# Legal bit depths per color type (RFC 2083 §4.1.1). Color types:
# 0 gray, 2 truecolor, 3 palette, 4 gray+alpha, 6 truecolor+alpha.
_CTYPE_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                 4: (8, 16), 6: (8, 16)}
# channel count per color type
_CTYPE_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass grid (RFC 2083 §2.6): (x start, y start, x step, y step).
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _adam7_dims(w: int, h: int) -> list[tuple[int, int]]:
    """(pass width, pass height) for each of the seven passes; a pass
    can be empty on small images (it then contributes NO scanlines,
    not even empty ones — §2.6)."""
    return [((w - x0 + dx - 1) // dx if w > x0 else 0,
             (h - y0 + dy - 1) // dy if h > y0 else 0)
            for x0, y0, dx, dy in _ADAM7]


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data)))


def _pack_row(row: "np.ndarray", depth: int) -> bytes:
    """One scanline of samples -> packed bytes: depth-bit values
    MSB-first within each byte (RFC 2083 §2.3), zero-padded to the
    byte boundary. depth 8 is the identity; depth 16 emits each
    sample as two bytes, most significant first (§2.1)."""
    flat = row.ravel()
    if depth == 8:
        return flat.astype(np.uint8).tobytes()
    if depth == 16:
        return flat.astype(">u2").tobytes()
    shifts = np.arange(depth - 1, -1, -1)
    bits = ((flat[:, None] >> shifts) & 1).astype(np.uint8).ravel()
    return np.packbits(bits).tobytes()


def _scanlines(r3: "np.ndarray", interlace: bool,
               depth: int = 8) -> bytes:
    """Serialize an [h, w, channels] raster as filter-0 scanlines, in
    Adam7 pass order when ``interlace`` (each pass an independent
    sub-image; empty passes emit nothing). Sub-byte depths pack each
    scanline independently (pass scanlines never share bytes)."""
    if not interlace:
        return b"".join(b"\x00" + _pack_row(r3[y], depth)
                        for y in range(r3.shape[0]))
    parts = []
    for x0, y0, dx, dy in _ADAM7:
        sub = r3[y0::dy, x0::dx, :]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        for y in range(sub.shape[0]):
            parts.append(b"\x00" + _pack_row(sub[y], depth))
    return b"".join(parts)


def encode_png_gray(raster: "np.ndarray", interlace: bool = False,
                    depth: int = 8) -> bytes:
    """Encode an [h, w] raster as a grayscale PNG (filter 0
    scanlines — the decoder handles the rest). ``depth`` in
    {1, 2, 4, 8, 16}: sub-byte rasters must hold values < 2**depth;
    depth 16 takes uint16 samples."""
    raster = np.asarray(raster,
                        dtype=np.uint16 if depth == 16 else np.uint8)
    h, w = raster.shape
    if h == 0 or w == 0:
        raise ValueError("empty raster")
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError("unsupported bit depth")
    if depth < 8 and int(raster.max(initial=0)) >= (1 << depth):
        raise ValueError("sample beyond bit depth")
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, int(interlace))
    lines = _scanlines(raster.reshape(h, w, 1), interlace, depth)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(lines))
            + _chunk(b"IEND", b""))


def encode_png_rgb(raster: "np.ndarray", interlace: bool = False,
                   depth: int = 8) -> bytes:
    """Encode an [h, w, 3] raster as a truecolor PNG (color type 2,
    depth 8 or 16, filter 0 scanlines)."""
    return _encode_multichannel(raster, 2, 3, interlace, depth)


def _encode_multichannel(raster: "np.ndarray", ctype: int,
                         nch: int, interlace: bool,
                         depth: int) -> bytes:
    """Shared encoder body for the whole-byte multi-channel color
    types (2/4/6): [h, w, nch] raster, depth 8 (uint8) or 16
    (uint16), filter-0 scanlines."""
    if depth not in (8, 16):
        raise ValueError("unsupported bit depth")
    raster = np.asarray(raster,
                        dtype=np.uint16 if depth == 16 else np.uint8)
    if raster.ndim != 3 or raster.shape[2] != nch:
        raise ValueError(f"expected [h, w, {nch}] raster")
    h, w, _ = raster.shape
    if h == 0 or w == 0:
        raise ValueError("empty raster")
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0,
                       int(interlace))
    lines = _scanlines(raster, interlace, depth)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(lines))
            + _chunk(b"IEND", b""))


def encode_png_gray_alpha(raster: "np.ndarray", interlace: bool = False,
                          depth: int = 8) -> bytes:
    """Encode an [h, w, 2] (gray, alpha) raster as a color-type-4 PNG
    (depth 8 or 16, filter 0 scanlines)."""
    return _encode_multichannel(raster, 4, 2, interlace, depth)


def encode_png_rgba(raster: "np.ndarray", interlace: bool = False,
                    depth: int = 8) -> bytes:
    """Encode an [h, w, 4] RGBA raster as a color-type-6 PNG (depth 8
    or 16, filter 0 scanlines; alpha stored straight per the spec)."""
    return _encode_multichannel(raster, 6, 4, interlace, depth)


def encode_png_palette(idx: "np.ndarray", palette: "np.ndarray",
                       interlace: bool = False,
                       depth: int = 8,
                       trns: "np.ndarray | None" = None) -> bytes:
    """Encode an [h, w] uint8 INDEX raster as a palette PNG (color
    type 3): ``palette`` is [n, 3] uint8 RGB entries emitted as the
    PLTE chunk; every index must be < n and < 2**depth (``depth`` in
    {1, 2, 4, 8} — icons are typically 4-bit or less). ``trns``
    optionally emits per-entry alpha as a tRNS chunk (length <= n;
    entries beyond it are opaque per §4.2.1.1)."""
    idx = np.asarray(idx, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    if h == 0 or w == 0:
        raise ValueError("empty raster")
    if depth not in (1, 2, 4, 8):
        raise ValueError("unsupported bit depth")
    if (palette.ndim != 2 or palette.shape[1] != 3
            or not 1 <= palette.shape[0] <= 256):
        raise ValueError("palette must be [1..256, 3]")
    if int(idx.max(initial=0)) >= min(palette.shape[0], 1 << depth):
        raise ValueError("index beyond palette")
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, int(interlace))
    lines = _scanlines(idx.reshape(h, w, 1), interlace, depth)
    out = (_SIG + _chunk(b"IHDR", ihdr)
           + _chunk(b"PLTE", palette.tobytes()))
    if trns is not None:
        trns = np.asarray(trns, dtype=np.uint8)
        if trns.ndim != 1 or not 1 <= trns.size <= palette.shape[0]:
            raise ValueError("trns must be [1..palette] alphas")
        out += _chunk(b"tRNS", trns.tobytes())
    return (out + _chunk(b"IDAT", zlib.compress(lines))
            + _chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reconstruct ``h`` scanlines of ``stride`` bytes each from the
    filtered stream (filter byte + line, per line). The left and
    upper-left taps step by ``bpp`` — the pixel's byte width per RFC
    2083 §6.2 — so one loop serves grayscale/palette (1) and
    truecolor (3)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        row = raw[y * (stride + 1):(y + 1) * (stride + 1)]
        f, line = row[0], np.frombuffer(row[1:], dtype=np.uint8)
        if f == 0:
            cur = line.astype(np.int64)
        elif f == 2:  # Up
            cur = (line.astype(np.int64) + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth: sequential left
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                if f == 1:
                    v = line[x] + left
                elif f == 3:
                    v = line[x] + ((left + int(prev[x])) >> 1)
                else:
                    ul = int(prev[x - bpp]) if x >= bpp else 0
                    v = line[x] + _paeth(left, int(prev[x]), ul)
                cur[x] = v & 0xFF
        else:
            raise ValueError(f"unknown filter type {f}")
        out[y] = cur
        prev = cur
    return out


def _decode_png(payload: bytes, want_ctype: int,
                channels: int) -> tuple[int, int, np.ndarray,
                                        bytes | None, int]:
    """Shared chunk walk + inflate + filter reconstruction + sample
    unpacking. Returns (w, h, samples [h, w*channels] — palette
    indices or raw gray samples at the file's depth, NOT yet scaled —
    PLTE bytes or None, bit depth). Handles both interlace methods
    (Adam7 passes are independently-filtered sub-images scattered
    back on the 8x8 grid) and bit depths 1/2/4/8 for gray/palette
    (8 only for truecolor, per RFC 2083 §2.3): filtering always
    operates on the packed BYTES (the left tap steps by the pixel
    byte width, min 1), then each scanline's samples unpack
    MSB-first."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG payload")
    pos, n = 8, len(payload)
    ihdr, idat, plte, trns, ended = None, bytearray(), None, None, False
    while pos + 8 <= n:
        clen = int.from_bytes(payload[pos:pos + 4], "big")
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + clen]
        if len(data) != clen or pos + 12 + clen > n:
            raise ValueError("truncated chunk")
        crc = int.from_bytes(payload[pos + 8 + clen:pos + 12 + clen],
                             "big")
        if zlib.crc32(ctype + data) != crc:
            raise ValueError("chunk CRC mismatch")
        pos += 12 + clen
        if ctype == b"IHDR":
            if len(data) != 13:
                # a short IHDR with a self-consistent CRC would raise
                # struct.error, which is NOT ValueError and would
                # escape the per-row drop contract
                raise ValueError("IHDR length mismatch")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            if len(data) % 3 or not 3 <= len(data) <= 768:
                raise ValueError("PLTE length invalid")
            plte = bytes(data)
        elif ctype == b"tRNS" and want_ctype == 3:
            # palette transparency (ancillary, consumed only by the
            # palette-RGBA decoder; entries beyond its length are
            # opaque per §4.2.1.1). For other color types tRNS keys a
            # single transparent color — outside the feature domain,
            # skipped like every other ancillary chunk.
            if len(data) > 256:
                raise ValueError("tRNS length invalid")
            trns = bytes(data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            ended = True
            break
        # ancillary chunks are skipped
    if ihdr is None or not idat or not ended:
        raise ValueError("missing IHDR/IDAT/IEND")
    w, h, depth, ctype_, comp, filt, interlace = ihdr
    if (comp, filt) != (0, 0) or interlace not in (0, 1):
        raise ValueError("unsupported PNG profile (methods 0)")
    if ctype_ != want_ctype:
        raise ValueError(f"unsupported PNG color type {ctype_} "
                         f"(want {want_ctype})")
    # legal depths per color type (RFC 2083 §4.1.1): sub-byte packing
    # exists only for single-sample pixels (gray / palette indices);
    # multi-channel pixels and 16-bit samples are whole-byte
    if depth not in _CTYPE_DEPTHS[want_ctype]:
        raise ValueError(f"unsupported PNG bit depth {depth}")
    if w == 0 or h == 0 or w * h * channels > (1 << 26):
        raise ValueError("invalid dimensions")
    bpp = max(1, depth * channels // 8)

    def stride_of(pw: int) -> int:
        return -(-pw * depth * channels // 8)

    stride = stride_of(w)
    if interlace:
        dims = _adam7_dims(w, h)
        expected = sum(ph * (stride_of(pw) + 1)
                       for pw, ph in dims if pw and ph)
    else:
        expected = h * (stride + 1)
    try:
        # bounded inflate: a decompression bomb (small IDAT inflating
        # to GBs) must become a ValueError row-drop, not a MemoryError
        # stage-kill — so never materialize more than expected+1 bytes
        dec = zlib.decompressobj()
        raw = dec.decompress(bytes(idat), expected + 1)
    except zlib.error as exc:
        raise ValueError(f"IDAT inflate failed: {exc}") from None
    if len(raw) != expected or dec.unconsumed_tail:
        raise ValueError("scanline length mismatch")
    # the stream must also END here (no pending inflate output)
    if dec.decompress(b"", 1) or not dec.eof:
        raise ValueError("IDAT stream longer than the scanlines")
    def to_samples(rows: np.ndarray, pw: int) -> np.ndarray:
        """Unfiltered scanline bytes [n, stride_of(pw)] -> samples
        [n, pw*channels] (MSB-first within each byte; trailing pad
        bits discarded per scanline; 16-bit samples are big-endian
        byte pairs -> uint16)."""
        if depth == 8:
            return rows[:, :pw * channels]
        if depth == 16:
            m = pw * channels
            return ((rows[:, 0:2 * m:2].astype(np.uint16) << 8)
                    | rows[:, 1:2 * m:2])
        bits = np.unpackbits(rows, axis=1)[:, :pw * depth]
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.int64)
        return (bits.reshape(rows.shape[0], pw, depth)
                * weights).sum(axis=2).astype(np.uint8)

    if not interlace:
        samples = to_samples(_unfilter(raw, h, stride, bpp), w)
        return w, h, samples, plte, depth, trns
    out3 = np.zeros((h, w, channels),
                    dtype=np.uint16 if depth == 16 else np.uint8)
    at = 0
    for (x0, y0, dx, dy), (pw, ph) in zip(_ADAM7, dims):
        if pw == 0 or ph == 0:
            continue
        seg = ph * (stride_of(pw) + 1)
        sub = to_samples(
            _unfilter(raw[at:at + seg], ph, stride_of(pw), bpp), pw)
        at += seg
        out3[y0::dy, x0::dx, :] = sub.reshape(ph, pw, channels)
    return w, h, out3.reshape(h, w * channels), plte, depth, trns


def _to_u8(out: np.ndarray, depth: int) -> np.ndarray:
    """Normalize decoded samples to the 8-bit domain: sub-byte samples
    scale up by the exact RFC factor 255 / (2**depth - 1) (an integer
    for every legal depth); 16-bit samples STRIP TO THE HIGH BYTE
    (v >> 8) — libpng's default 16->8 reduction, and the exact inverse
    of the v * 257 widening our corpus and the WAV16 twin use."""
    if depth < 8:
        return (out.astype(np.int64)
                * (255 // ((1 << depth) - 1))).astype(np.uint8)
    if depth == 16:
        return (out >> 8).astype(np.uint8)
    return out


def decode_png_gray(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a grayscale PNG (bit depth 1/2/4/8/16); returns (width,
    height, raster uint8 [h, w]) in the 8-bit domain (see _to_u8 for
    the sub-byte scale-up and the 16-bit high-byte strip). Raises
    ValueError on anything outside the supported profile,
    truncated/corrupt chunks, or CRC mismatch."""
    w, h, out, _, depth, _t = _decode_png(payload, want_ctype=0,
                                          channels=1)
    return w, h, _to_u8(out, depth)


def decode_png_rgb(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a truecolor PNG (color type 2, depth 8/16); returns
    (width, height, raster uint8 [h, w, 3]). Same ValueError contract
    as the grayscale path."""
    w, h, out, _, depth, _t = _decode_png(payload, want_ctype=2,
                                          channels=3)
    return w, h, _to_u8(out, depth).reshape(h, w, 3)


def decode_png_gray_alpha(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a grayscale+alpha PNG (color type 4, depth 8/16);
    returns (width, height, raster uint8 [h, w, 2]) with channel 0 the
    gray sample and channel 1 the alpha, both in the 8-bit domain.
    Compositing is the CALLER's policy (see
    multimodal.composite_over_white for the engine's documented rule);
    the decoder returns the channels as stored."""
    w, h, out, _, depth, _t = _decode_png(payload, want_ctype=4,
                                          channels=2)
    return w, h, _to_u8(out, depth).reshape(h, w, 2)


def decode_png_rgba(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a truecolor+alpha PNG (color type 6, depth 8/16 — the
    dominant modern-web profile); returns (width, height, raster uint8
    [h, w, 4], RGBA). Alpha is returned as stored (straight, not
    premultiplied — PNG never premultiplies); compositing is the
    caller's policy."""
    w, h, out, _, depth, _t = _decode_png(payload, want_ctype=6,
                                          channels=4)
    return w, h, _to_u8(out, depth).reshape(h, w, 4)


def decode_png_palette(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a palette PNG (color type 3, bit depth 1/2/4/8):
    indices are mapped through the PLTE chunk to RGB (indices are
    never scaled — depth only changes the packing); returns (width,
    height, raster uint8 [h, w, 3]). A missing PLTE or an index
    beyond the palette is a ValueError row-drop like every other
    malformation."""
    w, h, idx, plte, _depth, _t = _decode_png(payload, want_ctype=3,
                                              channels=1)
    if plte is None:
        raise ValueError("palette PNG without PLTE")
    pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    if int(idx.max(initial=0)) >= pal.shape[0]:
        raise ValueError("palette index beyond PLTE")
    return w, h, pal[idx.reshape(h, w)]


def decode_png_palette_rgba(payload: bytes) -> tuple[int, int,
                                                     np.ndarray]:
    """Decode a palette PNG WITH its tRNS transparency (round 16 —
    the classic transparent-icon profile): indices map through PLTE
    to RGB and through tRNS to alpha (entries beyond the tRNS length
    are opaque 255 per §4.2.1.1; a file with no tRNS decodes fully
    opaque); returns (width, height, raster uint8 [h, w, 4] RGBA) —
    the same output contract as decode_png_rgba, so downstream
    compositing is shared."""
    w, h, idx, plte, _depth, trns = _decode_png(payload, want_ctype=3,
                                                channels=1)
    if plte is None:
        raise ValueError("palette PNG without PLTE")
    pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    if int(idx.max(initial=0)) >= pal.shape[0]:
        raise ValueError("palette index beyond PLTE")
    alpha = np.full(pal.shape[0], 255, dtype=np.uint8)
    if trns is not None:
        if len(trns) > pal.shape[0]:
            raise ValueError("tRNS longer than the palette")
        alpha[:len(trns)] = np.frombuffer(trns, dtype=np.uint8)
    pal4 = np.concatenate([pal, alpha[:, None]], axis=1)
    return w, h, pal4[idx.reshape(h, w)]
