"""PNG (RFC 2083 / ISO 15948) grayscale codec in stdlib zlib + numpy.

PNG is LOSSLESS, so unlike the JPEG path nothing restricts the corpus:
any 8-bit grayscale raster round-trips bit-exactly, and a DuckDB
oracle can reproduce decoded features from the raster's source text.

Decoder scope: color types 0 (grayscale) and 2 (truecolor RGB — round
14; real PNGs are overwhelmingly truecolor), bit depth 8, compression
0, filter method 0 with ALL FIVE per-scanline filter types
reconstructed (None/Sub/Up/Average/Paeth — §6 of the spec; the
left/upper-left taps step by the pixel's BYTE width, 1 or 3), no
interlacing. Chunk CRCs are verified (zlib.crc32); everything outside
the profile raises ValueError so multimodal callers keep the
drop-per-row contract.

The encoders (used by the corpus builder) emit filter-0 scanlines; the
decoder's filter reconstructions are exercised by an independent
encoder in tests/test_png.py that deliberately writes Sub/Up/Average/
Paeth-filtered scanlines in both color types.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data)))


def encode_png_gray(raster: "np.ndarray") -> bytes:
    """Encode an [h, w] uint8 raster as an 8-bit grayscale PNG
    (filter 0 scanlines — the decoder handles the rest)."""
    raster = np.asarray(raster, dtype=np.uint8)
    h, w = raster.shape
    if h == 0 or w == 0:
        raise ValueError("empty raster")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    lines = b"".join(b"\x00" + raster[y].tobytes() for y in range(h))
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(lines))
            + _chunk(b"IEND", b""))


def encode_png_rgb(raster: "np.ndarray") -> bytes:
    """Encode an [h, w, 3] uint8 raster as an 8-bit truecolor PNG
    (color type 2, filter 0 scanlines)."""
    raster = np.asarray(raster, dtype=np.uint8)
    if raster.ndim != 3 or raster.shape[2] != 3:
        raise ValueError("expected [h, w, 3] raster")
    h, w, _ = raster.shape
    if h == 0 or w == 0:
        raise ValueError("empty raster")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    lines = b"".join(b"\x00" + raster[y].tobytes() for y in range(h))
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(lines))
            + _chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _decode_png(payload: bytes, want_ctype: int,
                bpp: int) -> tuple[int, int, np.ndarray]:
    """Shared chunk walk + inflate + filter reconstruction. Returns
    (w, h, reconstructed scanline bytes [h, w*bpp]). The filter taps
    step by ``bpp`` — the pixel's byte width per RFC 2083 §6.2 — so
    one loop serves grayscale (1) and truecolor (3)."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG payload")
    pos, n = 8, len(payload)
    ihdr, idat, ended = None, bytearray(), False
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
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            ended = True
            break
        # ancillary chunks are skipped
    if ihdr is None or not idat or not ended:
        raise ValueError("missing IHDR/IDAT/IEND")
    w, h, depth, ctype_, comp, filt, interlace = ihdr
    if (depth, comp, filt, interlace) != (8, 0, 0, 0):
        raise ValueError("unsupported PNG profile "
                         "(want 8-bit depth, no interlace)")
    if ctype_ != want_ctype:
        raise ValueError(f"unsupported PNG color type {ctype_} "
                         f"(want {want_ctype})")
    if w == 0 or h == 0 or w * h * bpp > (1 << 26):
        raise ValueError("invalid dimensions")
    stride = w * bpp
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
    return w, h, out


def decode_png_gray(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode an 8-bit grayscale PNG; returns (width, height, raster
    uint8 [h, w]). Raises ValueError on anything outside the
    supported profile, truncated/corrupt chunks, or CRC mismatch."""
    w, h, out = _decode_png(payload, want_ctype=0, bpp=1)
    return w, h, out


def decode_png_rgb(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode an 8-bit truecolor PNG (color type 2); returns (width,
    height, raster uint8 [h, w, 3]). Same ValueError contract as the
    grayscale path."""
    w, h, out = _decode_png(payload, want_ctype=2, bpp=3)
    return w, h, out.reshape(h, w, 3)
