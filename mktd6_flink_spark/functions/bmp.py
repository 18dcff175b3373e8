"""Windows BMP / DIB codec (round 17) — pure-python, numpy-vectorized.

A genuinely distinct container family from PNG/GIF/JPEG: no signature
chunking, no entropy coder — a fixed little-endian header pair
(BITMAPFILEHEADER + BITMAPINFOHEADER), an optional BGRA palette, and
raster rows stored BOTTOM-UP with 4-byte stride padding (top-down when
biHeight is negative), optionally RLE8-compressed (BI_RLE8: encoded
runs, absolute mode with word padding, end-of-line / end-of-bitmap /
delta escapes). Written from the public Windows GDI / MS-WMF
BITMAPINFOHEADER documentation. The reference repo
(monkeytechdays/mktd6-flink) contains no image handling; this supports
the multimodal ingest family (SURVEY.md LLM-pipeline ops), not a port.

Supported profile: biSize=40 (BITMAPINFOHEADER), biBitCount 8
(palettized, BI_RGB or BI_RLE8) and 24 (BGR, BI_RGB), bottom-up and
top-down rows. Everything else raises ValueError with a message inside
multimodal._REASON_PATTERNS' public attrition taxonomy.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HDR = 14
_INFO_HDR = 40


def _headers(width: int, height: int, bits: int, compression: int,
             n_pal: int, image_size: int, topdown: bool) -> bytes:
    off = _FILE_HDR + _INFO_HDR + 4 * n_pal
    info = struct.pack(
        "<IiiHHIIiiII", _INFO_HDR, width,
        -height if topdown else height, 1, bits, compression,
        image_size, 2835, 2835, n_pal, 0)
    return (b"BM" + struct.pack("<IHHI", off + image_size, 0, 0, off)
            + info)


def encode_bmp_rgb24(rgb: "np.ndarray", topdown: bool = False) -> bytes:
    """Encode an [h, w, 3] uint8 RGB raster as a 24-bit BI_RGB BMP
    (BGR byte order, rows padded to 4 bytes, bottom-up unless
    ``topdown``)."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.size == 0:
        raise ValueError("expected [h, w, 3] raster")
    h, w, _ = rgb.shape
    stride = (3 * w + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :3 * w] = rgb[:, :, ::-1].reshape(h, 3 * w)  # BGR
    if not topdown:
        rows = rows[::-1]
    body = rows.tobytes()
    return _headers(w, h, 24, 0, 0, len(body), topdown) + body


def _pal_bgra(palette: "np.ndarray") -> bytes:
    pal = np.asarray(palette, dtype=np.uint8)
    if pal.shape != (256, 3):
        raise ValueError("encoder needs a full 256-entry palette")
    quad = np.zeros((256, 4), dtype=np.uint8)
    quad[:, :3] = pal[:, ::-1]  # BGR0
    return quad.tobytes()


def encode_bmp_pal8(idx: "np.ndarray", palette: "np.ndarray",
                    topdown: bool = False) -> bytes:
    """Encode an [h, w] uint8 index raster + 256-entry RGB palette as
    an 8-bit BI_RGB BMP."""
    idx = np.asarray(idx, dtype=np.uint8)
    if idx.ndim != 2 or idx.size == 0:
        raise ValueError("expected [h, w] index raster")
    h, w = idx.shape
    stride = (w + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w] = idx
    if not topdown:
        rows = rows[::-1]
    body = rows.tobytes()
    return (_headers(w, h, 8, 0, 256, len(body), topdown)
            + _pal_bgra(palette) + body)


def _rle8_row(row: "np.ndarray") -> bytearray:
    """RLE8-encode one row: repeated pixels as encoded-mode (count,
    value) packets, singleton stretches of >= 3 as absolute mode
    (00, count, bytes..., word-padded) — so the decoder's absolute
    path is exercised by real corpora, not only unit tests."""
    out = bytearray()
    # run-length split
    n = row.shape[0]
    edges = np.flatnonzero(np.diff(row)) + 1
    starts = np.concatenate(([0], edges))
    ends = np.concatenate((edges, [n]))
    runs = [(int(e - s), int(row[s])) for s, e in zip(starts, ends)]
    i = 0
    while i < len(runs):
        if runs[i][0] == 1:
            j = i
            while j < len(runs) and runs[j][0] == 1:
                j += 1
            if j - i >= 3:  # absolute mode (min legal count is 3)
                vals = [v for _, v in runs[i:j]]
                for k in range(0, len(vals), 255):
                    chunk = vals[k:k + 255]
                    if len(chunk) < 3:  # tail too short for absolute
                        for v in chunk:
                            out += bytes((1, v))
                        break
                    out += bytes((0, len(chunk)))
                    out += bytes(chunk)
                    if len(chunk) % 2:
                        out.append(0)  # word padding
                i = j
                continue
        cnt, v = runs[i]
        while cnt > 255:
            out += bytes((255, v))
            cnt -= 255
        if cnt:
            out += bytes((cnt, v))
        i += 1
    out += b"\x00\x00"  # end of line
    return out


def encode_bmp_rle8(idx: "np.ndarray",
                    palette: "np.ndarray") -> bytes:
    """Encode an [h, w] uint8 index raster as an 8-bit BI_RLE8 BMP
    (bottom-up only — the spec forbids top-down RLE bitmaps)."""
    idx = np.asarray(idx, dtype=np.uint8)
    if idx.ndim != 2 or idx.size == 0:
        raise ValueError("expected [h, w] index raster")
    h, w = idx.shape
    body = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        body += _rle8_row(idx[r])
    body[-2:] = b"\x00\x01"  # last EOL becomes end-of-bitmap
    return (_headers(w, h, 8, 1, 256, len(body), False)
            + _pal_bgra(palette) + bytes(body))


def _decode_rle8(data: bytes, w: int, h: int) -> "np.ndarray":
    """BI_RLE8 decode to a TOP-ROW-FIRST [h, w] index raster (the
    stream's bottom-up storage order is unflipped here via the
    out[h-1-y] write — the caller gets display order). Pixels never
    written (delta skips, early end-of-bitmap) stay index 0 — the
    documented Windows behavior is 'undefined'; zero is the
    deterministic choice and matches the background convention of the
    GIF compositor."""
    out = np.zeros((h, w), dtype=np.uint8)
    x = 0
    y = 0  # storage rows, bottom-up: y counts from the bottom row
    pos = 0
    n = len(data)
    while True:
        if pos + 2 > n:
            raise ValueError("BMP RLE stream truncated")
        b0, b1 = data[pos], data[pos + 1]
        pos += 2
        if b0 > 0:  # encoded mode
            if y >= h or x + b0 > w:
                raise ValueError("BMP RLE run beyond row")
            out[h - 1 - y, x:x + b0] = b1
            x += b0
            continue
        if b1 == 0:  # end of line
            x = 0
            y += 1
            if y > h:
                raise ValueError("BMP RLE run beyond row")
            continue
        if b1 == 1:  # end of bitmap
            return out
        if b1 == 2:  # delta: move cursor right/up
            if pos + 2 > n:
                raise ValueError("BMP RLE stream truncated")
            x += data[pos]
            y += data[pos + 1]
            pos += 2
            if y >= h or x > w:
                raise ValueError("BMP RLE run beyond row")
            continue
        # absolute mode: b1 literal bytes, word-padded
        cnt = b1
        pad = cnt % 2
        if pos + cnt + pad > n:
            raise ValueError("BMP RLE stream truncated")
        if y >= h or x + cnt > w:
            raise ValueError("BMP RLE run beyond row")
        out[h - 1 - y, x:x + cnt] = np.frombuffer(
            data[pos:pos + cnt], dtype=np.uint8)
        x += cnt
        pos += cnt + pad


def decode_bmp(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """Decode a BMP payload; returns (width, height, raster uint8
    [h, w, 3] RGB, top row first regardless of storage order). Raises
    ValueError on anything outside the supported profile (biSize 40,
    8-bit BI_RGB/BI_RLE8, 24-bit BI_RGB), truncation, or a corrupt
    RLE stream — messages inside the public attrition taxonomy."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    if len(payload) < _FILE_HDR + _INFO_HDR:
        raise ValueError("BMP header truncated")
    off_bits, = struct.unpack_from("<I", payload, 10)
    (info_size, bi_w, bi_h, planes, bits, compression, _img_size,
     _xp, _yp, clr_used, _clr_imp) = struct.unpack_from(
        "<IiiHHIIiiII", payload, _FILE_HDR)
    if info_size != _INFO_HDR:
        raise ValueError("unsupported BMP header version")
    if planes != 1:
        raise ValueError("unsupported BMP plane count")
    if bits not in (8, 24):
        raise ValueError("unsupported BMP bit depth")
    topdown = bi_h < 0
    w, h = bi_w, abs(bi_h)
    if w <= 0 or h == 0 or w * h > (1 << 26):
        raise ValueError("invalid dimensions")
    if compression == 1:
        if bits != 8:
            raise ValueError("unsupported BMP compression")
        if topdown:
            raise ValueError("unsupported BMP top-down RLE")
    elif compression != 0:
        raise ValueError("unsupported BMP compression")
    pos = _FILE_HDR + _INFO_HDR
    pal = None
    if bits == 8:
        m = clr_used or 256
        if not 0 < m <= 256:
            raise ValueError("BMP palette size invalid")
        if pos + 4 * m > len(payload):
            raise ValueError("BMP palette truncated")
        quad = np.frombuffer(payload[pos:pos + 4 * m],
                             dtype=np.uint8).reshape(m, 4)
        pal = quad[:, 2::-1].copy()  # BGR0 -> RGB
        pos += 4 * m
    if off_bits < pos or off_bits > len(payload):
        raise ValueError("BMP pixel data truncated")
    data = payload[off_bits:]
    if bits == 24:
        stride = (3 * w + 3) & ~3
        if len(data) < stride * h:
            raise ValueError("BMP pixel data truncated")
        rows = np.frombuffer(data[:stride * h],
                             dtype=np.uint8).reshape(h, stride)
        rgb = rows[:, :3 * w].reshape(h, w, 3)[:, :, ::-1]
        return w, h, (rgb if topdown else rgb[::-1]).copy()
    if compression == 1:
        idx = _decode_rle8(data, w, h)  # already top-row-first
    else:
        stride = (w + 3) & ~3
        if len(data) < stride * h:
            raise ValueError("BMP pixel data truncated")
        rows = np.frombuffer(data[:stride * h],
                             dtype=np.uint8).reshape(h, stride)
        idx = rows[:, :w]
        if not topdown:
            idx = idx[::-1]
    if int(idx.max(initial=0)) >= pal.shape[0]:
        raise ValueError("BMP index beyond palette")
    return w, h, pal[idx.astype(np.int64)]


def decode_bmp_rgb(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """Alias with the shared (w, h, [h, w, 3]) feature-extractor
    contract (decode_gif_rgb / decode_png_rgb parity)."""
    return decode_bmp(payload)
