"""Baseline TIFF codec (round 17) — pure-python, numpy-vectorized.

TIFF adds a container axis none of the other families has: DUAL BYTE
ORDER. The same logical file is legal little-endian (``II*\\0``) or
big-endian (``MM\\0*``), and every offset, tag, and count re-reads
under that order — including the subtle inline-value rule (a tag whose
value fits in 4 bytes stores it LEFT-JUSTIFIED inside the offset
field, so a big-endian SHORT occupies bytes 0-1, not 2-3). On top sit
the IFD tag walk (12-byte entries, typed counts, out-of-line value
arrays), multi-strip raster reassembly via StripOffsets/StripByteCounts
/RowsPerStrip, PhotometricInterpretation 0/1 (WhiteIsZero inverts),
and the PackBits compressor (Apple RLE: literal / repeat / noop
packets). Written from the public TIFF 6.0 specification (Adobe,
1992). The reference repo (monkeytechdays/mktd6-flink) contains no
image handling; this supports the multimodal ingest family
(SURVEY.md LLM-pipeline ops), not a port.

Supported profile: 8-bit single-sample grayscale, Compression 1
(none) or 32773 (PackBits), photometric 0/1, either byte order, any
strip layout. Everything else raises ValueError with a message inside
multimodal._REASON_PATTERNS' public attrition taxonomy.
"""

from __future__ import annotations

import struct

import numpy as np

_TYPE_SIZE = {1: 1, 3: 2, 4: 4}  # BYTE, SHORT, LONG

_W, _H, _BITS, _COMP, _PHOTO = 256, 257, 258, 259, 262
_SOFF, _SPP, _RPS, _SCNT = 273, 277, 278, 279


def packbits_encode(data: bytes) -> bytes:
    """PackBits-compress one strip: runs of >= 3 identical bytes as
    repeat packets (257 - n, byte), everything else as literal
    packets (n - 1, bytes) — max 128 per packet."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while (i + run < n and run < 128
               and data[i + run] == data[i]):
            run += 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        j = i
        while j < n and j - i < 128:
            r = 1
            while j + r < n and r < 3 and data[j + r] == data[j]:
                r += 1
            if r >= 3:
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


def packbits_decode(data: bytes, expect: int) -> bytes:
    """Expand a PackBits stream to exactly ``expect`` bytes."""
    out = bytearray()
    pos = 0
    n = len(data)
    while len(out) < expect:
        if pos >= n:
            raise ValueError("PackBits stream truncated")
        b = data[pos]
        pos += 1
        if b < 128:  # literal: b+1 bytes
            if pos + b + 1 > n:
                raise ValueError("PackBits stream truncated")
            out += data[pos:pos + b + 1]
            pos += b + 1
        elif b == 128:  # noop
            continue
        else:  # repeat next byte 257-b times
            if pos >= n:
                raise ValueError("PackBits stream truncated")
            out += bytes([data[pos]]) * (257 - b)
            pos += 1
    if len(out) != expect:
        raise ValueError("PackBits run beyond strip")
    return bytes(out)


def encode_tiff_gray(grid: "np.ndarray", big_endian: bool = False,
                     packbits: bool = False,
                     rows_per_strip: int | None = None,
                     white_is_zero: bool = False) -> bytes:
    """Encode an [h, w] uint8 grayscale raster as a baseline TIFF:
    strips of ``rows_per_strip`` rows (all rows when None), PackBits
    per strip when asked, photometric 0 (stored bytes inverted) when
    ``white_is_zero`` — in either byte order."""
    grid = np.asarray(grid, dtype=np.uint8)
    if grid.ndim != 2 or grid.size == 0:
        raise ValueError("expected [h, w] raster")
    h, w = grid.shape
    e = ">" if big_endian else "<"
    stored = (255 - grid) if white_is_zero else grid
    rps = h if rows_per_strip is None else max(1, rows_per_strip)
    strips = []
    for top in range(0, h, rps):
        raw = stored[top:top + rps].tobytes()
        strips.append(packbits_encode(raw) if packbits else raw)
    # layout: 8-byte header | strip data | [offset arrays] | IFD
    pos = 8
    offs = []
    for s in strips:
        offs.append(pos)
        pos += len(s)
    ns = len(strips)

    def arr_field(vals):
        nonlocal pos
        if ns == 1:
            return vals[0], b""
        blob = b"".join(struct.pack(e + "I", v) for v in vals)
        at = pos
        pos += len(blob)
        return at, blob

    soff_val, soff_blob = arr_field(offs)
    scnt_val, scnt_blob = arr_field([len(s) for s in strips])
    ifd_at = pos

    def entry(tag, typ, count, value):
        # inline values are LEFT-justified in the 4-byte field
        if typ == 3 and count == 1:
            packed = struct.pack(e + "H", value) + b"\x00\x00"
        else:
            packed = struct.pack(e + "I", value)
        return struct.pack(e + "HHI", tag, typ, count) + packed

    entries = [
        entry(_W, 4, 1, w),
        entry(_H, 4, 1, h),
        entry(_BITS, 3, 1, 8),
        entry(_COMP, 3, 1, 32773 if packbits else 1),
        entry(_PHOTO, 3, 1, 0 if white_is_zero else 1),
        entry(_SOFF, 4, ns, soff_val),
        entry(_SPP, 3, 1, 1),
        entry(_RPS, 4, 1, rps),
        entry(_SCNT, 4, ns, scnt_val),
    ]
    out = bytearray()
    out += (b"MM\x00\x2a" if big_endian else b"II\x2a\x00")
    out += struct.pack(e + "I", ifd_at)
    for s in strips:
        out += s
    out += soff_blob + scnt_blob
    out += struct.pack(e + "H", len(entries))
    for en in entries:
        out += en
    out += struct.pack(e + "I", 0)  # no next IFD
    return bytes(out)


def _read_values(payload: bytes, e: str, typ: int, count: int,
                 field: bytes) -> list[int]:
    size = _TYPE_SIZE[typ]
    total = size * count
    if total <= 4:
        raw = field[:total]  # inline, left-justified
    else:
        at, = struct.unpack(e + "I", field)
        if at + total > len(payload):
            raise ValueError("TIFF value array truncated")
        raw = payload[at:at + total]
    fmt = {1: "B", 3: "H", 4: "I"}[typ]
    return list(struct.unpack(e + str(count) + fmt, raw))


def decode_tiff_gray(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """Decode a baseline grayscale TIFF; returns (width, height,
    raster uint8 [h, w], black-is-zero regardless of the stored
    photometric). Raises ValueError outside the supported profile,
    on truncation, or on a corrupt PackBits stream — messages inside
    the public attrition taxonomy."""
    if payload[:4] not in (b"II\x2a\x00", b"MM\x00\x2a"):
        raise ValueError("not a TIFF payload")
    e = "<" if payload[:2] == b"II" else ">"
    if len(payload) < 8:
        raise ValueError("TIFF header truncated")
    ifd_at, = struct.unpack(e + "I", payload[4:8])
    if ifd_at + 2 > len(payload):
        raise ValueError("TIFF IFD truncated")
    n_ent, = struct.unpack(e + "H", payload[ifd_at:ifd_at + 2])
    if ifd_at + 2 + 12 * n_ent + 4 > len(payload):
        raise ValueError("TIFF IFD truncated")
    tags: dict[int, tuple[int, int, bytes]] = {}
    for i in range(n_ent):
        at = ifd_at + 2 + 12 * i
        tag, typ, count = struct.unpack(e + "HHI",
                                        payload[at:at + 8])
        tags[tag] = (typ, count, payload[at + 8:at + 12])

    def one(tag, default=None):
        if tag not in tags:
            if default is not None:
                return default
            raise ValueError("TIFF required tag missing")
        typ, count, field = tags[tag]
        if typ not in _TYPE_SIZE:
            raise ValueError("unsupported TIFF tag type")
        vals = _read_values(payload, e, typ, count, field)
        if count != 1:
            raise ValueError("TIFF required tag missing")
        return vals[0]

    def many(tag):
        if tag not in tags:
            raise ValueError("TIFF required tag missing")
        typ, count, field = tags[tag]
        if typ not in _TYPE_SIZE:
            raise ValueError("unsupported TIFF tag type")
        return _read_values(payload, e, typ, count, field)

    w = one(_W)
    h = one(_H)
    if w == 0 or h == 0 or w * h > (1 << 26):
        raise ValueError("invalid dimensions")
    if one(_BITS, default=1) != 8:
        raise ValueError("unsupported TIFF bit depth")
    if one(_SPP, default=1) != 1:
        raise ValueError("unsupported TIFF sample count")
    comp = one(_COMP, default=1)
    if comp not in (1, 32773):
        raise ValueError("unsupported TIFF compression")
    photo = one(_PHOTO)
    if photo not in (0, 1):
        raise ValueError("unsupported TIFF photometric")
    rps = one(_RPS, default=h)
    if rps == 0:
        raise ValueError("invalid dimensions")
    offs = many(_SOFF)
    cnts = many(_SCNT)
    expect_strips = -(-h // rps)
    if len(offs) != expect_strips or len(cnts) != len(offs):
        raise ValueError("TIFF strip layout invalid")
    raster = np.empty((h, w), dtype=np.uint8)
    for i, (at, cnt) in enumerate(zip(offs, cnts)):
        rows = min(rps, h - i * rps)
        if at + cnt > len(payload):
            raise ValueError("TIFF strip truncated")
        raw = payload[at:at + cnt]
        if comp == 32773:
            raw = packbits_decode(raw, rows * w)
        elif len(raw) < rows * w:
            raise ValueError("TIFF strip truncated")
        raster[i * rps:i * rps + rows] = np.frombuffer(
            raw[:rows * w], dtype=np.uint8).reshape(rows, w)
    if photo == 0:  # WhiteIsZero: normalize to black-is-zero
        raster = 255 - raster
    return w, h, raster
