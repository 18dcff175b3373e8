"""GIF (GIF87a/GIF89a) codec in pure Python + numpy.

GIFs remain a real slice of web crawls (icons, small animations'
first frames, legacy charts). Decoder scope: both version magics, a
logical screen with a GLOBAL color table (1..256 entries), optional
local color table on the image descriptor (takes precedence per the
spec), every extension block skipped by the sub-block grammar except
the Graphic Control Extension (transparency index honored; disposal
methods 0-3 in the composited walker), BOTH row orders (sequential
and the 4-pass GIF interlace), and the full variable-width LZW
decompression (clear/end codes, dictionary growth to 4096, width
bumps at powers of two). Everything outside the profile raises
ValueError so multimodal callers keep the drop-per-row contract.

THREE walkers share the block grammar deliberately, each tuned to a
different cost shape: ``decode_gif`` (single frame, stops at the
first image block), ``decode_gif_frames`` (full-rect animation,
SPARSE LZW skip for unsampled frames — the 1/k path), and
``decode_gif_frames_composited`` (partial-rect/disposal delta
animation, every frame's LZW must run). The header/GCT parse, GCE
parse, image-descriptor/LCT parse, and interlace de-interleave are
intentionally repeated in all three rather than threaded through a
shared generator whose yield protocol each caller would partially
ignore — but that means A GRAMMAR FIX MUST BE APPLIED TO ALL THREE
WALKERS; tests/test_gif.py exercises each walker against the same
corpora so a one-sided edit fails there.

The encoder (corpus builder) emits REAL LZW (greedy longest-match
dictionary, the reference GIF algorithm); an independent
clear-code-per-symbol encoder lives in tests/test_gif.py so the
decoder's dictionary growth is cross-validated against a stream no
production path produces.

References: GIF89a specification (CompuServe, 1990); Welch, "A
Technique for High-Performance Data Compression", IEEE Computer 1984.
The reference repo has no GIF path; this extends the engine's
multimodal layer (SURVEY.md §2 'beyond the reference' mandate) next
to the JPEG/PNG/WAV codecs.
"""

from __future__ import annotations

import struct

import numpy as np

_TRAILER = 0x3B
_IMAGE_SEP = 0x2C
_EXTENSION = 0x21
_GCE_LABEL = 0xF9

# GIF interlace passes: (row start, row step)
_ILACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _sub_blocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a sub-block chain (len byte + payload, 0 ends)."""
    out = bytearray()
    n = len(buf)
    while True:
        if pos >= n:
            raise ValueError("GIF sub-block chain truncated")
        ln = buf[pos]
        pos += 1
        if ln == 0:
            return bytes(out), pos
        if pos + ln > n:
            raise ValueError("GIF sub-block chain truncated")
        out.extend(buf[pos:pos + ln])
        pos += ln


def _lzw_decode(data: bytes, min_code: int, n_pixels: int) -> np.ndarray:
    """Variable-width LZW (GIF flavor): little-endian bit packing,
    clear code resets the dictionary, width bumps AFTER the dictionary
    reaches the current width's capacity, hard 4096-entry ceiling.
    Decodes exactly ``n_pixels`` indices (trailing entropy beyond the
    pixel count is legal padding and ignored, matching real encoders
    that only guarantee the pixel run)."""
    if not 2 <= min_code <= 11:
        raise ValueError("bad LZW minimum code size")
    clear = 1 << min_code
    end = clear + 1
    # bit reader state
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)

    # Table entries are ``bytes`` when every symbol fits in one byte
    # (min_code <= 8 — every real GIF, since the color table caps at
    # 256): appends and output writes are then C-level memcpys per
    # CODE instead of Python-int work per PIXEL (~10x on this loop).
    # Symbols >= 256 (min_code 9-11, tolerated for robustness) keep
    # the tuple spelling. Control flow, error messages and the width
    # bump are identical in both lanes.
    wide = min_code > 8
    if wide:
        base = [(i,) for i in range(clear)] + [(), ()]
        out: list[int] = []
    else:
        base = [bytes((i,)) for i in range(clear)] + [b"", b""]
        out = bytearray()
    table = list(base)
    width = min_code + 1
    prev = None

    while len(out) < n_pixels:
        while nbits < width:
            if pos >= n:
                raise ValueError("LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("LZW code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out.extend(entry)
        prev = entry
        # width bump: the NEXT code is wider once the table fills the
        # current width (capped at 12 bits)
        if len(table) >= (1 << width) and width < 12:
            width += 1
    if len(out) < n_pixels:
        raise ValueError("LZW stream truncated")
    if wide:
        return np.asarray(out[:n_pixels], dtype=np.int64)
    return np.frombuffer(bytes(out[:n_pixels]),
                         dtype=np.uint8).astype(np.int64)


def _lzw_encode(indices: np.ndarray, min_code: int) -> bytes:
    """Reference greedy-longest-match GIF LZW encoder (Welch 1984):
    starts with a clear code, emits clear + reset when the table hits
    4096, ends with the end code. Used by the corpus builder — the
    independent per-symbol encoder lives in the tests."""
    clear = 1 << min_code
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    # The dictionary is keyed by (prefix_code, symbol) rather than the
    # sequence tuple itself: every table sequence's prefix is in the
    # table (LZW invariant), so the pair key names the same sequence
    # with O(1) hashing instead of an O(run-length) tuple build per
    # symbol. Emission order, width bumps and the 4096 reset are
    # identical to the sequence-keyed spelling; the independent
    # per-symbol encoder in the tests pins the byte stream.
    table: dict[tuple[int, int], int] = {}
    next_code = end + 1
    width = min_code + 1
    put(clear, width)
    cur = -1  # current run's table code; -1 = empty run
    for v in indices.tolist():
        v = int(v)
        if cur < 0:
            cur = v
            continue
        nxt = table.get((cur, v))
        if nxt is not None:
            cur = nxt
            continue
        put(cur, width)
        if next_code < 4096:
            table[(cur, v)] = next_code
            if next_code >= (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            put(clear, width)
            table = {}
            next_code = end + 1
            width = min_code + 1
        cur = v
    if cur >= 0:
        put(cur, width)
    put(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(idx: "np.ndarray", palette: "np.ndarray",
               interlace: bool = False,
               transparent: int | None = None) -> bytes:
    """Encode an [h, w] uint8 INDEX raster as a single-frame GIF89a:
    ``palette`` is [n, 3] uint8 RGB entries padded to the next power
    of two as the global color table; real LZW entropy coding;
    optional GIF 4-pass interlace; optional Graphic Control Extension
    declaring ``transparent`` as the transparent index."""
    idx = np.asarray(idx, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    if h == 0 or w == 0:
        raise ValueError("empty raster")
    if (palette.ndim != 2 or palette.shape[1] != 3
            or not 2 <= palette.shape[0] <= 256):
        raise ValueError("palette must be [2..256, 3]")
    if int(idx.max(initial=0)) >= palette.shape[0]:
        raise ValueError("index beyond palette")
    # GCT size field: 2^(k+1) entries
    k = max(1, (palette.shape[0] - 1).bit_length()) - 1
    gct = np.zeros(((1 << (k + 1)), 3), dtype=np.uint8)
    gct[:palette.shape[0]] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (k << 4) | k, 0, 0)
    out += gct.tobytes()
    if transparent is not None:
        out += bytes([_EXTENSION, _GCE_LABEL, 4, 0x01, 0, 0,
                      int(transparent), 0])
    out += bytes([_IMAGE_SEP]) + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    if interlace:
        rows = [r for start, step in _ILACE
                for r in range(start, h, step)]
        seq = idx[rows].ravel()
    else:
        seq = idx.ravel()
    min_code = max(2, k + 1)
    out.append(min_code)
    lzw = _lzw_encode(seq, min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    out.append(_TRAILER)
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a single-frame GIF; returns (width, height, raster
    uint8 [h, w, 4] RGBA — alpha 0 only on a GCE-declared transparent
    index, else 255; the RGBA contract matches decode_png_rgba /
    decode_png_palette_rgba so downstream compositing is shared).
    Raises ValueError on anything outside the profile, truncation, or
    corrupt LZW."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("GIF header truncated")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB",
                                                 payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 1 << ((packed & 0x07) + 1)
        if pos + 3 * n > len(payload):
            raise ValueError("GIF header truncated")
        gct = np.frombuffer(payload[pos:pos + 3 * n],
                            dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    transparent = None
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("GIF trailer missing")
        block = payload[pos]
        pos += 1
        if block == _TRAILER:
            raise ValueError("GIF has no image block")
        if block == _EXTENSION:
            if pos >= n:
                raise ValueError("GIF extension truncated")
            label = payload[pos]
            pos += 1
            data, pos = _sub_blocks(payload, pos)
            if label == _GCE_LABEL:
                if len(data) != 4:
                    raise ValueError("GIF control block malformed")
                if data[0] & 0x01:
                    transparent = data[3]
            continue
        if block == _IMAGE_SEP:
            break
        raise ValueError("GIF block type unknown")
    if pos + 9 > n:
        raise ValueError("GIF image descriptor truncated")
    left, top, w, h, ipacked = struct.unpack("<HHHHB",
                                             payload[pos:pos + 9])
    pos += 9
    if (left, top) != (0, 0) or (w, h) != (sw, sh):
        raise ValueError("unsupported GIF sub-rectangle frame")
    if w == 0 or h == 0 or w * h > (1 << 26):
        raise ValueError("invalid dimensions")
    ct = gct
    if ipacked & 0x80:  # local color table takes precedence
        m = 1 << ((ipacked & 0x07) + 1)
        if pos + 3 * m > n:
            raise ValueError("GIF image descriptor truncated")
        ct = np.frombuffer(payload[pos:pos + 3 * m],
                           dtype=np.uint8).reshape(m, 3)
        pos += 3 * m
    if ct is None:
        raise ValueError("unsupported GIF without a color table")
    if pos >= n:
        raise ValueError("GIF image descriptor truncated")
    min_code = payload[pos]
    pos += 1
    data, pos = _sub_blocks(payload, pos)
    # image must terminate the stream (single-frame profile): only
    # the trailer (optionally preceded by skippable extensions) may
    # follow
    while pos < n:
        block = payload[pos]
        pos += 1
        if block == _TRAILER:
            break
        if block == _EXTENSION:
            if pos >= n:
                raise ValueError("GIF extension truncated")
            pos += 1
            _skip, pos = _sub_blocks(payload, pos)
            continue
        if block == _IMAGE_SEP:
            raise ValueError("unsupported multi-frame GIF")
        raise ValueError("GIF block type unknown")
    else:
        raise ValueError("GIF trailer missing")
    seq = _lzw_decode(data, min_code, w * h)
    if int(seq.max(initial=0)) >= ct.shape[0]:
        raise ValueError("GIF index beyond color table")
    if ipacked & 0x40:
        rows = [r for start, step in _ILACE
                for r in range(start, h, step)]
        idx = np.zeros((h, w), dtype=np.int64)
        idx[rows] = seq.reshape(h, w)
    else:
        idx = seq.reshape(h, w)
    alpha = np.full(ct.shape[0], 255, dtype=np.uint8)
    if transparent is not None and transparent < ct.shape[0]:
        alpha[transparent] = 0
    ct4 = np.concatenate([ct, alpha[:, None]], axis=1)
    return w, h, ct4[idx]


def decode_gif_rgb(payload: bytes) -> tuple[int, int, np.ndarray]:
    """RGB view of decode_gif for fully-opaque corpora: [h, w, 3],
    same ValueError contract (the alpha plumbing is pinned separately
    by the transparency unit tests)."""
    w, h, rgba = decode_gif(payload)
    return w, h, rgba[:, :, :3]


def encode_gif_anim(frames: "np.ndarray", palette: "np.ndarray",
                    delay_cs: int = 4) -> bytes:
    """Encode an [n, h, w] uint8 index stack as an ANIMATED GIF89a:
    every frame is a full-rectangle image block preceded by a Graphic
    Control Extension carrying ``delay_cs`` (centiseconds) and
    disposal 1 (leave in place — with full-rect frames each simply
    replaces the last). Real LZW per frame, shared global table."""
    frames = np.asarray(frames, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    if frames.ndim != 3 or frames.shape[0] == 0:
        raise ValueError("expected [n, h, w] frame stack")
    n_frames, h, w = frames.shape
    if h == 0 or w == 0:
        raise ValueError("empty raster")
    if (palette.ndim != 2 or palette.shape[1] != 3
            or not 2 <= palette.shape[0] <= 256):
        raise ValueError("palette must be [2..256, 3]")
    if int(frames.max(initial=0)) >= palette.shape[0]:
        raise ValueError("index beyond palette")
    k = max(1, (palette.shape[0] - 1).bit_length()) - 1
    gct = np.zeros(((1 << (k + 1)), 3), dtype=np.uint8)
    gct[:palette.shape[0]] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (k << 4) | k, 0, 0)
    out += gct.tobytes()
    min_code = max(2, k + 1)
    for f in range(n_frames):
        out += bytes([_EXTENSION, _GCE_LABEL, 4, 0x04])  # disposal 1
        out += struct.pack("<H", delay_cs) + bytes([0, 0])
        out += bytes([_IMAGE_SEP]) + struct.pack("<HHHHB", 0, 0, w, h,
                                                 0)
        out.append(min_code)
        lzw = _lzw_encode(frames[f].ravel(), min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(_TRAILER)
    return bytes(out)


def encode_gif_anim_delta(frames: "np.ndarray", palette: "np.ndarray",
                          delay_cs: int = 4,
                          transparent: int = 255) -> bytes:
    """Encode an [n, h, w] uint8 index stack as an ANIMATED GIF89a in
    the dominant wild profile (round 17): frame 0 aside, each image
    block covers only the BOUNDING RECTANGLE of pixels that changed
    since the previous canvas state, unchanged pixels inside the rect
    are coded as the ``transparent`` index (compositing passthrough),
    and a NETSCAPE2.0 loop extension precedes the frames. Disposal
    methods exercise the composited decoder: frames with
    ``k % 5 == 3`` carry disposal 2 (restore rect to background) and
    frames with ``k % 5 == 2`` carry disposal 3 (restore-to-previous,
    round-17 late addition) — the encoder SIMULATES the canvas
    including disposals, so the composited playback reproduces each
    target frame exactly. Frames
    with ``k % 2 == 1`` carry a LOCAL color table that is the global
    table under the index permutation j -> (j*7) % 256 (content
    indices remapped by the inverse 183 = 7^-1 mod 256), so the
    decoder's LCT-precedence path is exercised without changing the
    decoded colors. Requires a full 256-entry palette (the
    permutation is a bijection of 0..255) and content indices that
    never collide with ``transparent``."""
    frames = np.asarray(frames, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    if frames.ndim != 3 or frames.shape[0] == 0:
        raise ValueError("expected [n, h, w] frame stack")
    n_frames, h, w = frames.shape
    if h == 0 or w == 0:
        raise ValueError("empty raster")
    if palette.shape != (256, 3):
        raise ValueError("delta encoder needs a full 256-entry palette")
    if not 0 <= transparent <= 255:
        raise ValueError("transparent index out of range")
    if (frames == transparent).any():
        raise ValueError("content collides with the transparent index")
    if ((np.arange(256, dtype=np.int64) * 183) % 256 == transparent)[
            frames.reshape(-1)].any():  # pragma: no cover - 249 unused
        raise ValueError("content collides with the transparent index")
    k = 7  # 256-entry global color table
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (k << 4) | k, 0, 0)
    out += palette.tobytes()
    # NETSCAPE2.0 loop extension (infinite): exercises the walker's
    # application-extension skip path on every payload
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code = 8
    canvas = np.zeros((h, w), dtype=np.uint8)  # background index 0
    perm = ((np.arange(256, dtype=np.int64) * 183) % 256).astype(
        np.uint8)
    for f in range(n_frames):
        target = frames[f]
        diff = target != canvas
        if diff.any():
            rows = np.flatnonzero(diff.any(axis=1))
            cols = np.flatnonzero(diff.any(axis=0))
            t0, t1 = int(rows[0]), int(rows[-1]) + 1
            l0, l1 = int(cols[0]), int(cols[-1]) + 1
        else:  # nothing changed: a legal fully-transparent 1x1 frame
            t0, t1, l0, l1 = 0, 1, 0, 1
        rect = np.where(diff[t0:t1, l0:l1], target[t0:t1, l0:l1],
                        np.uint8(transparent))
        disposal = 2 if f % 5 == 3 else (3 if f % 5 == 2 else 1)
        out += bytes([_EXTENSION, _GCE_LABEL, 4,
                      (disposal << 2) | 0x01])
        out += struct.pack("<H", delay_cs) + bytes([transparent, 0])
        use_lct = f % 2 == 1
        interlace = f % 3 == 1
        ipacked = (0x80 | k if use_lct else 0) | (
            0x40 if interlace else 0)
        out += bytes([_IMAGE_SEP]) + struct.pack(
            "<HHHHB", l0, t0, l1 - l0, t1 - t0, ipacked)
        if use_lct:
            # LCT[j] = palette[(j*7) % 256], so LCT[perm[v]] = palette[v]
            out += palette[
                (np.arange(256, dtype=np.int64) * 7) % 256].tobytes()
            # remap content indices by the inverse permutation; the
            # transparent index is NOT remapped (it is an index, and
            # (v*183)%256 == transparent requires v == 249, unused)
            rect = np.where(rect == transparent, rect, perm[rect])
        rh, rw = rect.shape
        if interlace:
            ilrows = [r for start, step in _ILACE
                      for r in range(start, rh, step)]
            seq = rect[ilrows].ravel()
        else:
            seq = rect.ravel()
        out.append(min_code)
        lzw = _lzw_encode(seq, min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
        if disposal == 3:
            # restore-to-previous: the drawn rect reverts, and target
            # differs from the pre-frame canvas only inside the rect,
            # so the post-disposal canvas IS the pre-frame canvas
            pass
        else:
            canvas = target.copy()
            if disposal == 2:
                canvas[t0:t1, l0:l1] = 0
    out.append(_TRAILER)
    return bytes(out)


def decode_gif_frames_composited(payload: bytes, every: int = 1):
    """Composited animated-GIF playback (round 17) — the dominant
    wild profile decode_gif_frames' full-rect restriction excludes:
    image blocks may cover any SUB-RECTANGLE of the logical screen,
    a GCE-transparent index inside a frame means "keep the canvas
    pixel" (delta passthrough), per-frame LOCAL color tables take
    precedence, and disposal methods 0/1 (leave in place),
    2 (restore rect to background), and 3 (restore-to-previous,
    round-17 late addition) are honored between frames. Disposal 3
    needs no canvas STACK: the spec restores only "the area
    overwritten by the graphic", so saving the frame's own rect
    before drawing and putting it back after the snapshot is exact —
    O(rect) extra memory for that frame only, not O(frames) history.
    Undefined disposal codes 4-7 raise (unsupported_profile in the
    attrition taxonomy) rather than decoding wrongly.

    Returns (width, height, n_frames, [(frame_idx, canvas uint8
    [sh, sw, 4] RGBA)]) for frames with ``frame_idx % every == 0``;
    the canvas is always fully opaque (alpha 255 everywhere) — a
    junk background index paints never-drawn pixels opaque black
    rather than transparent, so downstream feature math never sees
    an alpha hole.

    HONESTY NOTE on the sparse-skip property: unlike the full-rect
    walker, a composited frame DEPENDS on every prior frame's draw
    and disposal, so every frame's LZW must be decoded even when
    sampled out — sampling saves only the snapshot copies, not the
    entropy work. At 100 TB, route known full-rect corpora through
    decode_gif_frames (true 1/k entropy cost) and reserve this walker
    for delta-encoded animations."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("GIF header truncated")
    sw, sh, packed, bg, _aspect = struct.unpack("<HHBBB",
                                                payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        m = 1 << ((packed & 0x07) + 1)
        if pos + 3 * m > len(payload):
            raise ValueError("GIF header truncated")
        gct = np.frombuffer(payload[pos:pos + 3 * m],
                            dtype=np.uint8).reshape(m, 3)
        pos += 3 * m
    if gct is None:
        raise ValueError("unsupported GIF without a color table")
    if sw == 0 or sh == 0 or sw * sh > (1 << 26):
        raise ValueError("invalid dimensions")
    # canvas init: background color if the index is usable, else
    # opaque black (the spec leaves junk bg indices to the decoder;
    # raising here would drop otherwise-valid payloads)
    canvas = np.zeros((sh, sw, 4), dtype=np.uint8)
    canvas[:, :, 3] = 255
    if bg < gct.shape[0]:
        canvas[:, :, :3] = gct[bg]
    bg_rgba = canvas[0, 0].copy()
    transparent = None
    disposal = 0
    n = len(payload)
    frames = []
    fidx = 0
    while True:
        if pos >= n:
            raise ValueError("GIF trailer missing")
        block = payload[pos]
        pos += 1
        if block == _TRAILER:
            break
        if block == _EXTENSION:
            if pos >= n:
                raise ValueError("GIF extension truncated")
            label = payload[pos]
            pos += 1
            data, pos = _sub_blocks(payload, pos)
            if label == _GCE_LABEL:
                if len(data) != 4:
                    raise ValueError("GIF control block malformed")
                transparent = data[3] if data[0] & 0x01 else None
                disposal = (data[0] >> 2) & 0x07
                if disposal >= 4:
                    raise ValueError(
                        "unsupported GIF disposal method")
            continue
        if block != _IMAGE_SEP:
            raise ValueError("GIF block type unknown")
        if pos + 9 > n:
            raise ValueError("GIF image descriptor truncated")
        left, top, w, h, ipacked = struct.unpack(
            "<HHHHB", payload[pos:pos + 9])
        pos += 9
        if w == 0 or h == 0 or left + w > sw or top + h > sh:
            raise ValueError("invalid dimensions (frame rect)")
        ct = gct
        if ipacked & 0x80:
            m = 1 << ((ipacked & 0x07) + 1)
            if pos + 3 * m > n:
                raise ValueError("GIF image descriptor truncated")
            ct = np.frombuffer(payload[pos:pos + 3 * m],
                               dtype=np.uint8).reshape(m, 3)
            pos += 3 * m
        if pos >= n:
            raise ValueError("GIF image descriptor truncated")
        min_code = payload[pos]
        pos += 1
        data, pos = _sub_blocks(payload, pos)
        seq = _lzw_decode(data, min_code, w * h)
        if int(seq.max(initial=0)) >= ct.shape[0]:
            raise ValueError("GIF index beyond color table")
        if ipacked & 0x40:
            rows = [r for start, step in _ILACE
                    for r in range(start, h, step)]
            idx = np.zeros((h, w), dtype=np.int64)
            idx[rows] = seq.reshape(h, w)
        else:
            idx = seq.reshape(h, w)
        ct4 = np.concatenate(
            [ct, np.full((ct.shape[0], 1), 255, dtype=np.uint8)],
            axis=1)
        patch = ct4[idx]
        window = canvas[top:top + h, left:left + w]
        saved = window.copy() if disposal == 3 else None
        if transparent is not None:
            opaque = idx != transparent
            window[opaque] = patch[opaque]
        else:
            window[:, :, :] = patch
        if fidx % every == 0:
            frames.append((fidx, canvas.copy()))
        if disposal == 2:
            canvas[top:top + h, left:left + w] = bg_rgba
        elif disposal == 3:
            canvas[top:top + h, left:left + w] = saved
        transparent = None
        disposal = 0
        fidx += 1
    if fidx == 0:
        raise ValueError("GIF has no image block")
    return sw, sh, fidx, frames


def decode_gif_frames(payload: bytes, every: int = 1):
    """Decode an animated GIF's frames (restricted profile: every
    image block FULL-RECTANGLE, so each frame replaces the last and
    disposal methods are moot — partial-rect compositing raises).
    Returns (width, height, n_frames, [(frame_idx, raster
    uint8 [h, w, 4])]) for frames with ``frame_idx % every == 0``.

    The SPARSE-DECODE property the video family relies on holds here
    too: an unsampled frame is skipped by WALKING its sub-block chain
    (length bytes only) without running LZW — at 100 TB, sampling
    every k-th frame costs ~1/k of the entropy-decode work."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("GIF header truncated")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB",
                                                 payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        m = 1 << ((packed & 0x07) + 1)
        if pos + 3 * m > len(payload):
            raise ValueError("GIF header truncated")
        gct = np.frombuffer(payload[pos:pos + 3 * m],
                            dtype=np.uint8).reshape(m, 3)
        pos += 3 * m
    if gct is None:
        raise ValueError("unsupported GIF without a color table")
    if sw == 0 or sh == 0 or sw * sh > (1 << 26):
        raise ValueError("invalid dimensions")
    transparent = None
    n = len(payload)
    frames = []
    fidx = 0
    while True:
        if pos >= n:
            raise ValueError("GIF trailer missing")
        block = payload[pos]
        pos += 1
        if block == _TRAILER:
            break
        if block == _EXTENSION:
            if pos >= n:
                raise ValueError("GIF extension truncated")
            label = payload[pos]
            pos += 1
            data, pos = _sub_blocks(payload, pos)
            if label == _GCE_LABEL:
                if len(data) != 4:
                    raise ValueError("GIF control block malformed")
                transparent = data[3] if data[0] & 0x01 else None
            continue
        if block != _IMAGE_SEP:
            raise ValueError("GIF block type unknown")
        if pos + 9 > n:
            raise ValueError("GIF image descriptor truncated")
        left, top, w, h, ipacked = struct.unpack(
            "<HHHHB", payload[pos:pos + 9])
        pos += 9
        if (left, top) != (0, 0) or (w, h) != (sw, sh):
            raise ValueError("unsupported GIF sub-rectangle frame")
        ct = gct
        if ipacked & 0x80:
            m = 1 << ((ipacked & 0x07) + 1)
            if pos + 3 * m > n:
                raise ValueError("GIF image descriptor truncated")
            ct = np.frombuffer(payload[pos:pos + 3 * m],
                               dtype=np.uint8).reshape(m, 3)
            pos += 3 * m
        if pos >= n:
            raise ValueError("GIF image descriptor truncated")
        min_code = payload[pos]
        pos += 1
        data, pos = _sub_blocks(payload, pos)
        if fidx % every == 0:
            seq = _lzw_decode(data, min_code, w * h)
            if int(seq.max(initial=0)) >= ct.shape[0]:
                raise ValueError("GIF index beyond color table")
            if ipacked & 0x40:
                rows = [r for start, step in _ILACE
                        for r in range(start, h, step)]
                idx = np.zeros((h, w), dtype=np.int64)
                idx[rows] = seq.reshape(h, w)
            else:
                idx = seq.reshape(h, w)
            alpha = np.full(ct.shape[0], 255, dtype=np.uint8)
            if transparent is not None and transparent < ct.shape[0]:
                alpha[transparent] = 0
            ct4 = np.concatenate([ct, alpha[:, None]], axis=1)
            frames.append((fidx, ct4[idx]))
        fidx += 1
    if fidx == 0:
        raise ValueError("GIF has no image block")
    return sw, sh, fidx, frames
