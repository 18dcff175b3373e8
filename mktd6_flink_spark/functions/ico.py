"""Windows ICO/CUR icon container (round 17) — pure-python + numpy.

A genuinely distinct container SHAPE from every family so far: ICO is
a DIRECTORY of images, not one image — an ICONDIR header, N 16-byte
ICONDIRENTRY rows (u8 dimensions where 0 means 256, byte size, byte
offset), and each image either a headerless DIB ("BMP without
BITMAPFILEHEADER", biHeight DOUBLED to cover the 1-bpp AND
transparency mask stored after the XOR pixel rows) or — since Vista —
a complete embedded PNG file detected by its signature. A real
decoder therefore exercises resource selection (largest image wins,
the consumer convention), per-entry bounds validation against the
blob, format dispatch (DIB vs PNG), the doubled-height rule, and
AND-mask compositing. Written from the public ICONDIR/ICONDIRENTRY
and BITMAPINFOHEADER documentation (Windows GDI; the "PNG in ICO"
convention is public Vista-era documentation). The reference repo
(monkeytechdays/mktd6-flink) contains no image handling; this extends
the multimodal ingest family (SURVEY.md LLM-pipeline ops), not a port.

Supported profile: resource type 1 (ICO) and 2 (CUR — the directory
fields differ only in meaning, the images decode identically), DIB
images with biSize=40, biBitCount 8 (palettized) or 24 (BGR),
BI_RGB only (RLE does not occur inside ICO resources), bottom-up rows
(the only storage order valid in an ICO DIB), and embedded truecolor
PNGs (the png module's profile). AND-mask-transparent pixels
composite over WHITE — the same exact-integer rule as the PNG alpha
lane, so one convention covers every transparency source. Everything
else raises ValueError with a message inside
multimodal._REASON_PATTERNS' public attrition taxonomy.
"""

from __future__ import annotations

import struct

import numpy as np

_DIR_HDR = 6
_ENTRY = 16
_INFO_HDR = 40
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _dib_encode(raster_or_idx: "np.ndarray",
                palette: "np.ndarray | None") -> bytes:
    """Encode one icon image as a headerless ICO DIB: BITMAPINFOHEADER
    with DOUBLED biHeight, optional BGRA palette, bottom-up 4-byte
    padded XOR rows (BGR for 24-bit, indices for 8-bit), then the
    all-opaque 1-bpp AND mask (bottom-up, rows padded to 32 bits)."""
    a = np.asarray(raster_or_idx, dtype=np.uint8)
    if palette is None:
        h, w, _ = a.shape
        bits = 24
        stride = (3 * w + 3) & ~3
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, :3 * w] = a[:, :, ::-1].reshape(h, 3 * w)  # BGR
        pal = b""
    else:
        h, w = a.shape
        bits = 8
        stride = (w + 3) & ~3
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, :w] = a
        p = np.asarray(palette, dtype=np.uint8)
        quad = np.zeros((256, 4), dtype=np.uint8)
        quad[:, :3] = p[:, ::-1]  # RGB -> BGR0
        pal = quad.tobytes()
    xor = rows[::-1].tobytes()  # bottom-up storage
    mask_stride = ((w + 31) // 32) * 4
    mask = bytes(mask_stride * h)  # all-opaque AND mask
    info = struct.pack("<IiiHHIIiiII", _INFO_HDR, w, 2 * h, 1, bits,
                       0, len(xor) + len(mask), 0, 0,
                       0 if palette is None else 256, 0)
    return info + pal + xor + mask


def encode_ico(images: list, cursor: bool = False) -> bytes:
    """Assemble an ICO (or CUR) from a list of images, each either
    ``("png", png_bytes, w, h)`` or ``("dib8", idx[h, w], pal[256,3])``
    or ``("dib24", rgb[h, w, 3])``. Directory dimension bytes follow
    the spec's 0-means-256 rule."""
    blobs = []
    dims = []
    for img in images:
        if img[0] == "png":
            _, png, w, h = img
            blobs.append(bytes(png))
        elif img[0] == "dib8":
            _, idx, pal = img
            h, w = idx.shape
            blobs.append(_dib_encode(idx, pal))
        else:
            _, rgb = img
            h, w, _ = rgb.shape
            blobs.append(_dib_encode(rgb, None))
        if not (0 < w <= 256 and 0 < h <= 256):
            raise ValueError("invalid dimensions")
        dims.append((w, h))
    out = bytearray(struct.pack("<HHH", 0, 2 if cursor else 1,
                                len(images)))
    off = _DIR_HDR + _ENTRY * len(images)
    for (w, h), blob in zip(dims, blobs):
        out += struct.pack("<BBBBHHII", w % 256, h % 256, 0, 0, 1,
                           0, len(blob), off)
        off += len(blob)
    for blob in blobs:
        out += blob
    return bytes(out)


def _decode_dib(blob: bytes) -> tuple[int, int, "np.ndarray"]:
    """Decode one headerless ICO DIB to (w, h, [h, w, 3] RGB, top row
    first); AND-mask-set pixels composite to white."""
    if len(blob) < _INFO_HDR:
        raise ValueError("ICO image truncated")
    (info_size, w, h2, planes, bits, compression, _sz, _xp, _yp,
     clr_used, _imp) = struct.unpack_from("<IiiHHIIiiII", blob, 0)
    if info_size != _INFO_HDR:
        raise ValueError("unsupported ICO bitmap header")
    if planes != 1 or compression != 0 or bits not in (8, 24):
        raise ValueError("unsupported ICO bitmap")
    if h2 <= 0 or h2 % 2:
        # ICO DIBs are bottom-up with biHeight = XOR + AND rows
        raise ValueError("unsupported ICO bitmap")
    h = h2 // 2
    if w <= 0 or w * h > (1 << 26):
        raise ValueError("invalid dimensions")
    pos = _INFO_HDR
    pal = None
    if bits == 8:
        m = clr_used or 256
        if not 0 < m <= 256:
            raise ValueError("ICO palette size invalid")
        if pos + 4 * m > len(blob):
            raise ValueError("ICO palette truncated")
        quad = np.frombuffer(blob[pos:pos + 4 * m],
                             dtype=np.uint8).reshape(m, 4)
        pal = quad[:, 2::-1].copy()  # BGR0 -> RGB
        pos += 4 * m
        stride = (w + 3) & ~3
    else:
        # a 24-bit BI_RGB DIB may still carry biClrUsed "optimal
        # palette" hint entries before the pixel rows — skip them, or
        # the palette bytes would silently decode as pixels
        if clr_used:
            if not 0 < clr_used <= 256:
                raise ValueError("ICO palette size invalid")
            if pos + 4 * clr_used > len(blob):
                raise ValueError("ICO palette truncated")
            pos += 4 * clr_used
        stride = (3 * w + 3) & ~3
    if pos + stride * h > len(blob):
        raise ValueError("ICO pixel data truncated")
    rows = np.frombuffer(blob[pos:pos + stride * h],
                         dtype=np.uint8).reshape(h, stride)[::-1]
    pos += stride * h
    if bits == 24:
        rgb = rows[:, :3 * w].reshape(h, w, 3)[:, :, ::-1].copy()
    else:
        idx = rows[:, :w]
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("ICO index beyond palette")
        rgb = pal[idx.astype(np.int64)]
    mask_stride = ((w + 31) // 32) * 4
    if pos + mask_stride * h > len(blob):
        raise ValueError("ICO mask truncated")
    mrows = np.frombuffer(blob[pos:pos + mask_stride * h],
                          dtype=np.uint8).reshape(h, mask_stride)[::-1]
    mbits = np.unpackbits(mrows, axis=1)[:, :w]
    rgb[mbits == 1] = 255  # AND-mask transparent: over white
    return w, h, rgb


def decode_ico(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """Decode an ICO/CUR payload to the LARGEST image's (w, h,
    [h, w, 3] RGB raster, top row first) — largest by the directory's
    declared pixel area (0-means-256 dimension bytes), first entry
    winning ties, the standard consumer selection rule. The chosen
    image dispatches on its leading bytes: an embedded PNG decodes
    through the png module's truecolor lane; anything else is a
    headerless DIB (doubled biHeight, palette, bottom-up XOR rows,
    1-bpp AND mask composited over white). The directory's dimension
    bytes must agree with the decoded image (a mismatch is a
    malformed resource, not a decoder guess). Raises ValueError on
    anything outside the profile — messages inside the public
    attrition taxonomy."""
    if len(payload) < _DIR_HDR:
        raise ValueError("not an ICO payload")
    reserved, rtype, count = struct.unpack_from("<HHH", payload, 0)
    if reserved != 0 or rtype not in (1, 2) or count == 0:
        raise ValueError("not an ICO payload")
    if _DIR_HDR + _ENTRY * count > len(payload):
        raise ValueError("ICO directory truncated")
    best = None  # (area, order, w, h, off, size)
    for i in range(count):
        wb, hb, _cc, _res, _p1, _p2, size, off = struct.unpack_from(
            "<BBBBHHII", payload, _DIR_HDR + _ENTRY * i)
        w = wb or 256
        h = hb or 256
        if off + size > len(payload) or off < _DIR_HDR or size == 0:
            raise ValueError("ICO directory entry out of bounds")
        key = (w * h, -i)
        if best is None or key > best[0]:
            best = (key, w, h, off, size)
    _, w, h, off, size = best
    blob = payload[off:off + size]
    if blob[:8] == _PNG_SIG:
        from .png import decode_png_rgb

        dw, dh, rgb = decode_png_rgb(blob)
    else:
        dw, dh, rgb = _decode_dib(blob)
    if (dw, dh) != (w, h):
        raise ValueError("ICO directory size mismatch")
    return dw, dh, rgb


def decode_ico_rgb(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """Alias with the shared (w, h, [h, w, 3]) feature-extractor
    contract (decode_bmp_rgb / decode_png_rgb parity)."""
    return decode_ico(payload)
