"""FLAC (Free Lossless Audio Codec) baseline codec — pure python.

The audio family's first COMPRESSED lossless container, and the first
bit-granular audio entropy path in the engine (the WAV/AIFF lanes are
byte-aligned; JPEG's Huffman lane is the only comparable cost shape):
a fLaC magic, length-prefixed metadata blocks (STREAMINFO's packed
20-bit sample rate / 3-bit channels / 5-bit sample size / 36-bit
total-sample fields, plus skippable PADDING/VORBIS_COMMENT blocks),
then self-delimiting FRAMES — 14-bit sync code, coded
blocksize/rate/channel/sample-size fields, a UTF-8-style-coded frame
or sample number, CRC-8 over the header, one SUBFRAME per channel
(CONSTANT, VERBATIM, or FIXED linear predictors order 0-4 with
partitioned Rice-coded residuals, including the 4/5-bit parameter
variants, the raw-escape partitions, and the wasted-bits shift), bit
padding to a byte, and CRC-16 over the whole frame. The decoder
VERIFIES both CRCs and the STREAMINFO MD5 of the reconstructed
little-endian sample stream — a flipped bit anywhere in a frame is a
taxonomized row drop, never silent corruption.

Everything is written from the public FLAC format specification
(RFC 9639 / xiph.org; Rice coding per Rice & Plaunt 1971). LPC
subframes (types 32-63) are outside the supported profile and raise.
The reference repo (monkeytechdays/mktd6-flink) contains no audio
handling; this extends the multimodal ingest family (SURVEY.md
LLM-pipeline ops), not a port.

Cost shape: decode is payload-local python (mapInPandas parallel per
payload, same contract as the JPEG/PNG lanes); the corpus documents
are ~300 samples, so the bit-serial residual walk is bounded per row
and the 100 TB unit of parallelism is the payload.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

BLOCKSIZE = 256          # frames per stream: ceil(n / 256)
_SYNC = 0b11111111111110


def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if crc & top else (crc << 1)
        table.append(crc & mask)
    return table


_CRC8 = _crc_table(0x07, 8)        # x^8 + x^2 + x + 1, init 0
_CRC16 = _crc_table(0x8005, 16)    # x^16 + x^15 + x^2 + 1, init 0


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8[crc ^ b]
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC16[((crc >> 8) ^ b) & 0xFF] ^ ((crc << 8) & 0xFFFF)
    return crc


def _utf8_code(n: int) -> bytes:
    """The FLAC frame/sample-number coding: standard UTF-8 byte
    patterns extended to 7 bytes (lead 0xFE, no payload bits) for
    36-bit sample numbers."""
    if n < 0x80:
        return bytes([n])
    for extra, limit in ((1, 1 << 11), (2, 1 << 16), (3, 1 << 21),
                         (4, 1 << 26), (5, 1 << 31), (6, 1 << 36)):
        if n < limit:
            if extra < 6:
                lead = ((0xFF << (7 - extra)) & 0xFF) | (n >> (6 * extra))
            else:
                lead = 0xFE
            out = [lead]
            for i in range(extra - 1, -1, -1):
                out.append(0x80 | ((n >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("frame number out of range")


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a terminating one

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, nbits: int) -> int:
        v = 0
        need = nbits
        while need:
            if self.byte >= len(self.data):
                raise ValueError("truncated FLAC stream")
            avail = 8 - self.bit
            take = avail if avail < need else need
            cur = self.data[self.byte]
            v = (v << take) | ((cur >> (avail - take))
                              & ((1 << take) - 1))
            self.bit += take
            need -= take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_signed(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        v = self.read(nbits)
        return v - (1 << nbits) if v >> (nbits - 1) else v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self.byte >= len(self.data):
                raise ValueError("truncated FLAC stream")
            rest = self.data[self.byte] & ((1 << (8 - self.bit)) - 1)
            if rest == 0:
                q += 8 - self.bit
                self.bit = 0
                self.byte += 1
                continue
            top = rest.bit_length()
            q += (8 - self.bit) - top
            self.bit = 8 - top + 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


_FIXED_COEFFS = ((), (1,), (2, -1), (3, -3, 1), (4, -6, 4, -1))


def _fixed_residuals(s: "np.ndarray", order: int) -> "np.ndarray":
    r = s.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _rice_optimal_p(resid: "np.ndarray") -> int:
    if resid.size == 0:
        return 0
    u = np.where(resid >= 0, 2 * resid, -2 * resid - 1)
    best_p, best_bits = 0, None
    for p in range(15):
        bits = int((u >> p).sum()) + resid.size * (1 + p)
        if best_bits is None or bits < best_bits:
            best_p, best_bits = p, bits
    return best_p


def _write_rice_partition(w: "_BitWriter", resid: "np.ndarray",
                          escape: bool) -> None:
    if escape:
        m = 0
        if resid.size:
            lo, hi = int(resid.min()), int(resid.max())
            if lo or hi:  # all-zero partitions escape with width 0
                m = max(hi.bit_length() + 1 if hi > 0 else 1,
                        (-lo - 1).bit_length() + 1 if lo < 0 else 1)
        w.write(0b1111, 4)
        w.write(m, 5)
        for r in resid.tolist():
            w.write(int(r), m)
        return
    p = _rice_optimal_p(resid)
    w.write(p, 4)
    for r in resid.tolist():
        u = 2 * r if r >= 0 else -2 * r - 1
        w.write_unary(u >> p)
        w.write(u, p)


def _encode_subframe(w: "_BitWriter", s: "np.ndarray", bps: int,
                     kind: str, part_order: int) -> None:
    if kind == "constant":
        w.write(0b000000 << 1, 8)
        w.write(int(s[0]), bps)
        return
    if kind == "verbatim":
        w.write(0b000001 << 1, 8)
        for v in s.tolist():
            w.write(int(v), bps)
        return
    order = int(kind[-1])  # "fixed0".."fixed4"
    w.write((0b001000 | order) << 1, 8)
    for v in s[:order].tolist():
        w.write(int(v), bps)
    resid = _fixed_residuals(s, order)
    n = s.size
    if n % (1 << part_order) or (n >> part_order) <= order:
        part_order = 0
    w.write(0b00, 2)  # rice method: 4-bit parameters
    w.write(part_order, 4)
    step = n >> part_order
    start = order
    for i in range(1 << part_order):
        stop = (i + 1) * step
        _write_rice_partition(w, resid[start - order:stop - order],
                              escape=(i % 3 == 2))
        start = stop


def encode_flac(samples: "np.ndarray", rate: int,
                padding: bool = False, vorbis: bool = False,
                kinds=None) -> bytes:
    """Encode mono int16 samples as a real FLAC stream: STREAMINFO
    (+ optional PADDING / VORBIS_COMMENT metadata), fixed-blocksize
    frames of BLOCKSIZE samples (the last one short, declared via the
    16-bit end-of-header blocksize field), per-frame subframe kinds
    from ``kinds`` (callable frame_idx -> 'constant'|'verbatim'|
    'fixed0'..'fixed4'; all-equal frames force CONSTANT), every third
    rice partition escape-coded raw, real CRC-8/CRC-16, and the real
    MD5 of the little-endian sample stream in STREAMINFO."""
    s = np.asarray(samples, dtype=np.int64)
    if s.size == 0:
        raise ValueError("no samples")
    n = s.size
    md5 = hashlib.md5(s.astype("<i2").tobytes()).digest()
    nframes = -(-n // BLOCKSIZE)
    out = bytearray(b"fLaC")
    info = _BitWriter()
    # min/max block size exclude the (possibly short) last frame —
    # the encoder's declared blocksize, the libFLAC convention
    info.write(BLOCKSIZE, 16)
    info.write(BLOCKSIZE, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(rate, 20)
    info.write(0, 3)      # channels - 1
    info.write(15, 5)     # bits per sample - 1
    info.write(n, 36)
    body = info.bytes() + md5
    blocks = [(0, body)]
    if vorbis:
        blocks.append((4, b"\x07\x00\x00\x00mktd6-0\x00\x00\x00\x00"))
    if padding:
        blocks.append((1, bytes(17)))
    for i, (btype, bbody) in enumerate(blocks):
        last = 0x80 if i == len(blocks) - 1 else 0
        out += bytes([last | btype]) + len(bbody).to_bytes(3, "big")
        out += bbody
    for f in range(nframes):
        chunk = s[f * BLOCKSIZE:(f + 1) * BLOCKSIZE]
        bs = chunk.size
        hdr = bytearray()
        hdr += struct.pack(">H", (_SYNC << 2) | 0)  # fixed strategy
        bs_code = 8 if bs == BLOCKSIZE else 7  # 256, else 16-bit field
        hdr.append((bs_code << 4) | 0)  # rate from STREAMINFO
        hdr.append((0 << 4) | (4 << 1))  # mono, 16-bit
        hdr += _utf8_code(f)
        if bs_code == 7:
            hdr += struct.pack(">H", bs - 1)
        hdr.append(crc8(bytes(hdr)))
        w = _BitWriter()
        if np.all(chunk == chunk[0]):
            kind = "constant"
        elif kinds is not None:
            kind = kinds(f)
        else:
            kind = ("verbatim", "fixed1", "fixed2")[f % 3]
        _encode_subframe(w, chunk, 16, kind, part_order=2 * (f % 2))
        w.align()
        frame = bytes(hdr) + w.bytes()
        out += frame + struct.pack(">H", crc16(frame))
    return bytes(out)


def _read_residuals(r: "_BitReader", bs: int, order: int) -> list:
    method = r.read(2)
    if method > 1:
        raise ValueError("unsupported FLAC residual method")
    pbits = 4 if method == 0 else 5
    esc = (1 << pbits) - 1
    part_order = r.read(4)
    if bs % (1 << part_order):
        raise ValueError("FLAC partition order invalid")
    step = bs >> part_order
    if step <= order and part_order:
        raise ValueError("FLAC partition order invalid")
    if step < order:
        raise ValueError("FLAC partition order invalid")
    resid: list[int] = []
    for i in range(1 << part_order):
        count = step - (order if i == 0 else 0)
        p = r.read(pbits)
        if p == esc:
            width = r.read(5)
            resid.extend(r.read_signed(width) for _ in range(count))
        else:
            for _ in range(count):
                q = r.read_unary()
                u = (q << p) | r.read(p)
                resid.append((u >> 1) if not u & 1 else -((u >> 1) + 1))
    return resid


def _read_fixed_subframe(r: "_BitReader", bs: int, eff: int,
                         order: int) -> "np.ndarray":
    warm = [r.read_signed(eff) for _ in range(order)]
    resid = _read_residuals(r, bs, order)
    s = np.empty(bs, dtype=np.int64)
    s[:order] = warm
    coeffs = _FIXED_COEFFS[order]
    for i in range(order, bs):
        acc = resid[i - order]
        for j, c in enumerate(coeffs):
            acc += c * s[i - 1 - j]
        s[i] = acc
    return s


def _decode_subframe(r: "_BitReader", bs: int, bps: int) -> "np.ndarray":
    if r.read(1):
        raise ValueError("FLAC subframe sync bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("FLAC wasted bits exceed sample size")
    if stype == 0:
        s = np.full(bs, r.read_signed(eff), dtype=np.int64)
    elif stype == 1:
        s = np.array([r.read_signed(eff) for _ in range(bs)],
                     dtype=np.int64)
    elif 8 <= stype <= 12:
        order = stype - 8
        if order > bs:
            raise ValueError("FLAC predictor order beyond block")
        s = _read_fixed_subframe(r, bs, eff, order)
    elif stype >= 32:
        raise ValueError("unsupported FLAC subframe (LPC)")
    else:
        raise ValueError("unsupported FLAC subframe type")
    return s << wasted


_BS_TABLE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
             8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
             13: 8192, 14: 16384, 15: 32768}
_RATE_TABLE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
               11: 96000}


def _read_utf8(data: bytes, pos: int) -> tuple[int, int]:
    if pos >= len(data):
        raise ValueError("truncated FLAC stream")
    b0 = data[pos]
    if b0 < 0x80:
        return b0, pos + 1
    ones = 0
    while ones < 8 and b0 & (0x80 >> ones):
        ones += 1
    if ones < 2 or ones > 7:
        raise ValueError("FLAC frame number coding invalid")
    extra = ones - 1
    v = b0 & (0x7F >> ones)
    for i in range(extra):
        if pos + 1 + i >= len(data):
            raise ValueError("truncated FLAC stream")
        c = data[pos + 1 + i]
        if c & 0xC0 != 0x80:
            raise ValueError("FLAC frame number coding invalid")
        v = (v << 6) | (c & 0x3F)
    return v, pos + 1 + extra


def _parse_flac(payload: bytes):
    """Parse a mono FLAC payload; returns (sample_rate, samples
    ndarray[int16-domain int64]). Verifies the header CRC-8, the
    frame CRC-16, and the STREAMINFO MD5 of the reconstructed
    little-endian sample stream. Raises ValueError on anything
    malformed or outside the supported profile — messages inside the
    public attrition taxonomy."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC stream")
        hdr = payload[pos]
        size = int.from_bytes(payload[pos + 1:pos + 4], "big")
        body = payload[pos + 4:pos + 4 + size]
        if len(body) != size:
            raise ValueError("truncated FLAC stream")
        if hdr & 0x7F == 0:
            if size != 34:
                raise ValueError("FLAC STREAMINFO malformed")
            info = body
        pos += 4 + size
        if hdr & 0x80:
            break
    if info is None:
        raise ValueError("FLAC STREAMINFO malformed")
    rate = int.from_bytes(info[10:13], "big") >> 4
    channels = ((info[12] >> 1) & 0x07) + 1
    bps = (((info[12] & 0x01) << 4) | (info[13] >> 4)) + 1
    total = int.from_bytes(info[13:18], "big") & ((1 << 36) - 1)
    md5 = info[18:34]
    if channels != 1 or bps != 16:
        raise ValueError("unsupported FLAC profile "
                         "(want mono 16-bit)")
    if not 0 < rate < (1 << 20):
        raise ValueError("invalid sample rate")
    out: list = []
    decoded = 0
    while pos < len(payload):
        if total and decoded >= total:
            # all declared samples decoded: whatever follows is
            # trailing non-FLAC junk (ID3-style tags, padding) — the
            # same tolerance rule as the RIFF/FORM walks, with the
            # STREAMINFO total-samples field as the declared bound
            break
        frame_start = pos
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC stream")
        sync = int.from_bytes(payload[pos:pos + 2], "big")
        if sync >> 2 != _SYNC:
            raise ValueError("FLAC frame sync lost")
        if (sync >> 1) & 1:  # mandatory-zero bit 15 of the sync pair
            raise ValueError("FLAC frame header reserved bit")
        b2, b3 = payload[pos + 2], payload[pos + 3]
        bs_code, rate_code = b2 >> 4, b2 & 0x0F
        chan_code, size_code = b3 >> 4, (b3 >> 1) & 0x07
        if b3 & 1:
            raise ValueError("FLAC frame header reserved bit")
        if chan_code != 0:
            raise ValueError("unsupported FLAC profile "
                             "(want mono 16-bit)")
        if size_code == 4:
            fbps = 16
        else:
            raise ValueError("unsupported FLAC profile "
                             "(want mono 16-bit)")
        pos += 4
        _, pos = _read_utf8(payload, pos)
        if bs_code == 0:
            raise ValueError("FLAC frame header reserved bit")
        elif bs_code == 6:
            if pos + 1 > len(payload):
                raise ValueError("truncated FLAC stream")
            bs = payload[pos] + 1
            pos += 1
        elif bs_code == 7:
            if pos + 2 > len(payload):
                raise ValueError("truncated FLAC stream")
            bs = int.from_bytes(payload[pos:pos + 2], "big") + 1
            pos += 2
        else:
            bs = _BS_TABLE[bs_code]
        if rate_code in (12, 13, 14):
            # explicit end-of-header rate: validate against
            # STREAMINFO exactly like the table codes do
            nb = 1 if rate_code == 12 else 2
            if pos + nb > len(payload):
                raise ValueError("truncated FLAC stream")
            v = int.from_bytes(payload[pos:pos + nb], "big")
            frate = (v * 1000 if rate_code == 12
                     else v if rate_code == 13 else v * 10)
            pos += nb
            if frate != rate:
                raise ValueError("FLAC frame rate mismatch")
        elif rate_code == 15:
            raise ValueError("FLAC frame header reserved bit")
        elif rate_code != 0 and _RATE_TABLE[rate_code] != rate:
            raise ValueError("FLAC frame rate mismatch")
        if pos >= len(payload):
            raise ValueError("truncated FLAC stream")
        if crc8(payload[frame_start:pos]) != payload[pos]:
            raise ValueError("FLAC header CRC mismatch")
        pos += 1
        r = _BitReader(payload, pos)
        s = _decode_subframe(r, bs, fbps)
        r.align()
        pos = r.byte
        if pos + 2 > len(payload):
            raise ValueError("truncated FLAC stream")
        if crc16(payload[frame_start:pos]) != int.from_bytes(
                payload[pos:pos + 2], "big"):
            raise ValueError("FLAC frame CRC mismatch")
        pos += 2
        if np.any(s < -32768) or np.any(s > 32767):
            raise ValueError("FLAC sample out of range")
        out.append(s)
        decoded += s.size
    samples = (np.concatenate(out) if out
               else np.empty(0, dtype=np.int64))
    if total and samples.size != total:
        raise ValueError("FLAC stream size mismatch")
    if md5 != bytes(16) and hashlib.md5(
            samples.astype("<i2").tobytes()).digest() != md5:
        raise ValueError("FLAC MD5 mismatch")
    return rate, samples
