"""Cross-validate the pure-numpy baseline JPEG decoder against an
INDEPENDENT encoder written directly from ITU-T T.81 in this file —
its zigzag order is derived algorithmically (diagonal walk), its
Huffman tables are built from the image's own symbol statistics, and
its DCT basis is its own construction, so agreement with the decoder
requires both sides to implement the spec correctly."""

from __future__ import annotations

import numpy as np
import pytest

from mktd6_flink_spark.functions.jpeg import decode_baseline_jpeg


# ------------------------------------------------- independent encoder

def _zigzag_indices():
    """Diagonal-walk derivation of the zigzag scan (NOT the table)."""
    order = []
    for d in range(15):
        rng = range(max(0, d - 7), min(d, 7) + 1)
        diag = [(d - j, j) for j in rng]
        if d % 2 == 1:
            diag.reverse()
        order.extend(r * 8 + c for r, c in diag)
    return order


_ZZ = _zigzag_indices()


def _basis():
    m = np.zeros((8, 8))
    for u in range(8):
        for x in range(8):
            cu = np.sqrt(0.125) if u == 0 else np.sqrt(0.25)
            m[u, x] = cu * np.cos((2 * x + 1) * u * np.pi / 16)
    return m


_B = _basis()


class _Writer:
    def __init__(self):
        self.bytes_ = bytearray()
        self.bits = []

    def put(self, val, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((val >> i) & 1)
        while len(self.bits) >= 8:
            b = 0
            for bit in self.bits[:8]:
                b = (b << 1) | bit
            del self.bits[:8]
            self.bytes_.append(b)
            if b == 0xFF:
                self.bytes_.append(0x00)

    def restart(self, idx):
        """Byte-align (1-pad) and emit RSTn — T.81 §E.1.4/F.1.2.3."""
        if self.bits:
            self.put((1 << (8 - len(self.bits))) - 1, 8 - len(self.bits))
        self.bytes_ += bytes([0xFF, 0xD0 + (idx % 8)])

    def done(self):
        if self.bits:
            self.put((1 << (8 - len(self.bits))) - 1, 8 - len(self.bits))
        return bytes(self.bytes_)


def _cat(v):
    return 0 if v == 0 else int(abs(v)).bit_length()


def _fixed_codes(symbols):
    """Canonical fixed-length code for the used symbol set: all codes
    at length L with 2**L > n (so the all-ones code stays unused)."""
    syms = sorted(set(symbols))
    ln = max(1, (len(syms)).bit_length())
    if (1 << ln) <= len(syms):
        ln += 1
    counts = [0] * 16
    counts[ln - 1] = len(syms)
    codes = {s: (i, ln) for i, s in enumerate(syms)}
    return counts, bytes(syms), codes


def _block_symbols(blocks, qt, reset_every=0):
    """Quantized zigzag coefficients + (dc_syms, ac_syms, per-block
    token stream) for a sequence of 8x8 sample blocks.
    ``reset_every`` > 0 resets the DC predictor every that-many blocks
    (the per-component block count of one restart interval)."""
    stream, dc_syms, ac_syms, pred = [], [], [], 0
    for bi, blk in enumerate(blocks):
        if reset_every and bi and bi % reset_every == 0:
            pred = 0
        f = _B @ (blk.astype(np.float64) - 128.0) @ _B.T
        q = np.round(f / qt).astype(np.int64)
        zz = q.ravel()[_ZZ]
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        c = _cat(diff)
        dc_syms.append(c)
        toks = [("dc", c, diff)]
        run = 0
        nz = [k for k in range(1, 64) if zz[k] != 0]
        last = nz[-1] if nz else 0
        k = 1
        while k <= last:
            if zz[k] == 0:
                run += 1
                if run == 16:
                    ac_syms.append(0xF0)
                    toks.append(("ac", 0xF0, 0))
                    run = 0
            else:
                s = _cat(int(zz[k]))
                rs = (run << 4) | s
                ac_syms.append(rs)
                toks.append(("ac", rs, int(zz[k])))
                run = 0
            k += 1
        if last < 63:
            ac_syms.append(0x00)
            toks.append(("ac", 0x00, 0))
        stream.append(toks)
    return stream, dc_syms, ac_syms


def _seg(marker, body):
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def encode_baseline(planes, samplings, qval=1, restart_interval=0):
    """Independent baseline encoder: ``planes`` is a list of 2-D uint8
    component planes (already at their subsampled resolutions),
    ``samplings`` the (H, V) factors per component. Plane c must be
    (mcuy*8*V, mcux*8*H). ``restart_interval`` > 0 emits a DRI segment
    and RSTn markers every that-many MCUs with DC predictor resets —
    computed independently of the decoder's restart path."""
    qt = np.full((8, 8), qval, dtype=np.float64)
    hmax = max(h for h, _v in samplings)
    vmax = max(v for _h, v in samplings)
    mcux = planes[0].shape[1] // (8 * samplings[0][0])
    mcuy = planes[0].shape[0] // (8 * samplings[0][1])
    # interleave blocks in MCU order, but collect symbols per component
    per_comp_blocks = []
    for p, (sh, sv) in zip(planes, samplings):
        blocks = []
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(sv):
                    for bx in range(sh):
                        y0, x0 = (my * sv + by) * 8, (mx * sh + bx) * 8
                        blocks.append(p[y0:y0 + 8, x0:x0 + 8])
        per_comp_blocks.append(blocks)
    streams, dc_all, ac_all = [], [], []
    for blocks, (sh, sv) in zip(per_comp_blocks, samplings):
        st, dcs, acs = _block_symbols(
            blocks, qt,
            reset_every=restart_interval * sh * sv)
        streams.append(st)
        dc_all.extend(dcs)
        ac_all.extend(acs)
    dc_counts, dc_vals, dc_codes = _fixed_codes(dc_all)
    ac_counts, ac_vals, ac_codes = _fixed_codes(ac_all)
    w = _Writer()
    nb_per_mcu = [sh * sv for sh, sv in samplings]
    idx = [0] * len(planes)
    rst = 0
    for _m in range(mcux * mcuy):
        if restart_interval and _m and _m % restart_interval == 0:
            w.restart(rst)
            rst += 1
        for ci in range(len(planes)):
            for _b in range(nb_per_mcu[ci]):
                for kind, sym, val in streams[ci][idx[ci]]:
                    code, ln = (dc_codes if kind == "dc"
                                else ac_codes)[sym]
                    w.put(code, ln)
                    s = sym & 15 if kind == "ac" else sym
                    if s:
                        bits = val if val >= 0 else val + (1 << s) - 1
                        w.put(bits, s)
                idx[ci] += 1
    height = planes[0].shape[0] * vmax // (8 * samplings[0][1]) * 8
    width = planes[0].shape[1] * hmax // (8 * samplings[0][0]) * 8
    height = mcuy * 8 * vmax
    width = mcux * 8 * hmax
    dqt = _seg(0xDB, bytes([0]) + bytes(
        int(qt.ravel()[i]) for i in _ZZ))
    sof_body = bytes([8]) + height.to_bytes(2, "big") + \
        width.to_bytes(2, "big") + bytes([len(planes)])
    for ci, (sh, sv) in enumerate(samplings):
        sof_body += bytes([ci + 1, (sh << 4) | sv, 0])
    sos_body = bytes([len(planes)])
    for ci in range(len(planes)):
        sos_body += bytes([ci + 1, 0x00])
    sos_body += bytes([0, 63, 0])
    dri = (_seg(0xDD, restart_interval.to_bytes(2, "big"))
           if restart_interval else b"")
    return (b"\xff\xd8"
            + _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
            + dqt + _seg(0xC0, sof_body)
            + _seg(0xC4, bytes([0x00]) + bytes(dc_counts) + dc_vals)
            + _seg(0xC4, bytes([0x10]) + bytes(ac_counts) + ac_vals)
            + dri + _seg(0xDA, sos_body) + w.done() + b"\xff\xd9")


# ------------------------------------------------------------- fixtures

def test_grayscale_random_raster_roundtrip():
    rng = np.random.RandomState(7)
    plane = rng.randint(0, 256, (24, 40), dtype=np.uint8)
    payload = encode_baseline([plane.copy()], [(1, 1)])
    w, h, got = decode_baseline_jpeg(payload)
    assert (w, h) == (40, 24) and got.shape == (24, 40)
    err = np.abs(got.astype(int) - plane.astype(int))
    # unit quant tables: only coefficient rounding -> small bounded
    # error; a zigzag/huffman/DCT bug scrambles whole blocks
    assert err.max() <= 4 and err.mean() < 1.0, (err.max(), err.mean())


def test_grayscale_block_constant_is_exact():
    rng = np.random.RandomState(11)
    tiles = rng.randint(0, 256, (3, 5), dtype=np.uint8)
    plane = np.kron(tiles, np.ones((8, 8), dtype=np.uint8))
    payload = encode_baseline([plane], [(1, 1)])
    _w, _h, got = decode_baseline_jpeg(payload)
    assert (got == plane).all()


def test_ycbcr_420_luma_roundtrip():
    rng = np.random.RandomState(23)
    y = rng.randint(0, 256, (32, 48), dtype=np.uint8)
    cb = rng.randint(0, 256, (16, 24), dtype=np.uint8)
    cr = rng.randint(0, 256, (16, 24), dtype=np.uint8)
    payload = encode_baseline([y, cb, cr], [(2, 2), (1, 1), (1, 1)])
    w, h, got = decode_baseline_jpeg(payload)
    assert (w, h) == (48, 32)
    err = np.abs(got.astype(int) - y.astype(int))
    assert err.max() <= 4 and err.mean() < 1.0


def test_ycbcr_444_luma_roundtrip():
    rng = np.random.RandomState(29)
    y = rng.randint(0, 256, (16, 16), dtype=np.uint8)
    cb = np.full((16, 16), 99, dtype=np.uint8)
    cr = np.full((16, 16), 140, dtype=np.uint8)
    payload = encode_baseline([y, cb, cr],
                              [(1, 1), (1, 1), (1, 1)])
    w, h, got = decode_baseline_jpeg(payload)
    assert (w, h) == (16, 16)
    assert np.abs(got.astype(int) - y.astype(int)).max() <= 4


def test_decoder_rejects_unsupported_profiles():
    plane = np.zeros((8, 8), dtype=np.uint8)
    good = encode_baseline([plane], [(1, 1)])
    # progressive SOF2
    bad = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="non-baseline"):
        decode_baseline_jpeg(bad)
    # DRI with no boundary crossed (1 MCU, interval 8) is LEGAL now
    dri = b"\xff\xdd\x00\x04\x00\x08"
    sos_at = good.find(b"\xff\xda")
    _w, _h, _ = decode_baseline_jpeg(good[:sos_at] + dri + good[sos_at:])
    assert (_w, _h) == (8, 8)
    # truncations and garbage
    for payload in (b"", b"\xff\xd8", good[:40], b"GARBAGE",
                    good[:2] + good[4:]):
        with pytest.raises(ValueError):
            decode_baseline_jpeg(payload)


def test_decoder_dc_prediction_across_blocks():
    """A gradient image exercises nonzero DC diffs in every block and
    a long AC coefficient tail."""
    x = np.arange(48)[None, :] * 5
    y = np.arange(16)[:, None] * 3
    plane = ((x + y) % 256).astype(np.uint8)
    payload = encode_baseline([plane], [(1, 1)])
    _w, _h, got = decode_baseline_jpeg(payload)
    err = np.abs(got.astype(int) - plane.astype(int))
    assert err.max() <= 4 and err.mean() < 1.0


def test_empty_segment_bodies_raise_valueerror_not_indexerror():
    """Empty/short SOF0 and SOS bodies must raise ValueError — an
    IndexError would escape the multimodal per-row drop contract."""
    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    with pytest.raises(ValueError, match="SOF0"):
        decode_baseline_jpeg(b"\xff\xd8" + seg(0xC0, b""))
    with pytest.raises(ValueError, match="SOF0"):
        decode_baseline_jpeg(
            b"\xff\xd8" + seg(0xC0, bytes([8, 0, 8, 0, 8, 3, 1])))
    good_sof = bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0])
    with pytest.raises(ValueError, match="SOS"):
        decode_baseline_jpeg(
            b"\xff\xd8" + seg(0xC0, good_sof) + seg(0xDA, b""))


# --------------------------------------------------- restart markers (r14)

def test_restart_interval_grayscale_roundtrip():
    """Restart-interval baselines are standard camera output: encode
    with DRI=3 over a 4x5=20-MCU image (6 restart segments, predictor
    resets computed by the INDEPENDENT encoder) and require the same
    bounded error as the no-restart path."""
    rng = np.random.RandomState(31)
    plane = rng.randint(0, 256, (32, 40), dtype=np.uint8)
    payload = encode_baseline([plane.copy()], [(1, 1)],
                              restart_interval=3)
    assert b"\xff\xdd" in payload and b"\xff\xd0" in payload
    w, h, got = decode_baseline_jpeg(payload)
    assert (w, h) == (40, 32)
    err = np.abs(got.astype(int) - plane.astype(int))
    assert err.max() <= 4 and err.mean() < 1.0
    # and byte-identical result to the no-restart encoding's decode
    _, _, got_plain = decode_baseline_jpeg(
        encode_baseline([plane.copy()], [(1, 1)]))
    assert (got == got_plain).all()


def test_restart_interval_420_roundtrip():
    rng = np.random.RandomState(37)
    y = rng.randint(0, 256, (32, 48), dtype=np.uint8)
    cb = rng.randint(0, 256, (16, 24), dtype=np.uint8)
    cr = rng.randint(0, 256, (16, 24), dtype=np.uint8)
    payload = encode_baseline([y, cb, cr], [(2, 2), (1, 1), (1, 1)],
                              restart_interval=2)
    w, h, got = decode_baseline_jpeg(payload)
    assert (w, h) == (48, 32)
    err = np.abs(got.astype(int) - y.astype(int))
    assert err.max() <= 4 and err.mean() < 1.0


def test_restart_marker_malformations_rejected():
    rng = np.random.RandomState(41)
    plane = rng.randint(0, 256, (16, 32), dtype=np.uint8)
    good = encode_baseline([plane], [(1, 1)], restart_interval=2)
    # out-of-sequence RSTn
    bad = good.replace(b"\xff\xd0", b"\xff\xd5", 1)
    with pytest.raises(ValueError, match="sequence"):
        decode_baseline_jpeg(bad)
    # RSTn present but DRI stripped -> segment count mismatch
    dri_at = good.find(b"\xff\xdd")
    stripped = good[:dri_at] + good[dri_at + 6:]
    with pytest.raises(ValueError, match="segment count"):
        decode_baseline_jpeg(stripped)


def test_entropy_size_precondition_blocks_crafted_dims():
    """A header declaring huge dims with a tiny entropy payload must
    be rejected BEFORE the plane allocation (the ADVICE r13 537-MB
    float64 hazard)."""
    plane = np.full((8, 8), 130, dtype=np.uint8)
    good = encode_baseline([plane], [(1, 1)])
    sof_at = good.find(b"\xff\xc0")
    # rewrite declared dims to 8000x8000 (64 Mpx, just under the
    # round-15 2^26 cap — the r14 2^24 cap rejected real 24-50 MP
    # camera output, ADVICE r14 medium)
    body = bytearray(good[sof_at + 4:sof_at + 4 + 6])
    body[1:3] = (8000).to_bytes(2, "big")
    body[3:5] = (8000).to_bytes(2, "big")
    crafted = good[:sof_at + 4] + bytes(body) + good[sof_at + 10:]
    with pytest.raises(ValueError, match="entropy data too small"):
        decode_baseline_jpeg(crafted)
    # and over-cap dims still hit the dimension cap first
    body[1:3] = (8200).to_bytes(2, "big")
    body[3:5] = (8200).to_bytes(2, "big")
    crafted = good[:sof_at + 4] + bytes(body) + good[sof_at + 10:]
    with pytest.raises(ValueError, match="decode cap"):
        decode_baseline_jpeg(crafted)


def test_dc_only_fast_path_matches_full_transform():
    """r17 optimization pin: a DC-only block's scalar fast path (both
    decoders) must equal the full two-matmul / einsum IDCT bit-for-bit
    — with a single nonzero coefficient every sum collapses to
    (A[0,i]*fmat00)*A[0,j], whose row-0 constancy makes the block one
    scalar. Computed here explicitly per cell and compared to the
    decoded bytes over the full DC range."""
    from mktd6_flink_spark.functions.jpeg import (_A, decode_baseline_jpeg,
                                                  encode_dc_jpeg)
    from mktd6_flink_spark.functions.jpeg_progressive import (
        decode_progressive_jpeg, encode_dc_jpeg_progressive)

    vals = np.arange(256, dtype=np.int64).reshape(16, 16).astype(np.uint8)
    for enc, dec in ((encode_dc_jpeg, decode_baseline_jpeg),
                     (encode_dc_jpeg_progressive, decode_progressive_jpeg)):
        w, h, out = dec(enc(vals))
        assert (w, h) == (128, 128)  # one 8x8 block per input byte
        # reference: full matmul on the dequantized coefficient matrix
        for y in range(16):
            for x in range(16):
                v = int(vals[y, x])
                fmat = np.zeros((8, 8))
                fmat[0, 0] = 8.0 * (v - 128)  # DC-only encoder contract
                blk = _A.T @ fmat @ _A
                rect = out[y * 8:(y + 1) * 8, x * 8:(x + 1) * 8]
                ref = np.clip(np.round(blk), -128, 127).astype(
                    np.int64) + 128
                assert (rect == ref).all(), (y, x)
