"""Cross-validate the progressive JPEG decoder against an INDEPENDENT
progressive encoder written directly from T.81 Annex G in this file:
spectral-selection bands, successive approximation (point transform on
DC by arithmetic shift, on AC by magnitude shift), EOB-run coding,
refinement correction bits (libjpeg-style buffered-bit ordering derived
from the spec's decoder procedure), and restart markers. Agreement on
random rasters requires both sides to implement Annex G exactly; the
final reconstruction is compared against a DIRECT dequantize+IDCT of
the same quantized coefficients (and, for MCU-aligned frames, against
the baseline decoder fed the baseline encoding of the same planes)."""

from __future__ import annotations

import numpy as np
import pytest

from mktd6_flink_spark.functions.jpeg import decode_baseline_jpeg
from mktd6_flink_spark.functions.jpeg_progressive import (
    decode_jpeg_any, decode_progressive_jpeg, encode_dc_jpeg_progressive)
from tests.test_jpeg import _B, _cat, _fixed_codes, _seg, _Writer, _ZZ
from tests.test_jpeg import encode_baseline


# ------------------------------------------- independent prog encoder

class _Tokens:
    """Scan token stream: Huffman symbols + raw bit runs, collected
    first so the scan's canonical table can be built from its own
    symbol statistics before writing."""

    def __init__(self):
        self.toks = []
        self.syms = []

    def sym(self, s):
        self.toks.append(("sym", s))
        self.syms.append(s)

    def raw(self, v, n):
        if n:
            self.toks.append(("raw", v, n))


def _comp_coeffs(planes, samplings, qval):
    """Quantized zigzag coefficients [bh, bw, 64] per component over
    each padded plane's full block grid."""
    out = []
    qt = float(qval)
    for p in planes:
        bh, bw = p.shape[0] // 8, p.shape[1] // 8
        cz = np.zeros((bh, bw, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bw):
                blk = p[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                f = _B @ (blk.astype(np.float64) - 128.0) @ _B.T
                q = np.round(f / qt).astype(np.int64)
                cz[by, bx] = q.ravel()[_ZZ]
        out.append(cz)
    return out


def _tight_dims(w, h, samplings, ci):
    hmax = max(sh for sh, _ in samplings)
    vmax = max(sv for _, sv in samplings)
    sh, sv = samplings[ci]
    cw = -(-w * sh // hmax)
    ch = -(-h * sv // vmax)
    return -(-ch // 8), -(-cw // 8)


def _dc_first_tokens(coeffs, samplings, scan_comps, al, mcux, mcuy,
                     w, h, interval):
    """DC first pass: diffs of (dc >> al), interleaved MCU order when
    the scan holds several components, tight raster order when one.
    Returns a token stream per restart interval."""
    runs, t = [], _Tokens()
    preds = {ci: 0 for ci in scan_comps}
    unit = 0

    def block(ci, by, bx):
        nonlocal t
        hi = int(coeffs[ci][by, bx, 0]) >> al
        diff = hi - preds[ci]
        preds[ci] = hi
        c = _cat(diff)
        t.sym(c)
        t.raw(diff if diff >= 0 else diff + (1 << c) - 1, c)

    def maybe_restart():
        nonlocal t, unit
        if interval and unit and unit % interval == 0:
            runs.append(t)
            t = _Tokens()
            preds.update({ci: 0 for ci in scan_comps})
        unit += 1

    if len(scan_comps) > 1:
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                for ci in scan_comps:
                    sh, sv = samplings[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            block(ci, my * sv + by, mx * sh + bx)
    else:
        ci = scan_comps[0]
        bh, bw = _tight_dims(w, h, samplings, ci)
        for u in range(bh * bw):
            maybe_restart()
            block(ci, u // bw, u % bw)
    runs.append(t)
    return runs


def _dc_refine_tokens(coeffs, samplings, scan_comps, al, mcux, mcuy,
                      w, h, interval):
    runs, t = [], _Tokens()
    unit = 0

    def maybe_restart():
        nonlocal t, unit
        if interval and unit and unit % interval == 0:
            runs.append(t)
            t = _Tokens()
        unit += 1

    def block(ci, by, bx):
        t.raw((int(coeffs[ci][by, bx, 0]) >> al) & 1, 1)

    if len(scan_comps) > 1:
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                for ci in scan_comps:
                    sh, sv = samplings[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            block(ci, my * sv + by, mx * sh + bx)
    else:
        ci = scan_comps[0]
        bh, bw = _tight_dims(w, h, samplings, ci)
        for u in range(bh * bw):
            maybe_restart()
            block(ci, u // bw, u % bw)
    runs.append(t)
    return runs


def _ac_first_tokens(cz, ss, se, al, bh, bw, interval):
    """AC first pass over one component's tight grid: run-length +
    EOB-run coding of toward-zero shifted magnitudes."""
    runs = []
    units = [(u // bw, u % bw) for u in range(bh * bw)]
    chunks = ([units[i:i + interval]
               for i in range(0, len(units), interval)]
              if interval else [units])
    for chunk in chunks:
        t = _Tokens()
        eobrun = 0

        def flush(t=t):
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                t.sym(r << 4)
                t.raw(eobrun - (1 << r), r)
                eobrun = 0

        for by, bx in chunk:
            band = cz[by, bx]
            vals = []
            for k in range(ss, se + 1):
                c = int(band[k])
                mag = abs(c) >> al
                vals.append(mag if c >= 0 else -mag)
            nz = [i for i, v in enumerate(vals) if v]
            if not nz:
                eobrun += 1
                if eobrun == 32767:
                    flush()
                continue
            flush()
            run = 0
            for i in range(nz[-1] + 1):
                v = vals[i]
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    t.sym(0xF0)
                    run -= 16
                s = _cat(v)
                t.sym((run << 4) | s)
                t.raw(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if nz[-1] < len(vals) - 1:
                eobrun += 1
                if eobrun == 32767:
                    flush()
        flush()
        runs.append(t)
    return runs


def _ac_refine_tokens(cz, ss, se, al, bh, bw, interval):
    """AC refinement pass (decoder-procedure inverse): newly
    significant coefficients (shifted magnitude exactly 1) emit
    (run << 4) | 1 + a sign bit; already-nonzero coefficients passed
    on the way buffer one correction bit each, appended after the
    next symbol; blocks ending in a zero-run or pending corrections
    extend the EOB run, whose flush appends the buffered bits."""
    runs = []
    units = [(u // bw, u % bw) for u in range(bh * bw)]
    chunks = ([units[i:i + interval]
               for i in range(0, len(units), interval)]
              if interval else [units])
    for chunk in chunks:
        t = _Tokens()
        eobrun = 0
        brbuf: list[int] = []

        def flush(t=t):
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                t.sym(r << 4)
                t.raw(eobrun - (1 << r), r)
            for b in brbuf:
                t.raw(b, 1)
            brbuf.clear()
            eobrun = 0

        for by, bx in chunk:
            band = cz[by, bx]
            absv, sgn = [], []
            eob = -1
            for i, k in enumerate(range(ss, se + 1)):
                c = int(band[k])
                m = abs(c) >> al
                absv.append(m)
                sgn.append(1 if c >= 0 else -1)
                if m == 1:
                    eob = i
            r = 0
            pend: list[int] = []
            for i, m in enumerate(absv):
                if m == 0:
                    r += 1
                    continue
                while r > 15 and i <= eob:
                    flush()
                    t.sym(0xF0)
                    r -= 16
                    for b in pend:
                        t.raw(b, 1)
                    pend = []
                if m > 1:
                    pend.append(m & 1)
                    continue
                flush()
                t.sym((r << 4) | 1)
                t.raw(1 if sgn[i] > 0 else 0, 1)
                for b in pend:
                    t.raw(b, 1)
                pend = []
                r = 0
            if r > 0 or pend:
                eobrun += 1
                brbuf.extend(pend)
                if eobrun == 32767:
                    flush()
        flush()
        runs.append(t)
    return runs


def encode_progressive(planes, samplings, w, h, script, qval=1,
                       restart_interval=0):
    """Independent progressive encoder. ``script`` entries:
    ("dc", [comp indices], ah, al) or ("ac", ci, ss, se, ah, al).
    Tables are rebuilt (id 0) and re-emitted before every scan from
    that scan's own symbol statistics."""
    coeffs = _comp_coeffs(planes, samplings, qval)
    hmax = max(sh for sh, _ in samplings)
    vmax = max(sv for _, sv in samplings)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    qt_zz = bytes([0]) + bytes([qval] * 64)
    sof_body = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([len(planes)])
    for ci, (sh, sv) in enumerate(samplings):
        sof_body += bytes([ci + 1, (sh << 4) | sv, 0])
    out = b"\xff\xd8" + _seg(0xDB, qt_zz) + _seg(0xC2, sof_body)
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    for spec in script:
        if spec[0] == "dc":
            _, comps_in, ah, al = spec
            if ah == 0:
                runs = _dc_first_tokens(coeffs, samplings, comps_in,
                                        al, mcux, mcuy, w, h,
                                        restart_interval)
            else:
                runs = _dc_refine_tokens(coeffs, samplings, comps_in,
                                         al, mcux, mcuy, w, h,
                                         restart_interval)
            tclass = 0
            sos_body = bytes([len(comps_in)])
            for ci in comps_in:
                sos_body += bytes([ci + 1, 0x00])
            sos_body += bytes([0, 0, (ah << 4) | al])
        else:
            _, ci, ss, se, ah, al = spec
            bh, bw = _tight_dims(w, h, samplings, ci)
            fn = _ac_first_tokens if ah == 0 else _ac_refine_tokens
            runs = fn(coeffs[ci], ss, se, al, bh, bw, restart_interval)
            tclass = 1
            sos_body = bytes([1, ci + 1, 0x00, ss, se, (ah << 4) | al])
        syms = [s for t in runs for s in t.syms]
        wtr = _Writer()
        if syms:
            counts, vals, codes = _fixed_codes(syms)
            out += _seg(0xC4, bytes([tclass << 4])
                        + bytes(counts) + vals)
        else:
            codes = {}
        for i, t in enumerate(runs):
            if i:
                wtr.restart(i - 1)
            for tok in t.toks:
                if tok[0] == "sym":
                    code, ln = codes[tok[1]]
                    wtr.put(code, ln)
                else:
                    wtr.put(tok[1], tok[2])
        out += _seg(0xDA, sos_body) + wtr.done()
    return out + b"\xff\xd9"


def _direct_luma(planes, samplings, w, h, qval):
    """Independent ground truth: dequantized IDCT of the luma plane's
    quantized coefficients, rounded/clipped, cropped to (h, w)."""
    cz = _comp_coeffs(planes[:1], samplings[:1], qval)[0]
    bh, bw = cz.shape[:2]
    plane = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
    inv = np.zeros(64, dtype=np.int64)
    inv[_ZZ] = np.arange(64)
    for by in range(bh):
        for bx in range(bw):
            f = (cz[by, bx][inv].reshape(8, 8).astype(np.float64)
                 * qval)
            sp = _B.T @ f @ _B
            plane[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = np.clip(
                np.round(sp) + 128, 0, 255).astype(np.uint8)
    return plane[:h, :w]


_FULL_GRAY_SCRIPT = [
    ("dc", [0], 0, 2), ("dc", [0], 2, 1), ("dc", [0], 1, 0),
    ("ac", 0, 1, 5, 0, 1), ("ac", 0, 6, 63, 0, 1),
    ("ac", 0, 1, 5, 1, 0), ("ac", 0, 6, 63, 1, 0),
]


@pytest.mark.parametrize("qval", [1, 2, 8, 50])
def test_progressive_grayscale_equals_direct_reconstruction(qval):
    """Full spectral-selection + successive-approximation script on a
    random grayscale raster: the progressive decode must equal the
    independent dequantize+IDCT of the same coefficients (higher qval
    = sparser coefficients = heavier EOB-run exercise)."""
    rng = np.random.RandomState(qval)
    plane = rng.randint(0, 256, (24, 40), dtype=np.uint8)
    p = encode_progressive([plane], [(1, 1)], 40, 24,
                           _FULL_GRAY_SCRIPT, qval=qval)
    w, h, got = decode_progressive_jpeg(p)
    assert (w, h) == (40, 24)
    assert (got == _direct_luma([plane], [(1, 1)], 40, 24, qval)).all()


def test_progressive_equals_baseline_on_same_coefficients():
    """MCU-aligned 4:2:0 color frame: the progressive decode and the
    baseline decode of the SAME planes must agree bit-for-bit (both
    reconstruct identical quantized coefficients)."""
    rng = np.random.RandomState(11)
    y = rng.randint(0, 256, (32, 32), dtype=np.uint8)
    cb = rng.randint(0, 256, (16, 16), dtype=np.uint8)
    cr = rng.randint(0, 256, (16, 16), dtype=np.uint8)
    samp = [(2, 2), (1, 1), (1, 1)]
    script = [
        ("dc", [0, 1, 2], 0, 1),
        ("ac", 0, 1, 5, 0, 1), ("ac", 1, 1, 63, 0, 0),
        ("ac", 2, 1, 63, 0, 1),
        ("dc", [0, 1, 2], 1, 0),
        ("ac", 0, 6, 63, 0, 1),
        ("ac", 0, 1, 5, 1, 0), ("ac", 0, 6, 63, 1, 0),
        ("ac", 2, 1, 63, 1, 0),
    ]
    p = encode_progressive([y, cb, cr], samp, 32, 32, script, qval=2)
    b = encode_baseline([y, cb, cr], samp, qval=2)
    wp, hp, gp = decode_progressive_jpeg(p)
    wb, hb, gb = decode_baseline_jpeg(b)
    assert (wp, hp) == (wb, hb) == (32, 32)
    assert (gp == gb).all()


def test_progressive_non_aligned_tight_grid():
    """20x12 4:2:0: the luma tight grid (3x2 blocks) is smaller than
    the MCU-padded grid (4x2) — AC scans must traverse the TIGHT
    grid while the interleaved DC scan covers the padded one."""
    rng = np.random.RandomState(13)
    y = rng.randint(0, 256, (16, 32), dtype=np.uint8)
    cb = rng.randint(0, 256, (8, 16), dtype=np.uint8)
    cr = rng.randint(0, 256, (8, 16), dtype=np.uint8)
    samp = [(2, 2), (1, 1), (1, 1)]
    script = [
        ("dc", [0, 1, 2], 0, 0),
        ("ac", 0, 1, 63, 0, 0), ("ac", 1, 1, 63, 0, 0),
        ("ac", 2, 1, 63, 0, 0),
    ]
    p = encode_progressive([y, cb, cr], samp, 20, 12, script, qval=1)
    w, h, got = decode_progressive_jpeg(p)
    assert (w, h) == (20, 12)
    assert (got == _direct_luma([y, cb, cr], samp, 20, 12, 1)).all()


def test_progressive_restart_markers():
    """DRI + RSTn inside progressive scans: DC predictors and EOB runs
    must reset at every restart boundary."""
    rng = np.random.RandomState(17)
    plane = rng.randint(0, 256, (24, 24), dtype=np.uint8)
    script = [("dc", [0], 0, 1), ("dc", [0], 1, 0),
              ("ac", 0, 1, 63, 0, 0)]
    p = encode_progressive([plane], [(1, 1)], 24, 24, script, qval=8,
                           restart_interval=2)
    w, h, got = decode_progressive_jpeg(p)
    assert (w, h) == (24, 24)
    assert (got == _direct_luma([plane], [(1, 1)], 24, 24, 8)).all()


def test_dc_only_progressive_builder_matches_baseline_builder():
    """The corpus builder twin: encode_dc_jpeg_progressive decodes to
    exactly the same tile values as the baseline DC-only encoder —
    the property that lets sql_decode_jpeg stay the oracle."""
    from mktd6_flink_spark.functions.jpeg import encode_dc_jpeg

    rng = np.random.RandomState(19)
    vals = rng.randint(0, 256, (9, 16), dtype=np.uint8)
    _, _, prog = decode_progressive_jpeg(encode_dc_jpeg_progressive(vals))
    _, _, base = decode_baseline_jpeg(encode_dc_jpeg(vals))
    assert (prog == base).all()
    assert (prog[4::8, 4::8] == vals).all()


def test_decode_jpeg_any_dispatch():
    from mktd6_flink_spark.functions.jpeg import encode_dc_jpeg

    vals = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20
    for enc in (encode_dc_jpeg, encode_dc_jpeg_progressive):
        w, h, plane = decode_jpeg_any(enc(vals))
        assert (plane[4::8, 4::8] == vals).all()
    with pytest.raises(ValueError):
        decode_jpeg_any(b"\xff\xd8\xff\xd9")
    with pytest.raises(ValueError):
        decode_jpeg_any(b"not a jpeg")


def test_progressive_error_contract():
    rng = np.random.RandomState(23)
    plane = rng.randint(0, 256, (16, 16), dtype=np.uint8)
    good = encode_progressive([plane], [(1, 1)], 16, 16,
                              _FULL_GRAY_SCRIPT)
    # baseline decoder must REJECT a progressive frame and vice versa
    with pytest.raises(ValueError, match="non-baseline"):
        decode_baseline_jpeg(good)
    base = encode_baseline([plane], [(1, 1)])
    with pytest.raises(ValueError, match="not a progressive"):
        decode_progressive_jpeg(base)
    # an AC scan arriving before any DC scan
    bad = encode_progressive([plane], [(1, 1)], 16, 16,
                             [("ac", 0, 1, 63, 0, 0)])
    with pytest.raises(ValueError, match="first scan must be DC"):
        decode_progressive_jpeg(bad)
    # crafted huge dims with a tiny payload: rejected pre-allocation
    sof_at = good.find(b"\xff\xc2")
    body = bytearray(good[sof_at + 4:sof_at + 4 + 6])
    body[1:3] = (8000).to_bytes(2, "big")
    body[3:5] = (8000).to_bytes(2, "big")
    crafted = good[:sof_at + 4] + bytes(body) + good[sof_at + 10:]
    with pytest.raises(ValueError, match="entropy data too small"):
        decode_progressive_jpeg(crafted)
    body[1:3] = (8200).to_bytes(2, "big")
    body[3:5] = (8200).to_bytes(2, "big")
    crafted = good[:sof_at + 4] + bytes(body) + good[sof_at + 10:]
    with pytest.raises(ValueError, match="decode cap"):
        decode_progressive_jpeg(crafted)


def test_progressive_fuzz_valueerror_only():
    """Truncations and bit flips over a full progressive payload must
    stay inside the ValueError drop-per-row contract."""
    rng = np.random.RandomState(29)
    plane = rng.randint(0, 256, (16, 24), dtype=np.uint8)
    good = encode_progressive([plane], [(1, 1)], 24, 16,
                              _FULL_GRAY_SCRIPT, qval=4)
    for cut in range(0, len(good), 11):
        try:
            decode_progressive_jpeg(good[:cut])
        except ValueError:
            pass
    for i in range(0, len(good), 7):
        mut = bytearray(good)
        mut[i] ^= 0x24
        try:
            decode_jpeg_any(bytes(mut))
        except ValueError:
            pass


def test_refinement_zrl_and_correction_bit_ordering():
    """Deterministic crafted-coefficient block pinning the three
    hardest refinement behaviors at once: a ZRL inside a refinement
    scan (>15 zero-history positions before a newly-significant
    coefficient), a correction bit for an already-nonzero coefficient
    INTERLEAVED into that zero-run walk, and an EOB-region correction
    bit after the last newly-significant position. Random-raster tests
    cannot guarantee this shape arises; this one asserts the encoder
    actually emitted the ZRL, then round-trips."""
    # zigzag-position coefficients (qval = 1): pos 5 -> 3 (significant
    # in the al=1 first pass, refinement correction bit 1), pos 30 ->
    # 1 (newly significant in the al=0 refinement, 28 zero-history
    # positions before it -> ZRL + (12<<4)|1), pos 40 -> 2
    # (significant in first pass, correction bit 0 lands in the EOB
    # region after pos 30).
    cz = np.zeros((1, 1, 64), dtype=np.int64)
    cz[0, 0, 0] = -24   # DC, exercised at al=1 with one refinement bit
    cz[0, 0, 5] = 3
    cz[0, 0, 30] = 1
    cz[0, 0, 40] = 2

    # assemble the scan streams directly from the crafted coefficients
    # (planes cannot target exact quantized values), using the same
    # token machinery the random tests validate
    scans = [
        ("dc0", _dc_first_tokens([cz], [(1, 1)], [0], 1, 1, 1, 8, 8, 0),
         bytes([1, 1, 0x00, 0, 0, (0 << 4) | 1]), 0),
        ("dc1", _dc_refine_tokens([cz], [(1, 1)], [0], 0, 1, 1, 8, 8, 0),
         bytes([1, 1, 0x00, 0, 0, (1 << 4) | 0]), 0),
        ("ac0", _ac_first_tokens(cz, 1, 63, 1, 1, 1, 0),
         bytes([1, 1, 0x00, 1, 63, (0 << 4) | 1]), 1),
        ("ac1", _ac_refine_tokens(cz, 1, 63, 0, 1, 1, 0),
         bytes([1, 1, 0x00, 1, 63, (1 << 4) | 0]), 1),
    ]
    refine_syms = [t for tok in scans[3][1] for t in tok.syms]
    assert 0xF0 in refine_syms, "crafted block must force a ZRL"
    assert any((s & 15) == 1 and (s >> 4) > 0 for s in refine_syms)

    qt_zz = bytes([0]) + bytes([1] * 64)
    sof = (bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
           + bytes([1, 1, 0x11, 0]))
    out = b"\xff\xd8" + _seg(0xDB, qt_zz) + _seg(0xC2, sof)
    for _name, runs, sos_body, tclass in scans:
        syms = [s for t in runs for s in t.syms]
        wtr = _Writer()
        codes = {}
        if syms:
            counts, vals, codes = _fixed_codes(syms)
            out += _seg(0xC4, bytes([tclass << 4]) + bytes(counts)
                        + vals)
        for t in runs:
            for tok in t.toks:
                if tok[0] == "sym":
                    code, ln = codes[tok[1]]
                    wtr.put(code, ln)
                else:
                    wtr.put(tok[1], tok[2])
        out += _seg(0xDA, sos_body) + wtr.done()
    out += b"\xff\xd9"

    w, h, got = decode_progressive_jpeg(out)
    assert (w, h) == (8, 8)
    inv = np.zeros(64, dtype=np.int64)
    inv[_ZZ] = np.arange(64)
    f = cz[0, 0][inv].reshape(8, 8).astype(np.float64)
    want = np.clip(np.round(_B.T @ f @ _B) + 128, 0, 255).astype(
        np.uint8)
    assert (got == want).all()


def test_dc_predictor_overflow_rejected_as_valueerror():
    """r15 advisory: a crafted DC-first scan of repeated category-11
    max diffs at Al=13 pushes the unbounded Python-int predictor past
    int32 — the int32 coefficient-plane store would OverflowError on
    NumPy >= 2.0 (escaping the drop-per-row contract) or silently wrap
    on 1.x. The decoder must reject it as a plain ValueError, and the
    attrition taxonomy must classify it (never 'other')."""
    from mktd6_flink_spark.functions.multimodal import (
        classify_decode_error)

    counts, vals, codes = _fixed_codes([11])
    w = _Writer()
    for _block in range(4):               # 4 blocks = 8x32 image
        code, ln = codes[11]
        w.put(code, ln)
        w.put((1 << 11) - 1, 11)          # diff = +2047 every block
    sof = (bytes([8]) + (8).to_bytes(2, "big")       # h = 8
           + (32).to_bytes(2, "big")                 # w = 32
           + bytes([1, 1, 0x11, 0]))
    sos = bytes([1, 1, 0x00, 0, 0, (0 << 4) | 13])   # DC first, Al=13
    payload = (b"\xff\xd8"
               + _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
               + _seg(0xC2, sof)
               + _seg(0xC4, bytes([0x00]) + bytes(counts) + vals)
               + _seg(0xDA, sos) + w.done()
               + b"\xff\xd9")
    with pytest.raises(ValueError, match="DC predictor out of range"):
        decode_progressive_jpeg(payload)
    assert classify_decode_error(
        "DC predictor out of range") == "header_invalid"


# ------------------------- DRI x progressive compose (round 16)

@pytest.mark.parametrize("interval", [1, 2, 3, 5, 7])
def test_full_script_with_restarts_equals_direct(interval):
    """The full spectral-selection + successive-approximation script
    under restart markers: every scan kind — DC first, DC refine, AC
    first, AC refine — must reset its predictor/EOB-run state at each
    boundary, including intervals that land MID-EOB-RUN (interval 1
    forces a reset before every unit)."""
    rng = np.random.RandomState(53 + interval)
    plane = rng.randint(0, 256, (24, 40), dtype=np.uint8)
    p = encode_progressive([plane], [(1, 1)], 40, 24,
                           _FULL_GRAY_SCRIPT, qval=8,
                           restart_interval=interval)
    w, h, got = decode_progressive_jpeg(p)
    assert (w, h) == (40, 24)
    assert (got == _direct_luma([plane], [(1, 1)], 40, 24, 8)).all()


def test_color_420_with_restarts_equals_baseline():
    """4:2:0 color + DRI in BOTH codings: the progressive decode with
    restarts must equal the baseline decode with restarts of the same
    planes (each resets per its own unit geometry — MCUs for the
    interleaved DC scan, tight-grid blocks for per-component AC
    scans)."""
    rng = np.random.RandomState(59)
    y = rng.randint(0, 256, (32, 32), dtype=np.uint8)
    cb = rng.randint(0, 256, (16, 16), dtype=np.uint8)
    cr = rng.randint(0, 256, (16, 16), dtype=np.uint8)
    samp = [(2, 2), (1, 1), (1, 1)]
    script = [
        ("dc", [0, 1, 2], 0, 1),
        ("ac", 0, 1, 5, 0, 1), ("ac", 1, 1, 63, 0, 0),
        ("ac", 2, 1, 63, 0, 1),
        ("dc", [0, 1, 2], 1, 0),
        ("ac", 0, 6, 63, 0, 1),
        ("ac", 0, 1, 5, 1, 0), ("ac", 0, 6, 63, 1, 0),
        ("ac", 2, 1, 63, 1, 0),
    ]
    p = encode_progressive([y, cb, cr], samp, 32, 32, script, qval=2,
                           restart_interval=3)
    b = encode_baseline([y, cb, cr], samp, qval=2, restart_interval=3)
    wp, hp, gp = decode_progressive_jpeg(p)
    wb, hb, gb = decode_baseline_jpeg(b)
    assert (gp == gb).all() and (wp, hp) == (wb, hb) == (32, 32)


def test_non_aligned_restarts_progressive():
    """Non-MCU-aligned frame + restarts: the AC scans' restart count
    derives from the TIGHT grid, the DC scan's from the MCU grid —
    a mismatch in either direction must have failed loudly at encode
    parity time."""
    rng = np.random.RandomState(61)
    y = rng.randint(0, 256, (16, 32), dtype=np.uint8)
    cb = rng.randint(0, 256, (8, 16), dtype=np.uint8)
    cr = rng.randint(0, 256, (8, 16), dtype=np.uint8)
    samp = [(2, 2), (1, 1), (1, 1)]
    script = [
        ("dc", [0, 1, 2], 0, 0),
        ("ac", 0, 1, 63, 0, 0), ("ac", 1, 1, 63, 0, 0),
        ("ac", 2, 1, 63, 0, 0),
    ]
    p = encode_progressive([y, cb, cr], samp, 20, 12, script, qval=1,
                           restart_interval=2)
    w, h, got = decode_progressive_jpeg(p)
    assert (w, h) == (20, 12)
    assert (got == _direct_luma([y, cb, cr], samp, 20, 12, 1)).all()


def test_decode_jpeg_any_dispatches_restarted_progressive():
    from mktd6_flink_spark.functions.jpeg_progressive import (
        decode_jpeg_any)

    rng = np.random.RandomState(67)
    plane = rng.randint(0, 256, (16, 16), dtype=np.uint8)
    p = encode_progressive([plane], [(1, 1)], 16, 16,
                           _FULL_GRAY_SCRIPT, qval=4,
                           restart_interval=2)
    w, h, got = decode_jpeg_any(p)
    assert (got == _direct_luma([plane], [(1, 1)], 16, 16, 4)).all()


def test_restarted_progressive_fuzz_valueerror_only():
    """Truncations and bit flips over a restart-marked progressive
    payload (RST bytes included) must stay ValueError-only."""
    rng = np.random.RandomState(71)
    plane = rng.randint(0, 256, (16, 24), dtype=np.uint8)
    good = encode_progressive([plane], [(1, 1)], 24, 16,
                              _FULL_GRAY_SCRIPT, qval=4,
                              restart_interval=2)
    assert b"\xff\xd0" in good or b"\xff\xd1" in good  # RSTn present
    for cut in range(0, len(good), 11):
        try:
            decode_progressive_jpeg(good[:cut])
        except ValueError:
            pass
    for i in range(0, len(good), 7):
        mut = bytearray(good)
        mut[i] ^= 0x24
        try:
            decode_progressive_jpeg(bytes(mut))
        except ValueError:
            pass
