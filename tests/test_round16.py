"""Round-16 additions: RGBA / gray+alpha / 16-bit PNG profiles, the
exact-integer white-composite rule, and the wide-sample corpus
builders' container dispatch."""

from __future__ import annotations

import re
import struct

import numpy as np
import pytest


def _clean(t):
    return re.sub(r"[^a-z0-9 ]+", "", (t or "").lower())


_TEXTS = {1: "alpha composite", 2: "", 3: None,
          4: "z" * 999, 5: "MIXED & punct?!", 6: "0" * 63}


def test_composite_over_white_is_exact_round_half_up():
    """The documented rule must equal round-half-up of the real-valued
    source-over blend for EVERY (c, a) pair — exhaustively."""
    from mktd6_flink_spark.functions.multimodal import (
        composite_over_white)

    c, a = np.meshgrid(np.arange(256), np.arange(256))
    got = composite_over_white(c, a)
    want = np.floor((c * a + 255.0 * (255 - a)) / 255.0 + 0.5)
    assert (got == want.astype(np.uint8)).all()
    # endpoints: opaque keeps c, transparent keeps white
    assert (composite_over_white(c[0], np.full(256, 255)) == c[0]).all()
    assert (composite_over_white(c[0], np.zeros(256, int)) == 255).all()


def test_rgba_corpus_profiles_and_feature_parity(spark):
    """Every payload must be a color-type-6 PNG, odd doc_ids
    interlaced; the decoded features must equal a straight NumPy
    recomputation from the cleaned text (composite + alpha lanes)."""
    from mktd6_flink_spark.functions import multimodal as mm

    docs = spark.createDataFrame(
        list(_TEXTS.items()), "doc_id long, text string")
    media = mm.png_rgba_media_from_documents(docs)
    for r in media.collect():
        p = bytes(r.payload)
        assert p[:8] == b"\x89PNG\r\n\x1a\n"
        w, h, depth, ctype, comp, filt, il = struct.unpack(
            ">IIBBBBB", p[16:29])
        assert (depth, ctype) == (8, 6)
        assert il == (r.media_id % 2)
    feats = {(r.media_id, r.channel, r.band): r.feat_micro
             for r in mm.decode_png_rgba_features(media).collect()}
    assert feats  # decodes happened
    for did, text in _TEXTS.items():
        clean = _clean(text)[:mm.RASTER_MAX_CHARS]
        hh = max(-(-len(clean) // mm.PGM_WIDTH), 1)
        v = np.zeros(hh * mm.PGM_WIDTH, dtype=np.int64)
        v[:len(clean)] = np.frombuffer(clean.encode(), np.uint8)
        band_len = v.size // mm.PGM_BANDS
        a = (v * 29 + 3) % 256
        chans = [v, 255 - v, (v * 37) % 256]
        for ch in range(4):
            plane = (a if ch == 3 else
                     (chans[ch] * a + 255 * (255 - a) + 127) // 255)
            sums = plane[:band_len * mm.PGM_BANDS].reshape(
                mm.PGM_BANDS, band_len).sum(axis=1)
            for b, s in enumerate(sums):
                assert feats[(did, ch, b)] == int(s) * 1_000_000 // band_len


def test_wide_gray_corpus_dispatch_and_parity(spark):
    """Even doc_ids must be depth-16 gray (type 0), odd 8-bit
    gray+alpha (type 4, opaque); both must decode to the SAME features
    as the plain 8-bit gray corpus for the same text."""
    from mktd6_flink_spark.functions import multimodal as mm

    docs = spark.createDataFrame(
        list(_TEXTS.items()), "doc_id long, text string")
    media = mm.png_gray16_media_from_documents(docs)
    for r in media.collect():
        p = bytes(r.payload)
        w, h, depth, ctype, comp, filt, il = struct.unpack(
            ">IIBBBBB", p[16:29])
        if r.media_id % 2 == 0:
            assert (depth, ctype) == (16, 0)
        else:
            assert (depth, ctype) == (8, 4)
        assert il == ((r.media_id // 2) % 2)
    wide = {(r.media_id, r.band): r.feat_micro
            for r in mm.decode_png_gray_wide_features(media).collect()}
    base = {(r.media_id, r.band): r.feat_micro
            for r in mm.decode_png(
                mm.png_media_from_documents(docs)).collect()}
    assert wide == base and len(wide) == len(_TEXTS) * mm.PGM_BANDS


def test_report_class3_png_plant_still_unsupported(spark):
    """Round 16 made gray+alpha a SUPPORTED profile; the report's
    class-3 PNG plant moved to compression method 1, which must keep
    failing as unsupported_profile for every document."""
    from mktd6_flink_spark.functions import multimodal as mm
    from mktd6_flink_spark.functions.png import (decode_png_gray,
                                                 encode_png_gray)

    grid = np.arange(8, dtype=np.uint8).reshape(2, 4)
    bad = mm._corrupt_for_report(encode_png_gray(grid), 3, "image_png")
    with pytest.raises(ValueError) as exc:
        decode_png_gray(bad)
    assert mm.classify_decode_error(str(exc.value)) == \
        "unsupported_profile"


# --------------------------- streaming label propagation (round 16)

def test_lpa_vote_step_batching_invariant():
    """The vote counter's final argmax must equal the brute-force
    count under ANY micro-batching (counts are additive; ties to the
    smallest label), with the per-key state bounded by the distinct
    label domain."""
    import pandas as pd

    from mktd6_flink_spark.streaming import stateful

    rng = np.random.RandomState(19)
    labels = [f"n{rng.randint(0, 7)}" for _ in range(200)]
    want_counts: dict = {}
    for lb in labels:
        want_counts[lb] = want_counts.get(lb, 0) + 1
    want = min(want_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    for trial in range(20):
        step = stateful.lpa_vote_step()
        state, last = None, None
        i = 0
        while i < len(labels):
            j = i + rng.randint(1, 40)
            out, state = step.vectorized(
                pd.DataFrame({"lbl": labels[i:j]}), state)
            last = out["lbl"][-1]
            i = j
        assert last == want
        assert dict(zip(state[0], state[1])) == want_counts
        assert len(state[0]) == len(want_counts)  # bounded state


def test_lpa_vote_step_tie_breaks_to_smallest_label():
    import pandas as pd

    from mktd6_flink_spark.streaming import stateful

    step = stateful.lpa_vote_step()
    out, state = step.vectorized(
        pd.DataFrame({"lbl": ["z", "a", "z", "a"]}), None)
    assert out["lbl"] == ["a"]


# ------------------------------ 24-bit + float32 WAV (round 16)

def test_wav_wide_payloads_verify_independently(spark):
    """24-bit lane: stdlib `wave` must open every payload as 3-byte
    mono and its frames must equal the v*0x010101 - 2^23 samples.
    float32 lane (stdlib wave has no float support): struct-parse the
    header independently and check the samples are exactly
    (v - 128) / 128 as float32."""
    import io
    import wave

    from mktd6_flink_spark.functions import multimodal as mm

    docs = spark.createDataFrame(
        list(_TEXTS.items()), "doc_id long, text string")
    rows = {r.media_id: bytes(r.payload)
            for r in mm.wav_wide_media_from_documents(docs).collect()}
    assert len(rows) == len(_TEXTS)
    for did, text in _TEXTS.items():
        clean = _clean(text)
        v = np.frombuffer(clean.encode(), np.uint8).astype(np.int64)
        if v.size == 0:
            v = np.zeros(1, dtype=np.int64)
        p = rows[did]
        if did % 2 == 0:
            with wave.open(io.BytesIO(p)) as wf:
                assert wf.getnchannels() == 1
                assert wf.getsampwidth() == 3
                assert wf.getframerate() == mm.WAV_RATE
                got = wf.readframes(wf.getnframes())
            want = v * 0x010101 - (1 << 23)
            b = (want + (1 << 24)) % (1 << 24)
            assert got == np.stack(
                [b & 255, (b >> 8) & 255, (b >> 16) & 255],
                axis=1).astype(np.uint8).tobytes()
        else:
            afmt, nch, rate, bits = (
                struct.unpack("<H", p[20:22])[0],
                struct.unpack("<H", p[22:24])[0],
                struct.unpack("<I", p[24:28])[0],
                struct.unpack("<H", p[34:36])[0])
            assert (afmt, nch, rate, bits) == (3, 1, mm.WAV_RATE, 32)
            f = np.frombuffer(p[44:], dtype="<f4")
            assert (f == ((v - 128) / 128.0).astype("<f4")).all()


def test_wav_wide_folds_recover_v_exactly():
    """Both wide folds must be bit-exact inverses of their embeddings
    for every byte value, and the float fold must clip its legal
    [-1, 1] endpoints sanely."""
    from mktd6_flink_spark.functions import multimodal as mm

    v = np.arange(256, dtype=np.int64)
    # 24-bit lane
    s = v * 0x010101 - (1 << 23)
    b = ((s + (1 << 24)) % (1 << 24)).astype(np.int64)
    data = np.stack([b & 255, (b >> 8) & 255, (b >> 16) & 255],
                    axis=1).astype(np.uint8).tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
           + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 24000, 3, 24)
           + b"data" + struct.pack("<I", len(data)))
    rate, u8 = mm._parse_wav(hdr + data)
    assert (u8 == v).all()
    # float32 lane
    f = ((v - 128) / 128.0).astype("<f4")
    data = f.tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
           + struct.pack("<IHHIIHH", 16, 3, 1, 8000, 32000, 4, 32)
           + b"data" + struct.pack("<I", len(data)))
    rate, u8 = mm._parse_wav(hdr + data)
    assert (u8 == v).all()
    # +1.0 clips to 255; NaN is a row-drop, not a crash
    one = np.array([1.0, -1.0], dtype="<f4").tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + 8) + b"WAVEfmt "
           + struct.pack("<IHHIIHH", 16, 3, 1, 8000, 32000, 4, 32)
           + b"data" + struct.pack("<I", 8))
    _, u8 = mm._parse_wav(hdr + one)
    assert u8.tolist() == [255, 0]
    nan = np.array([np.nan], dtype="<f4").tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + 4) + b"WAVEfmt "
           + struct.pack("<IHHIIHH", 16, 3, 1, 8000, 32000, 4, 32)
           + b"data" + struct.pack("<I", 4))
    with pytest.raises(ValueError, match="non-finite"):
        mm._parse_wav(hdr + nan)
    assert mm.classify_decode_error("non-finite float32 sample") == \
        "header_invalid"


def test_report_class3_wav_plant_still_unsupported():
    """Round 16 made 24-bit PCM a SUPPORTED width; the report's
    class-3 WAV plant moved to fmt code 2 (ADPCM), which must keep
    failing as unsupported_profile."""
    from mktd6_flink_spark.functions import multimodal as mm

    v = np.array([104, 105], dtype=np.int64)
    wav8 = (b"RIFF" + struct.pack("<I", 36 + 2) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
            + b"data" + struct.pack("<I", 2) + bytes([104, 105]))
    bad = mm._corrupt_for_report(wav8, 3, "audio_wav")
    with pytest.raises(ValueError) as exc:
        mm._parse_wav(bad)
    assert mm.classify_decode_error(str(exc.value)) == \
        "unsupported_profile"


def test_wav_wide_fuzz_valueerror_only():
    from mktd6_flink_spark.functions import multimodal as mm

    v = np.arange(64, dtype=np.int64)
    for afmt, width, data in (
            (1, 3, np.stack([(v) & 255, v, v], axis=1)
             .astype(np.uint8).tobytes()),
            (3, 4, ((v - 32) / 32.0).astype("<f4").tobytes())):
        good = (b"RIFF" + struct.pack("<I", 36 + len(data))
                + b"WAVEfmt "
                + struct.pack("<IHHIIHH", 16, afmt, 1, 8000,
                              8000 * width, width, width * 8)
                + b"data" + struct.pack("<I", len(data)) + data)
        mm._parse_wav(good)
        for cut in range(0, len(good), 5):
            try:
                mm._parse_wav(good[:cut])
            except ValueError:
                pass
        for i in range(0, len(good), 3):
            mut = bytearray(good)
            mut[i] ^= 0x81
            try:
                mm._parse_wav(bytes(mut))
            except ValueError:
                pass


# ------------------------------- palette + tRNS (round 16)

def test_pal_trns_corpus_equals_rgba_corpus_features(spark):
    """The PLTE+tRNS corpus must decode to EXACTLY the RGBA corpus's
    features (same derivations through a disjoint container path) —
    the property that lets the two entries share one oracle."""
    from mktd6_flink_spark.functions import multimodal as mm

    docs = spark.createDataFrame(
        list(_TEXTS.items()), "doc_id long, text string")
    a = {(r.media_id, r.channel, r.band): r.feat_micro
         for r in mm.decode_png_rgba_features(
             mm.png_rgba_media_from_documents(docs)).collect()}
    b = {(r.media_id, r.channel, r.band): r.feat_micro
         for r in mm.decode_png_rgba_features(
             mm.png_pal_trns_media_from_documents(docs),
             decoder_name="decode_png_palette_rgba").collect()}
    assert a == b and len(a) == len(_TEXTS) * 4 * mm.PGM_BANDS


def test_trns_short_table_defaults_opaque_and_fuzz():
    """Entries beyond the tRNS length must decode opaque (§4.2.1.1);
    an over-long tRNS is a row-drop; fuzz stays ValueError-only."""
    from mktd6_flink_spark.functions.png import (decode_png_palette_rgba,
                                                 encode_png_palette)

    rng = np.random.RandomState(29)
    idx = rng.randint(0, 16, (5, 6), dtype=np.uint8)
    pal = rng.randint(0, 256, (16, 3), dtype=np.uint8)
    tr = rng.randint(0, 256, 4, dtype=np.uint8)
    p = encode_png_palette(idx, pal, trns=tr)
    _, _, out = decode_png_palette_rgba(p)
    want_a = np.concatenate([tr, np.full(12, 255, np.uint8)])
    assert (out[:, :, 3] == want_a[idx]).all()
    assert (out[:, :, :3] == pal[idx]).all()
    for cut in range(0, len(p), 9):
        try:
            decode_png_palette_rgba(p[:cut])
        except ValueError:
            pass
    for i in range(0, len(p), 5):
        mut = bytearray(p)
        mut[i] ^= 0x42
        try:
            decode_png_palette_rgba(bytes(mut))
        except ValueError:
            pass


# ------------------------------ G.711 mu-law WAV (round 16)

def test_ulaw_expansion_matches_independent_bitfield_form():
    """The arithmetic expansion in _parse_wav must equal an
    independent bit-field implementation (Sun reference style:
    mask-and-or mantissa assembly, table-free) for all 256 codes, and
    monotonicity must hold within each sign half."""
    from mktd6_flink_spark.functions import multimodal as mm

    def ref(code):  # independent: bit-ops, no shared subexpressions
        u = code ^ 0xFF
        exp = (u & 0x70) >> 4
        mant = u & 0x0F
        mag = ((0x21 + 2 * mant) << exp) - 0x21
        mag *= 4
        return -mag if u & 0x80 else mag

    hdr = (b"RIFF" + struct.pack("<I", 36 + 256) + b"WAVEfmt "
           + struct.pack("<IHHIIHH", 16, 7, 1, 8000, 8000, 1, 8)
           + b"data" + struct.pack("<I", 256))
    _, u8 = mm._parse_wav(hdr + bytes(range(256)))
    for c in range(256):
        assert u8[c] == (ref(c) + 32768) >> 8, c
    # code 0xFF is silence (+0-ish), code 0x7F most negative? sanity:
    assert u8[255] == 127 or u8[255] == 128  # near midpoint


def test_ulaw_corpus_parity_and_header(spark):
    """Builder payloads must carry fmt code 7 and the decoded clip
    features must equal a straight NumPy recomputation."""
    from mktd6_flink_spark.functions import multimodal as mm

    docs = spark.createDataFrame(
        list(_TEXTS.items()), "doc_id long, text string")
    rows = {r.media_id: bytes(r.payload)
            for r in mm.wav_ulaw_media_from_documents(docs).collect()}
    feats = {r.media_id: r for r in mm.decode_wav(
        mm.wav_ulaw_media_from_documents(docs)).collect()}
    for did, text in _TEXTS.items():
        p = rows[did]
        assert struct.unpack("<H", p[20:22])[0] == 7
        clean = _clean(text)
        v = np.frombuffer(clean.encode(), np.uint8).astype(np.int64)
        if v.size == 0:
            v = np.zeros(1, dtype=np.int64)
        u = 255 - v
        t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
        pcm = np.where(u & 0x80, 0x84 - t, t - 0x84)
        u8 = (pcm + 32768) >> 8
        r = feats[did]
        assert r.n_samples == v.size
        assert r.mean_micro == int(u8.sum()) * 1_000_000 // v.size
        assert r.peak == int(u8.max())


def test_ulaw_rejects_wrong_widths():
    from mktd6_flink_spark.functions import multimodal as mm

    hdr = (b"RIFF" + struct.pack("<I", 36 + 2) + b"WAVEfmt "
           + struct.pack("<IHHIIHH", 16, 7, 1, 8000, 16000, 2, 16)
           + b"data" + struct.pack("<I", 2) + b"\x00\x00")
    with pytest.raises(ValueError, match="unsupported"):
        mm._parse_wav(hdr)


def test_alaw_expansion_matches_sun_reference():
    """The arithmetic A-law expansion must equal the Sun reference
    implementation (switch-style, table-free) for all 256 codes —
    including the polarity inversion vs mu-law (sign bit SET means
    POSITIVE in A-law)."""
    from mktd6_flink_spark.functions import multimodal as mm

    def ref(a_val):  # Sun alaw2linear, verbatim control flow
        a_val ^= 0x55
        t = (a_val & 0x0F) << 4
        seg = (a_val & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        return t if (a_val & 0x80) else -t

    hdr = (b"RIFF" + struct.pack("<I", 36 + 256) + b"WAVEfmt "
           + struct.pack("<IHHIIHH", 16, 6, 1, 8000, 8000, 1, 8)
           + b"data" + struct.pack("<I", 256))
    _, u8 = mm._parse_wav(hdr + bytes(range(256)))
    for c in range(256):
        assert u8[c] == (ref(c) + 32768) >> 8, c


def test_alaw_corpus_header_and_builder(spark):
    from mktd6_flink_spark.functions import multimodal as mm

    docs = spark.createDataFrame(
        list(_TEXTS.items()), "doc_id long, text string")
    for r in mm.wav_alaw_media_from_documents(docs).collect():
        p = bytes(r.payload)
        assert struct.unpack("<H", p[20:22])[0] == 6
        assert struct.unpack("<H", p[34:36])[0] == 8
