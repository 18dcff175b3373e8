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
