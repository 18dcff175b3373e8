"""Brute-force property tests for the round-11 operators.

The cross-engine gate already pins Spark == DuckDB; these pin the
operator == an INDEPENDENT textbook formulation:

* cep_step (events_cep_pattern / streaming_cep_pattern) == a recursive
  "earliest-ending match, then skip past it" scan with an O(n^3)
  eligibility search — the definitional form of Flink's
  followedBy().within(W) + skipPastLastEvent, with none of the
  operator's two-monotone-timestamp compression;
* span_dedup_report's island arithmetic == a direct position-set union
  over duplicated k-gram intervals in Python.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mktd6_flink_spark.streaming.stateful import cep_step

CEP_W = 15


def _fold_cep(seq, w=CEP_W):
    """Run the operator's fold over [(t, ty)] rows."""
    step = cep_step(w)
    state, out = None, []
    for t, ty in seq:
        state, o = step(state, {"t_us": t, "ty": ty})
        if o is not None:
            out.append((o["start_us"], o["end_us"]))
    return out


def _brute_cep(seq, w=CEP_W):
    """Independent reference: repeatedly find the EARLIEST purchase
    completing signup < click < purchase with t_p - t_s <= w using
    events at index >= i, emit (latest eligible in-window signup,
    purchase), then continue strictly after the purchase."""
    out, i, n = [], 0, len(seq)
    while i < n:
        found = None
        for p in range(i, n):
            if seq[p][1] != 3:
                continue
            cand = [seq[s][0]
                    for s in range(i, p)
                    for c in range(s + 1, p)
                    if seq[s][1] == 1 and seq[c][1] == 2
                    and seq[p][0] - seq[s][0] <= w]
            if cand:
                found = (p, max(cand))
                break
        if found is None:
            break
        p, start = found
        out.append((start, seq[p][0]))
        i = p + 1
    return out


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(1, 6)),
                max_size=40))
def test_cep_step_matches_bruteforce(tys_gaps):
    t, seq = 0, []
    for ty, gap in tys_gaps:
        t += gap  # strictly increasing ts: no tie ambiguity
        seq.append((t, ty))
    assert _fold_cep(seq) == _brute_cep(seq)


def test_cep_fresher_signup_case():
    """The case a single-anchor automaton gets wrong: S1, then S2 while
    S1's partial is 'active', C, P — P is in S2's window but not S1's.
    Flink's NFA (and this operator) emit the S2 match."""
    seq = [(0, 1), (10, 1), (12, 2), (20, 3)]
    assert _fold_cep(seq) == [(10, 20)]


def _brute_spans(token_lists, k=3, min_count=2):
    """Position-set union reference for span_dedup_report."""
    from collections import Counter

    grams = Counter()
    per_doc = []
    for toks in token_lists:
        gs = [tuple(toks[i:i + k]) for i in range(len(toks) - k + 1)]
        per_doc.append(gs)
        grams.update(gs)
    out = []
    for toks, gs in zip(token_lists, per_doc):
        covered = set()
        for i, g in enumerate(gs):
            if grams[g] >= min_count:
                covered.update(range(i, i + k))
        spans = 0
        prev = None
        for p in sorted(covered):
            if prev is None or p > prev + 1:
                spans += 1
            prev = p
        out.append((len(toks), len(covered), spans))
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(token_lists=st.lists(
    st.lists(st.sampled_from("ab"), max_size=12),
    min_size=1, max_size=6))
def test_span_dedup_matches_position_set_union(spark, token_lists):
    from mktd6_flink_spark.functions.dedup import span_dedup_report

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(token_lists)],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["n_spans"])
           for r in span_dedup_report(df, k=3).collect()}
    want = dict(enumerate(_brute_spans(token_lists, k=3)))
    assert got == want


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(token_lists=st.lists(
    st.lists(st.sampled_from("ab"), max_size=12),
    min_size=1, max_size=5))
def test_span_scrub_rebuilds_uncovered_text(spark, token_lists):
    import hashlib

    from collections import Counter

    from mktd6_flink_spark.functions.dedup import span_scrub

    k = 3
    grams = Counter(tuple(toks[i:i + k])
                    for toks in token_lists
                    for i in range(len(toks) - k + 1))
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(token_lists)],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["kept_tokens"], r["scrub_md5"])
           for r in span_scrub(df, k=k).collect()}
    for i, toks in enumerate(token_lists):
        covered = {p for j in range(len(toks) - k + 1)
                   if grams[tuple(toks[j:j + k])] >= 2
                   for p in range(j, j + k)}
        kept = [t for p, t in enumerate(toks) if p not in covered]
        md5 = hashlib.md5(" ".join(kept).encode()).hexdigest()
        assert got[i] == (len(kept), md5), (i, toks)


def test_batch_engine_folds_across_arrow_chunks(spark):
    """apply_per_event_batch rides mapInPandas over partition-sorted
    chunks (round 11); a key spanning SEVERAL Arrow chunks must carry
    (step, state) across the boundary — the exact bug class the
    streaming engine hit at round 8 (per-chunk folds silently broke
    order-sensitive state). Force tiny chunks and check both the
    scalar fold and the vectorized path against a sequential
    reference, interleaving two keys so boundaries land mid-key."""
    from mktd6_flink_spark.streaming.stateful import (
        apply_per_event_batch, running_cents_step)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "37")
    try:
        rows = [(f"k{i % 2}", i, i, (i * 7) % 50 - 10)
                for i in range(1000)]
        df = spark.createDataFrame(
            rows, "key string, ts long, event_id long, _c long"
        ).coalesce(1)
        out = apply_per_event_batch(
            df, ["key"], ["ts", "event_id"], running_cents_step,
            "key string, event_id long, running_sum double")
        got = {(r["key"], r["event_id"]): r["running_sum"]
               for r in out.collect()}
        acc = {}
        want = {}
        for key, ts, eid, c in rows:  # already in (ts, event_id) order
            acc[key] = acc.get(key, 0) + c
            want[(key, eid)] = acc[key] / 100.0
        assert got == want
        # scalar-fold path: the CEP automaton's state (not vectorized)
        # must survive the same mid-key chunk boundaries
        ty_rows = [(f"k{i % 2}", i * 3, i, 1 + (i // 2) % 3)
                   for i in range(600)]
        tdf = spark.createDataFrame(
            ty_rows, "key string, t_us long, event_id long, ty int")
        out2 = apply_per_event_batch(
            tdf, ["key"], ["t_us", "event_id"],
            lambda: cep_step(10 ** 9),
            "key string, match_n int, start_us long, end_us long")
        got2 = sorted((r["key"], r["match_n"], r["start_us"], r["end_us"])
                      for r in out2.collect())
        want2 = []
        for key in ("k0", "k1"):
            seq = sorted((t, ty) for k2, t, _, ty in ty_rows
                         if k2 == key)
            for n, (s, e) in enumerate(_fold_cep(seq, 10 ** 9), 1):
                want2.append((key, n, s, e))
        assert got2 == sorted(want2)
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_parse_p5_is_a_real_netpbm_parser():
    """_parse_p5 must parse a P5 file built BY HAND (not by our own
    generator), and reject malformed payloads instead of fabricating
    output."""
    import numpy as np
    import pytest

    from mktd6_flink_spark.functions.multimodal import _parse_p5

    raster = bytes(range(12))
    w, h, arr = _parse_p5(b"P5\n4 3\n255\n" + raster)
    assert (w, h) == (4, 3)
    assert arr.tolist() == list(range(12))
    # comments-free whitespace variants the spec allows
    w, h, arr = _parse_p5(b"P5 4\n3 255\t" + raster)
    assert (w, h, arr.sum()) == (4, 3, sum(range(12)))
    with pytest.raises(ValueError):
        _parse_p5(b"P6\n4 3\n255\n" + raster)          # wrong magic
    with pytest.raises(ValueError):
        _parse_p5(b"P5\n4 3\n255\n" + raster[:5])       # truncated
    with pytest.raises(ValueError):
        _parse_p5(b"P5\n4 3\n65535\n" + raster)         # wide maxval
    del np


def test_pgm_roundtrip_features_and_resize(spark):
    """Generator -> REAL parse -> features/resize equals a direct
    numpy reference computed from the cleaned text bytes."""
    import numpy as np

    from mktd6_flink_spark.functions import multimodal as mm

    texts = ["hello world 123", "", None, "Z!@#", "a" * 200]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    media = mm.pgm_media_from_documents(df)
    dec = {}
    for r in mm.decode_pgm(media).collect():
        dec.setdefault(r["media_id"], {})[r["band"]] = r
    rez = {r["media_id"]: r for r in mm.resize_pgm(media).collect()}
    for i, t in enumerate(texts):
        clean = "".join(ch for ch in (t or "").lower()
                        if ch.isascii() and (ch.isalnum() or ch == " "))
        n = len(clean)
        h = max(-(-n // 64), 1)
        raster = np.zeros(64 * h, dtype=np.int64)
        raster[:n] = [ord(c) for c in clean]
        band = 64 * h // 8
        feats = [int(raster[b * band:(b + 1) * band].sum())
                 * 1_000_000 // band for b in range(8)]
        assert sorted(dec[i]) == list(range(8))
        assert [dec[i][b]["feat_micro"] for b in range(8)] == feats
        assert all(dec[i][b]["height"] == h for b in range(8))
        img = raster.reshape(h, 64)
        rows = (np.arange(16) * h) // 16
        cols = (np.arange(16) * 64) // 16
        assert rez[i]["checksum"] == int(img[np.ix_(rows, cols)].sum())


def _fold_absence(seq, w=CEP_W):
    from mktd6_flink_spark.streaming.stateful import cep_absence_step

    step = cep_absence_step(w)
    state, out = None, []
    for t, ty in seq:
        state, o = step(state, {"t_us": t, "ty": ty})
        if o is not None:
            out.append((o["signup_us"], o["outcome"], o["resolve_us"]))
    return out


def _brute_absence(seq, w=CEP_W):
    """Independent reference: scan signups in order; a signup is
    TRACKED iff no earlier tracked signup is still pending at its ts;
    a tracked signup converts on the first purchase within (t0, t0+w]
    ... i.e. strictly after it in sequence with t - t0 <= w, else
    churns at t0 + w PROVIDED some later event (incl. the sentinel)
    proves the deadline passed."""
    out, pend = [], None
    for idx, (t, ty) in enumerate(seq):
        if pend is not None and t - pend > w:
            out.append((pend, "churned", pend + w))
            pend = None
        if ty == 1 and pend is None:
            pend = t
        elif ty == 3 and pend is not None:
            out.append((pend, "converted", t))
            pend = None
    return out


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(st.sampled_from([0, 1, 3]), st.integers(1, 6)),
                max_size=40))
def test_cep_absence_matches_reference(tys_gaps):
    t, seq = 0, []
    for ty, gap in tys_gaps:
        t += gap
        seq.append((t, ty))
    seq.append((t + 1, 0))  # corpus-end sentinel, like the entry
    got = _fold_absence(seq)
    want = _brute_absence(seq)
    assert got == want
    # invariants: one outcome per tracked signup, churn deadline exact
    for s, o, r in got:
        assert (o == "churned" and r == s + CEP_W) or \
               (o == "converted" and 0 < r - s <= CEP_W)


def test_absence_fold_adversarial_chunk_boundaries(spark):
    """The batch engine carries (step, state) across Arrow chunk
    boundaries AND resets it at key boundaries — the adversarial
    layout is a key whose rows END EXACTLY at a chunk boundary (so
    the next chunk opens on a fresh key: stale state would leak a
    pending signup into it) plus a hot key spanning >= 3 chunks, on
    the ABSENCE automaton whose per-key END-OF-CORPUS sentinel row is
    the very row sitting on the boundary. Verified against the
    independent brute-force scan."""
    from mktd6_flink_spark.streaming.stateful import (
        apply_per_event_batch, cep_absence_step)

    chunk = 37
    seqs = {}

    def mk(key, n_events):
        # deterministic signup/purchase/noise mix with windows that
        # straddle arbitrary boundaries; ends with the ty=0 sentinel
        t, seq = 0, []
        for i in range(n_events - 1):
            t += 1 + (i * 13) % 7
            seq.append((t, (1, 3, 2, 1, 3)[(i * 5 + len(key)) % 5]))
        seq.append((t + 1, 0))
        seqs[key] = seq

    mk("a", 2 * chunk)       # ends EXACTLY at the 74-row boundary;
                             # its sentinel is the boundary row
    mk("b", 4 * chunk + 5)   # hot key spanning >= 4 chunks
    mk("c", 11)              # trailing short key after the hot one
    rows = [(k, t, i, ty) for k, seq in seqs.items()
            for i, (t, ty) in enumerate(seq)]
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                   str(chunk))
    try:
        df = spark.createDataFrame(
            rows, "key string, t_us long, event_id long, ty int"
        ).coalesce(1)
        out = apply_per_event_batch(
            df, ["key"], ["t_us", "event_id"],
            lambda: cep_absence_step(CEP_W),
            "key string, signup_us long, outcome string, "
            "resolve_us long")
        got = {}
        for r in out.collect():
            got.setdefault(r["key"], []).append(
                (r["signup_us"], r["outcome"], r["resolve_us"]))
        for key, seq in seqs.items():
            assert got.get(key, []) == _brute_absence(seq), key
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old)
