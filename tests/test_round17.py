"""Round-17 unit tests: IMA-ADPCM WAV decode (fmt 0x11).

Cross-validation strategy: CPython's ``audioop.adpcm2lin`` implements
the same published DVI/IMA recurrence (step table, index table, int16
clamp) but consumes the HIGH nibble of each byte first, while IMA WAV
blocks are low-nibble-first — so swapping nibbles per byte turns it
into an independent reference decoder that shares no code with
_parse_wav. Gated behind an import-try (audioop left the stdlib in
3.13)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from mktd6_flink_spark.functions import multimodal as mm

try:
    import audioop  # stdlib until 3.12
except ImportError:  # pragma: no cover
    audioop = None


def _wav_adpcm(blocks: list[tuple[int, int, bytes]],
               block_align: int | None = None) -> bytes:
    """Assemble an IMA-ADPCM WAV from (predictor, index, data) blocks."""
    body = b"".join(struct.pack("<hBB", p, i, 0) + d
                    for p, i, d in blocks)
    if block_align is None:
        block_align = 4 + max(len(d) for _, _, d in blocks)
    spb = (block_align - 4) * 2 + 1
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, 8000,
                      8000 * block_align // spb, block_align, 4, 2,
                      spb)
    return (b"RIFF" + (4 + 8 + len(fmt) + 8 + len(body))
            .to_bytes(4, "little") + b"WAVEfmt "
            + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(body).to_bytes(4, "little") + body)


def _swap_nibbles(data: bytes) -> bytes:
    return bytes(((b & 0x0F) << 4) | (b >> 4) for b in data)


@pytest.mark.skipif(audioop is None, reason="audioop removed")
def test_adpcm_audioop_crosscheck_all_byte_values():
    """One block containing every byte value (so every nibble pair,
    including all sign nibbles) decodes identically to the stdlib's
    independent DVI/IMA implementation."""
    data = bytes(range(256))
    rate, u8 = mm._parse_wav(_wav_adpcm([(0, 0, data)]))
    assert rate == 8000
    assert u8.size == 1 + 2 * 256
    ref, _ = audioop.adpcm2lin(_swap_nibbles(data), 2, (0, 0))
    ref16 = np.frombuffer(ref, dtype="<i2").astype(np.int64)
    assert (u8[1:] == ((ref16 + 32768) >> 8)).all()
    assert u8[0] == 128  # header predictor 0 is sample 0


@pytest.mark.skipif(audioop is None, reason="audioop removed")
def test_adpcm_block_reset_and_short_final_block():
    """Blocks reset the (predictor, index) state from their headers —
    including a mid-table start index and a nonzero predictor — and a
    short final block decodes by its actual byte count."""
    rng = np.random.RandomState(17)
    d1 = rng.randint(0, 256, 60, dtype=np.uint8).tobytes()
    d2 = rng.randint(0, 256, 23, dtype=np.uint8).tobytes()
    blocks = [(1234, 40, d1), (-2000, 88, d2)]
    payload = _wav_adpcm(blocks, block_align=64)
    _, u8 = mm._parse_wav(payload)
    assert u8.size == 2 + 2 * (60 + 23)
    want = []
    for pred, idx, d in blocks:
        want.append((pred + 32768) >> 8)
        ref, _ = audioop.adpcm2lin(_swap_nibbles(d), 2, (pred, idx))
        want.extend((s + 32768) >> 8 for s in
                    np.frombuffer(ref, dtype="<i2").astype(np.int64))
    assert (u8 == np.asarray(want)).all()


def test_adpcm_clamps():
    """A run of +max nibbles (7) pins the predictor at 32767 and the
    index at 88; a run of -max nibbles (15) pins -32768 and keeps the
    index at 88 (adjust +8 clamped)."""
    up = bytes([0x77] * 40)      # both nibbles 7: +diff, index +8
    _, u8 = mm._parse_wav(_wav_adpcm([(0, 0, up)]))
    assert u8[-1] == (32767 + 32768) >> 8
    down = bytes([0xFF] * 40)    # both nibbles 15: -diff, index +8
    _, u8d = mm._parse_wav(_wav_adpcm([(0, 0, down)]))
    assert u8d[-1] == 0


def test_adpcm_error_contract():
    data = bytes(range(40))
    good = _wav_adpcm([(0, 0, data)])
    cases = [
        # block align < 4 (fmt body offset 12:14 inside the payload:
        # RIFF(12) + 'fmt '+size(8) + 12)
        (good[:32] + (3).to_bytes(2, "little") + good[34:],
         "block align", "header_invalid"),
        # step index byte > 88: block header byte 2 sits right after
        # 'data'+size
        (good[:good.find(b"data") + 10] + b"\x59"
         + good[good.find(b"data") + 11:],
         "step index", "header_invalid"),
    ]
    for payload, match, reason in cases:
        with pytest.raises(ValueError, match=match) as exc:
            mm._parse_wav(payload)
        assert mm.classify_decode_error(str(exc.value)) == reason
    # short final block: 3 trailing data bytes after a full block
    # cannot hold the 4-byte block header
    short = _wav_adpcm([(0, 0, data)], block_align=44)
    trimmed = bytearray(short + b"\x01\x02\x03")
    trimmed[4:8] = (len(trimmed) - 8).to_bytes(4, "little")
    at = short.find(b"data")
    trimmed[at + 4:at + 8] = (44 + 3).to_bytes(4, "little")
    with pytest.raises(ValueError, match="truncated ADPCM") as exc:
        mm._parse_wav(bytes(trimmed))
    assert mm.classify_decode_error(str(exc.value)) == "truncated"
    # stereo ADPCM: a real layout (4-byte channel chunks) we do not
    # decode — must land in unsupported_profile, not decode wrongly
    stereo = bytearray(good)
    stereo[22:24] = (2).to_bytes(2, "little")
    with pytest.raises(ValueError, match="unsupported encoding") as exc:
        mm._parse_wav(bytes(stereo))
    assert mm.classify_decode_error(str(exc.value)) == \
        "unsupported_profile"
    # MS ADPCM (fmt code 2, the attrition plant) must stay unsupported
    ms = bytearray(good)
    ms[20:22] = (2).to_bytes(2, "little")
    with pytest.raises(ValueError, match="unsupported encoding"):
        mm._parse_wav(bytes(ms))


def test_adpcm_fuzz_valueerror_only():
    rng = np.random.RandomState(23)
    good = _wav_adpcm([(0, 0, rng.randint(0, 256, 60,
                                          dtype=np.uint8).tobytes())])
    for cut in range(0, len(good), 5):
        try:
            mm._parse_wav(good[:cut])
        except ValueError:
            pass
    for i in range(len(good)):
        mut = bytearray(good)
        mut[i] ^= 0x5A
        try:
            mm._parse_wav(bytes(mut))
        except ValueError:
            pass


def test_adpcm_builder_layout(spark):
    """The corpus builder's payloads parse back to exactly
    nb + 2*len(clean) samples, block b starting at index (b*11)%89;
    empty text is one header-only block (1 sample of 128)."""
    docs = spark.createDataFrame(
        [(0, "the quick brown fox " * 12), (1, ""), (2, None)],
        "doc_id long, text string")
    rows = {r["media_id"]: bytes(r["payload"]) for r in
            mm.wav_adpcm_media_from_documents(docs).collect()}
    clean = "the quick brown fox " * 12
    dcap = mm.ADPCM_BLOCK - 4
    nb = -(-len(clean) // dcap)
    _, u8 = mm._parse_wav(rows[0])
    assert u8.size == nb + 2 * len(clean)
    for b in range(nb):
        off = rows[0].find(b"data") + 8 + b * mm.ADPCM_BLOCK
        assert rows[0][off + 2] == (b * 11) % 89
    for did in (1, 2):
        _, u8e = mm._parse_wav(rows[did])
        assert u8e.tolist() == [128]


# ---------------- shift-invariant audio dedup (round 17)

def test_afp_landmarks_shift_invariance(spark):
    """The landmark trigram hash set is invariant under time shifts:
    a prepended AND an appended block leave every interior landmark
    trigram intact (positions enter the hash only as gaps), so the
    original's hashes are a subset of the shifted clip's — exactly
    the property afp_wav's n-relative windows lack (0/40, documented
    since r12)."""
    base = ("sphinx of black quartz judge my vow 123 pack my box "
            "with five dozen liquor jugs 456 how vexingly quick "
            "daft zebras jump 789 the five boxing wizards jump "
            "quickly over two dozen lazy dogs")
    docs = spark.createDataFrame(
        [(0, base),
         (1, base + " qq appended suffix qq"),
         (2, "zz prepended prefix zz " + base)],
        "doc_id long, text string")
    fp = mm.afp_landmarks(mm.wav_media_from_documents(docs))
    rows = fp.collect()
    hs = {d: set() for d in (0, 1, 2)}
    for r in rows:
        hs[r["media_id"]].add(r["h"])
    assert len(hs[0]) > 20
    assert hs[0] <= hs[1]
    assert hs[0] <= hs[2]


def test_audio_dedup_shift_planted_recall(spark):
    """Pinned recall: ALL 80 planted shifted copies (40 appended-
    suffix + 40 prepended-prefix) are recovered at sf0.001 — the
    plant family the window fingerprint measures 0/40 on."""
    from mktd6_flink_spark.plans import driver_queries as dq

    out = dq.QUERIES["mm_audio_dedup_shift"](
        spark, "/root/testdata/sf0.001").collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in out}
    planted = {(a, b) for a, b in pairs
               if b - a in (20000, 40000) and a < 40}
    assert len(planted) == 80


# ------------- vectorized state steps (round 17, verdict task 5)

def _parity_over_chunkings(step_factory, pdf, trials=15, seed=11):
    """The vectorized path must emit the BIT-EXACT sequence of the
    per-row fold under any chunking (the engine hands one sorted
    batch, but state carries across micro-batches)."""
    import pandas as pd

    rng = np.random.RandomState(seed)
    scalar = step_factory()
    state = None
    want: list[dict] = []
    for row in pdf.to_dict("records"):
        state, out = scalar(state, row)
        if out is None:
            continue
        if isinstance(out, list):
            want.extend(out)
        else:
            want.append(out)
    for _ in range(trials):
        vec = step_factory().vectorized
        state, got = None, []
        i = 0
        while i < len(pdf):
            j = i + int(rng.randint(1, 60))
            cols, state = vec(pdf.iloc[i:j].reset_index(drop=True),
                              state)
            if cols:
                keys = list(cols)
                got.extend(dict(zip(keys, vals))
                           for vals in zip(*(cols[k] for k in keys)))
            i = j
        assert got == want


def test_running_sum_step_vectorized_parity():
    import pandas as pd

    from mktd6_flink_spark.streaming import stateful

    rng = np.random.RandomState(3)
    pdf = pd.DataFrame({"value": rng.randn(400) * 7.3})
    _parity_over_chunkings(stateful.running_sum_step, pdf)


def test_latest_side_value_step_vectorized_parity():
    import pandas as pd

    from mktd6_flink_spark.streaming import stateful

    rng = np.random.RandomState(5)
    n = 400
    pdf = pd.DataFrame({
        "_side": rng.choice(["L", "R"], n, p=[0.7, 0.3]),
        "v": rng.randn(n) * 11.1,
        "event_id": np.arange(n),
    })
    _parity_over_chunkings(
        lambda: stateful.latest_side_value_step(id_col="event_id"),
        pdf)


def test_ema_combiner_step_vectorized_parity():
    import pandas as pd

    from mktd6_flink_spark.streaming import stateful

    rng = np.random.RandomState(7)
    n = 400
    pdf = pd.DataFrame({
        "_side": rng.choice(["L", "R"], n),
        "v": rng.randn(n) * 3.7 + 5,
        "event_id": np.arange(n),
    })
    _parity_over_chunkings(
        lambda: stateful.ema_combiner_step(id_col="event_id"), pdf)


def test_bubble_burst_step_vectorized_parity():
    import pandas as pd

    from mktd6_flink_spark.streaming import stateful

    rng = np.random.RandomState(9)
    n = 400
    pdf = pd.DataFrame({
        "value": np.cumsum(rng.randn(n)) + 50,
        "rand": rng.rand(n),
    })
    _parity_over_chunkings(stateful.bubble_burst_step, pdf)


def test_wav_trailing_junk_after_declared_riff_is_ignored():
    """Wild WAVs commonly carry trailing non-RIFF bytes after the
    declared FORM (ID3 tags, padding). The chunk walk is bounded by
    riff_size, so an intact payload decodes identically with any
    suffix appended; a chunk overrunning the DECLARED span raises."""
    good = _wav_adpcm([(0, 0, bytes(range(16)))])
    rate, u8 = mm._parse_wav(good)
    for junk in (b"TAG" + b"\x00" * 125, b"\xff" * 8, b"A"):
        rate2, u8b = mm._parse_wav(good + junk)
        assert rate2 == rate
        assert np.array_equal(u8b, u8)
    data_at = good.find(b"data")
    over = (good[:data_at + 4] + (10 ** 5).to_bytes(4, "little")
            + good[data_at + 8:])
    with pytest.raises(ValueError, match="truncated"):
        mm._parse_wav(over)


def test_lpa_partial_counts_resolve_matches_vote_step(spark):
    """The r17 streaming-LPA stage shape (per-micro-batch JVM partial
    counts in the sink, resolve = SUM partials per (node, lbl) then
    argmax with ties to the smallest label) must equal the r16
    stateful ``lpa_vote_step`` fold under ANY micro-batching — the
    additive-merge law the step's own property test pins, now checked
    against the native SQL resolve expression itself."""
    import pandas as pd
    from pyspark.sql import functions as F

    from mktd6_flink_spark.streaming import stateful

    rng = np.random.RandomState(17)
    for trial in range(5):
        n = 300
        votes = pd.DataFrame({
            "node": [f"n{rng.randint(12)}" for _ in range(n)],
            "lbl": [f"l{rng.randint(4)}" for _ in range(n)],
        })
        # reference: the r16 step folded over one chunking
        step = stateful.lpa_vote_step()
        expect = {}
        for node, g in votes.groupby("node"):
            state = None
            for s in np.array_split(g, rng.randint(1, 6)):
                if len(s) == 0:
                    continue
                out, state = step.vectorized(s, state)
            expect[node] = out["lbl"][0]
        # candidate: per-batch partial counts + the SQL resolve
        cuts = np.sort(rng.choice(n, rng.randint(1, 7), replace=False))
        partials = [
            b.groupby(["node", "lbl"], as_index=False).size()
            .rename(columns={"size": "cnt"})
            for b in np.array_split(votes, cuts) if len(b)]
        got = {
            r["node"]: r["lbl"]
            for r in (spark.createDataFrame(pd.concat(partials))
                      .groupBy("node", "lbl")
                      .agg(F.sum("cnt").alias("cnt"))
                      .groupBy("node")
                      .agg(F.min_by(
                          "lbl",
                          F.struct((-F.col("cnt")).alias("nc"),
                                   F.col("lbl").alias("lb")))
                           .alias("lbl"))
                      .collect())}
        assert got == expect


def test_lpa_resolve_tie_breaks_to_smallest_label(spark):
    """Equal vote counts resolve to the lexicographically smallest
    label — the batch twin's (and the oracle's) deterministic order."""
    import pandas as pd
    from pyspark.sql import functions as F

    partials = pd.DataFrame({
        "node": ["a", "a", "a", "a"],
        "lbl": ["z", "b", "z", "b"],
        "cnt": [1, 1, 1, 1],
    })
    row = (spark.createDataFrame(partials)
           .groupBy("node", "lbl").agg(F.sum("cnt").alias("cnt"))
           .groupBy("node")
           .agg(F.min_by("lbl", F.struct((-F.col("cnt")).alias("nc"),
                                         F.col("lbl").alias("lb")))
                .alias("lbl"))
           .collect())
    assert row[0]["lbl"] == "b"
