#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Methodology:
- Each query materializes fully via the no-op sink (format("noop")) so we
  measure scan → compute → shuffle without driver-collect overhead.
- INTERLEAVED PASSES (round-10 protocol): the panel runs REPEATS (3)
  full passes — pass order A, B(reversed), A — and each query reports
  the MEDIAN of its per-pass timings. The old protocol ran each head's
  3 reps back-to-back, so all of a head's samples shared one panel
  position and one JVM-heap phase: round 9 measured the NO-OP floor
  sentinel 1.24x slower and 26 unchanged heads 1.15-1.67x slower purely
  because the panel had grown — correlated samples can't separate code
  regressions from environment drift. Reversing the order on the middle
  pass decorrelates panel position; the median then samples three
  different heap/GC phases. Same total executions (heads x REPEATS).
- Variance is REPORTED, not hidden: "spread" carries each head's
  (max - min) across passes and "floor_per_pass" the sentinel's timing
  in every pass — a regression claim is only credible when the delta
  exceeds both the head's own spread and the floor drift.
- DENSE FLOOR SERIES (round-17 protocol): the sentinel additionally
  runs UNTIMED-panel at the START and END of every pass —
  "floor_series" carries the [pre, post] pair per pass (6 samples per
  recording on top of the in-panel head's 3). r16's single-sample-per-
  pass floor spread was ±14% WITHIN one recording, making single-floor
  normalization ambiguous; with a bracketing pair per pass, a head's
  per-pass ratio normalizes against the mean of ITS OWN pass's
  bracket, separating code regressions from mid-recording VM drift
  without burning isolated A/B runs. The bracket runs are excluded
  from every total/subtotal (they are calibration, not panel).
- "streaming_floor" is a SENTINEL, not an operator: file source →
  passthrough → memory sink over the same events file. It measures the
  irreducible streaming-machinery cost (source listing, planning, state
  runtime startup, sink) that every streaming_* entry pays regardless of
  its operator; subtract it to compare a streaming entry against its
  batch twin (the SCALING.md decomposition, now measured per-round).
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))

# Headliners: the scan/agg/join TPC-H set, the reference's core stateful
# fold, window + running-sum operators, and the LLM-pipeline big hitters.
#
# PANEL POLICY (round 16, the r15 verdict's task 8): the panel is
# CAPPED at 80 heads — 76 heads x 3 ABA passes already cost ~11 min of
# driver bench, and unbounded growth trades pass count for coverage.
# Within the cap:
#   - every operator family keeps at least one head;
#   - a head flagged `weak` in any verdict round stays on the panel
#     until it has two consecutive clean rounds (regression watch);
#   - new heads are appended ONLY for a genuinely new cost shape (a
#     new family, or a new hot path no existing head exercises) — and
#     once the cap is reached, only by RETIRING a same-family head
#     whose cost shape another head already covers (retirements are
#     recorded here and the retired head's subtotals stay frozen);
#   - heads are append-only otherwise: the _R*_SET comparability
#     prefixes below pin every historical panel, so insertion or
#     reordering would silently corrupt cross-round subtotals.
HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q6",
    "tpch_q5ish",
    "st6_trader_ledger",
    "asof_join_price",
    "st1_ema",
    "w2_tumbling_sum",
    "w3_running_sum",
    "dataflow_hype_influence",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "sim_cosine_topk",
    "sim_ivf_ann",
    "text_quality",
    "text_fingerprint",
    "pipeline_curation",
    "streaming_floor",
    "streaming_st1_ema",
    # the round-4 production ST4 path (tagged-union combiner, live
    # runtime) — compare against the floor like every streaming entry
    "streaming_st4_combiner",
    "tpch_q18ish",
    # per-event engine regression sentinels: the applyInPandas batch fold
    # and its live applyInPandasWithState twin over the same ledger
    "st6_per_event_ledger",
    "streaming_st6_ledger",
    # round-3 heads: the composed settlement DAG and the global-prefix-sum
    # packing (both ride the two-phase range-partition plans)
    "dataflow_market_ledger",
    "pipeline_sequence_packing",
    # round-4 late heads: ROLLUP grouping sets (Expand) and the
    # stream-stream interval join (symmetric-hash state, vs the floor)
    "tpch_rollup",
    "streaming_join_interval",
    # round-6 heads: the bin-bucketed batch range join (the 100 TB-safe
    # interval join), the native session-merging streaming aggregation,
    # and the explode-heaviest text op (Gopher repetition signals)
    "join_range_bucketed",
    "streaming_w6_session",
    "text_repetition",
    # round-7 heads: the corpus-model text op (trigram LM surprisal) and
    # the broadcast-Bloom prefilter (map-side fact-table reduction)
    "text_trigram_surprisal",
    "join_bloom_prefilter",
    # round-8 heads: the EXISTS/NOT-EXISTS chain (left-semi + left-anti
    # residual-predicate joins on the same fact table), the fact-fact
    # profit join under a leading-wildcard LIKE, and the corpus-level
    # duplicated-5-gram signal (shingle explode + count-distinct +
    # semi-join back — the heaviest new text shape)
    "tpch_q21ish",
    "tpch_q9ish",
    "text_dup_ngram_fraction",
    # late round-8 heads: the path-dependent running-max window metric
    # and the collect-and-sort session-path miner (array-heavy shape)
    "events_max_drawdown",
    "events_session_paths",
    # this-session round-8 heads: the containment shingle self-join
    # (hot-gram-capped fan-out), the per-doc keyword ranker (explode +
    # df join + rank window), the PQ/ADC compressed-corpus scan
    # (broadcast lookup tables), the sweep-line two-phase prefix sum,
    # and the stream-stream LEFT OUTER join (watermark-evicted null
    # emission, vs the floor like every streaming entry)
    "dedup_containment",
    "text_top_terms_per_doc",
    "sim_pq_adc_topk",
    "events_concurrency",
    "streaming_join_left_outer",
    # round-9 heads: the trained-PQ index path (per-subspace Lloyd +
    # ADC — training cost is the head; the sampled-codebook scan above
    # stays for comparison) and the rare-gram-blocked fuzzy join with
    # its recall twin's candidate accounting
    "sim_pq_trained_recall",
    "join_fuzzy_recall",
    # round-10 heads: the composed IVFADC index (coarse pruning + ADC
    # over residual codes — encode cost dominates) and the zero-shuffle
    # per-row char-entropy filter (the map-pass floor for text ops)
    "sim_ivfpq_ann",
    "text_char_entropy",
    # late round-10 heads: the KMV pair set-algebra (sketch-sized merge
    # after one fact shuffle), the daily-register sliding-HLL window
    # (mergeable-sketch window cost, independent of user cardinality),
    # the per-basket-blocked association-rule miner, and the custom
    # bounded-state streaming sketch (applyInPandasWithState path, vs
    # the floor like every streaming entry)
    "sketch_kmv_jaccard",
    "events_sliding_hll_uniques",
    "basket_lift_pairs",
    "streaming_sketch_kmv",
    # round-11 heads: the ExactSubstr pair (span-report shuffle-light
    # gram semi-join + the scrub's position anti-join rebuild), the
    # CEP automaton on both engines (batch applyInPandas fold vs the
    # live stateful runtime, vs the floor), the two-retriever RRF
    # fusion, and the common-neighbor self-join under the degree cap
    "dedup_span_exact",
    "pipeline_span_scrub",
    "events_cep_pattern",
    "streaming_cep_pattern",
    "sim_hybrid_rrf",
    "graph_adamic_adar",
    # round-12 heads: the live notFollowedBy absence automaton (vs the
    # floor), the perceptual-hash banded near-dup (real P5 decode +
    # xor/popcount Hamming join), and the broadcast gram-membership
    # decontamination scrub
    "streaming_cep_absence",
    "mm_phash_dedup",
    "pipeline_benchmark_decontam",
    # late round-12 heads: the frame-by-frame P5 stream walk (sparse
    # decode-on-sample), the RIFF chunk-list audio decode, the
    # bounded-state sample-on-ingest priority sampler (vs the floor),
    # and the frame-aligned video near-dup join
    "mm_frame_sample",
    "mm_decode_wav",
    "streaming_weighted_sample",
    "mm_video_dedup",
    "mm_audio_dedup",
    "streaming_frame_sample",
    # round-13 heads: the 30-rule BPE trainer (distributed vocab
    # collapse + driver-side merge loop), its corpus-encode twin, and
    # the pure-numpy baseline-JPEG decode (full T.81 entropy path)
    "pipeline_bpe_train",
    "pipeline_bpe_encode",
    "mm_decode_jpeg",
    "mm_decode_png",
    # round-14 head: truecolor PNG decode (3-byte filter taps,
    # per-channel band features)
    "mm_decode_png_rgb",
    # round-15 heads: progressive (SOF2) JPEG decode, palette+Adam7
    # PNG decode, the three-modality attrition report (runs every
    # decoder over a 5-class corrupted corpus), 16-bit WAV, and the
    # topic-chained streaming BFS (3 chained availableNow queries —
    # compare against 3x the floor)
    "mm_decode_jpeg_progressive",
    "mm_decode_png_palette",
    "mm_decode_report",
    "mm_decode_wav16",
    "streaming_khop_reach",
    # round 16 (panel 78/80): the RGBA decode + integer-composite hot
    # path — 4-channel filter reconstruction per payload, the heaviest
    # per-byte PNG shape — and the GIF decode, a genuinely new cost
    # shape (variable-width LZW is sequential per payload, unlike the
    # vectorizable PNG filter/JPEG DCT inner loops).
    # streaming_label_propagation is NOT added: its cost is 3 chained
    # query lifecycles (~3x floor), the shape streaming_khop_reach
    # already prices.
    "mm_decode_png_rgba",
    "mm_decode_gif",
    # round 17 (panel 80/80 — AT the cap; any future head must retire
    # a covered same-family head per the policy above): composited
    # animated-GIF playback (every frame's LZW must run + per-frame
    # canvas compositing — a different cost shape from the sparse
    # full-rect sampler and the single-frame decode), and IMA-ADPCM
    # WAV (a sequential per-nibble integer recurrence in Python —
    # every other WAV head is a vectorized numpy fold).
    # mm_audio_dedup_shift is NOT added: its fingerprint+banded-join
    # shape is priced by mm_audio_dedup/mm_phash_dedup (the r17
    # verdict said exactly this).
    "mm_gif_frame_composite",
    "mm_decode_wav_adpcm",
]

# Cross-round comparability: the headline total only grows because the
# panel grows, so pin the frozen prefixes older rounds measured — the
# one-glance regression signal is the SUBTOTAL of a fixed set, not the
# moving total. r6 = the 31 entries benched in round 6; r7 = those plus
# the two round-7 heads; r8 = the 38-head panel the earlier round-8
# sessions measured (before this session's five additions).
_R6_SET = HEADLINE[:31]
_R7_SET = HEADLINE[:33]
_R8_SET = HEADLINE[:38]
_R8_FULL_SET = HEADLINE[:43]   # the 43-head panel BENCH_r08 measured
_R9_SET = HEADLINE[:45]        # the 45-head panel BENCH_r09 measured
_R10_SET = HEADLINE[:47]       # the 47-head panel before the late-r10 adds
_R10_LATE_SET = HEADLINE[:51]  # the full 51-head panel BENCH_r10 ran
_R11_SET = HEADLINE[:57]       # + the six round-11 heads
_R12_SET = HEADLINE[:60]       # + the three round-12 heads
_R12_LATE_SET = HEADLINE[:66]  # the full 66-head panel BENCH_r12 ran
_R13_SET = HEADLINE[:70]       # the full 70-head panel BENCH_r13 ran
_R14_SET = HEADLINE[:71]       # the full 71-head panel BENCH_r14 ran
_R15_SET = HEADLINE[:76]       # the full 76-head panel BENCH_r15 ran
_R16_SET = HEADLINE[:78]       # the full 78-head panel BENCH_r16 ran


def streaming_floor(spark, sf_dir):
    """The streaming-machinery sentinel (see module docstring): same
    events file source shape as every streaming_* entry, no enrichment,
    no state, no Python — pure source → memory-sink floor."""
    import tempfile
    import uuid

    from mktd6_flink_spark.plans import driver_queries as dq

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    _old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", dq._STREAM_PARTS)
    raw = dq._events_stream(spark, sf_dir)
    name = f"floor_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="floor_ckpt_")
    q = (raw.writeStream.format("memory").queryName(name)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    spark.conf.set("spark.sql.shuffle.partitions", _old_parts)
    if not q.awaitTermination(300):
        q.stop()
        raise RuntimeError("floor sentinel drain exceeded 300s")
    return spark.table(name)


def sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.removeprefix("sf"))
    except ValueError:
        return -1.0



# Hard ceiling for the final stdout line. The driver captures EXACTLY
# the last 2000 chars of this process's output (every BENCH_r*.json
# records tail_len=2000) and parses the LAST JSON line out of it;
# round 10 (51 heads of diagnostics) and round 15 (76 per-head timings
# + floor_sec, ~2.1 KB) both overflowed that window and were recorded
# as parsed:null. Rounds 16-17 printed a guaranteed-short compact line
# last — parseable, but it dropped the per-head "queries" map, so the
# driver's PERF comparison ran blind two rounds running (r17 verdict
# item 1). The r18 fix: the LAST line carries the queries map again,
# at ADAPTIVE precision (render_final_line) so it provably fits: at 80
# heads the panel's name bytes alone are ~1.37 KB, so fixed 2-decimal
# values (2.19 KB) and even fixed 1-decimal values (2.01 KB) overflow
# — the encoder degrades the LARGEST values to whole seconds first,
# where a 0.5 s quantization is proportionally smallest, and keeps
# 0.1 s resolution for the rest. Worst case (every value integer) is
# ~1.85 KB at 80 heads, under the cap by construction. Per-head
# 3-decimal medians/mins/spreads live in BENCH_DETAIL.json and on the
# full first stdout line.
# 1990, not 2000: the tail window is exactly 2000 chars of stdout and
# the line's own trailing newline spends one of them; the rest is
# margin for a wider total (4-digit seconds).
_FINAL_LINE_MAX = 1990
_COMPACT_LINE_MAX = 1200
_COMPACT_SUBTOTAL_KEEP = 4  # latest N comparability subtotals inline


def render_compact_line(total, sf, floor_sec, subtotals_min) -> str:
    """Render the one machine-readable stdout line (driver contract).

    Guaranteed <= _COMPACT_LINE_MAX bytes regardless of how many heads
    the panel grows to: only the newest _COMPACT_SUBTOTAL_KEEP
    subtotals ride inline (they sort lexically by round because the
    keys embed zero-padded-enough round numbers r6..r15; if a two-digit
    round ever sorts wrong the size cap still holds). If some future
    edit still overflows, subtotals are dropped entirely rather than
    risking a parsed:null round."""
    def _round_no(k):
        m = re.match(r"r(\d+)_", k)
        return int(m.group(1)) if m else -1
    keep = sorted(subtotals_min, key=_round_no)[-_COMPACT_SUBTOTAL_KEEP:]
    line = json.dumps({
        "metric": "headline_total_wall",
        "value": total,
        "unit": "sec",
        "sf": sf,
        # environment calibration constant: the sentinel's median —
        # pure query-lifecycle machinery, zero operator content — so
        # cross-round comparisons self-normalize for VM speed drift
        # (r13->r14 drifted 1.4x with zero code changes).
        "floor_sec": floor_sec,
        "subtotals_min": {k: subtotals_min[k] for k in keep},
    }, separators=(",", ":"))
    if len(line) > _COMPACT_LINE_MAX:  # belt-and-braces fallback
        line = json.dumps({
            "metric": "headline_total_wall", "value": total,
            "unit": "sec", "sf": sf, "floor_sec": floor_sec,
        }, separators=(",", ":"))
    return line


def render_full_line(total, sf, floor_sec, queries) -> str:
    """Render the FULL driver-contract line including the per-head
    ``queries`` map at full 3-decimal precision.

    At 80 heads this line is ~2.2 KB — larger than the 2000-char tail
    the driver captures, which is exactly how rounds 10 and 15 were
    recorded as parsed:null. So main() prints THIS line first (for any
    parser that reads complete stdout) and the adaptive-precision
    final line (render_final_line) LAST: the last-JSON-line tail
    parser finds a complete line that still carries "queries". Both
    lines carry identical totals (the per-pass medians summed)."""
    return json.dumps({
        "metric": "headline_total_wall",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "floor_sec": floor_sec,
    }, separators=(",", ":"))


def render_final_line(total, sf, floor_sec, queries, subtotals_min) -> str:
    """Render the LAST stdout line: queries map included, length
    provably <= _FINAL_LINE_MAX so the driver's 2000-char tail always
    contains it whole (r17 verdict task 1).

    Precision ladder, most to least informative, first fit wins:
      1. every value at 2 decimals, floor_sec included;
      2. every value at 1 decimal, floor_sec included;
      3. 1 decimal, floor_sec dropped (it stays on the full line and
         in BENCH_DETAIL.json);
      4. degrade the LARGEST values to whole seconds one at a time
         (each conversion saves 2 bytes; worst case all-integer is
         ~1.85 KB at the 80-head cap, under the cap by construction);
      5. belt-and-braces: the O(1) compact line with no queries map —
         a parsed:null round is never acceptable.
    Subtotals never ride this line (they are panel-size-proportional
    history; BENCH_DETAIL.json carries them all)."""
    def _dump(q, with_floor):
        d = {"metric": "headline_total_wall",
             # same rounding as the full line so the two stdout lines
             # agree exactly on the total (r17 ADVICE item 2)
             "value": round(total, 3),
             "unit": "sec",
             "queries": q,
             "sf": sf}
        if with_floor:
            d["floor_sec"] = floor_sec
        return json.dumps(d, separators=(",", ":"))

    for prec, with_floor in ((2, True), (1, True), (1, False)):
        q = {n: round(v, prec) for n, v in queries.items()}
        line = _dump(q, with_floor)
        if len(line) <= _FINAL_LINE_MAX:
            return line
    # step 4: q currently holds 1-decimal values; integer-ize largest-first
    for name in sorted(queries, key=queries.get, reverse=True):
        q[name] = int(round(queries[name]))
        line = _dump(q, False)
        if len(line) <= _FINAL_LINE_MAX:
            return line
    return render_compact_line(total, sf, floor_sec, subtotals_min)


def main() -> int:
    from mktd6_flink_spark.operators import cache
    from mktd6_flink_spark.plans import driver_queries as dq
    from mktd6_flink_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM with a real scan -> filter -> agg -> shuffle -> noop
    # pipeline so JIT/codegen/shuffle-machinery warmup stays out of the
    # first timed query (a bare count() only touches footers/stats).
    from pyspark.sql import functions as F
    (spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
     .filter(F.col("l_quantity") > 0)
     .groupBy("l_returnflag").agg(F.sum("l_quantity"))
     .write.format("noop").mode("overwrite").save())
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    # ... and the STREAMING machinery too: the round-10 trial showed the
    # first pass's floor at 2.1 s vs 1.0 s steady-state — without this,
    # every streaming head's first rep carries the one-time streaming
    # runtime startup and the A/B/A median leans on the last two passes
    # for all of them at once.
    streaming_floor(spark, SF_DIR).count()
    for tbl in spark.catalog.listTables():
        if tbl.isTemporary:
            spark.catalog.dropTempView(tbl.name)
    spark.streams.resetTerminated()

    def _floor_sample() -> float:
        t0 = time.perf_counter()
        streaming_floor(spark, SF_DIR).count()
        dt = time.perf_counter() - t0
        for tbl in spark.catalog.listTables():
            if tbl.isTemporary:
                spark.catalog.dropTempView(tbl.name)
        spark.streams.resetTerminated()
        return round(dt, 3)

    t_run0 = time.perf_counter()
    reps: dict[str, list[float]] = {name: [] for name in HEADLINE}
    floor_series: list[list[float]] = []  # [pre, post] per pass
    for p in range(REPEATS):
        floor_series.append([_floor_sample()])
        order = HEADLINE if p % 2 == 0 else list(reversed(HEADLINE))
        for name in order:
            fn = (streaming_floor if name == "streaming_floor"
                  else dq.QUERIES[name])
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            reps[name].append(time.perf_counter() - t0)
            # deterministic cleanup between runs: a two-phase plan may
            # have left a (size-gated) persisted frame behind, and a
            # streaming entry leaves its memory-sink temp view (driver
            # heap!) registered — rows from past reps must not pile up
            # into GC pressure for later queries
            cache.release_twophase_caches()
            for tbl in spark.catalog.listTables():
                if tbl.isTemporary:
                    spark.catalog.dropTempView(tbl.name)
            # the StreamingQueryManager retains TERMINATED queries (and
            # through them their memory sinks' rows) until reset —
            # without this the driver heap grows across the whole run
            spark.streams.resetTerminated()
        floor_series[p].append(_floor_sample())
    timings = {name: round(statistics.median(r), 3)
               for name, r in reps.items()}
    spread = {name: round(max(r) - min(r), 3) for name, r in reps.items()}
    # min-of-passes: biased optimistic as an absolute number, but the
    # most contention-robust cross-round comparison channel — GC/heap
    # interference from panel growth only ever ADDS time, so the min
    # tracks the plan's true cost while the median still reflects
    # typical shared-JVM conditions
    tmin = {name: round(min(r), 3) for name, r in reps.items()}

    total = round(sum(timings.values()), 3)
    # STDOUT gets ONE COMPACT line with only the driver-contract fields:
    # the driver's log captures a bounded tail of this process's output
    # and parses the last JSON line out of it — round 10's line carried
    # per-head spread/min/subtotal diagnostics for 51 heads, overflowed
    # that capture window, and the round was recorded as parsed:null.
    # Full diagnostics now go to BENCH_DETAIL.json next to this script.
    detail = {
        "repeats": REPEATS,
        "protocol": "interleaved-passes-ABA",
        "spread": spread,
        "floor_per_pass": [round(x, 3) for x in reps["streaming_floor"]],
        # round-17 dense floor series: [pre, post] bracket per pass
        # (calibration runs, excluded from totals) plus the per-pass
        # bracket mean — normalize a head's pass timing against ITS
        # pass's bracket to separate code change from VM drift
        "floor_series": floor_series,
        "floor_pass_mean": [round((a + b) / 2, 3)
                            for a, b in floor_series],
        "total_wall": round(time.perf_counter() - t_run0, 3),
        "subtotals": {
            "r6_comparable_31": round(
                sum(timings[n] for n in _R6_SET), 3),
            "r7_comparable_33": round(
                sum(timings[n] for n in _R7_SET), 3),
            "r8_comparable_38": round(
                sum(timings[n] for n in _R8_SET), 3),
            "r8_comparable_43": round(
                sum(timings[n] for n in _R8_FULL_SET), 3),
            "r9_comparable_45": round(
                sum(timings[n] for n in _R9_SET), 3),
            "r10_comparable_47": round(
                sum(timings[n] for n in _R10_SET), 3),
            "r10_comparable_51": round(
                sum(timings[n] for n in _R10_LATE_SET), 3),
            "r11_comparable_57": round(
                sum(timings[n] for n in _R11_SET), 3),
            "r12_comparable_60": round(
                sum(timings[n] for n in _R12_SET), 3),
            "r12_comparable_66": round(
                sum(timings[n] for n in _R12_LATE_SET), 3),
            "r13_comparable_70": round(
                sum(timings[n] for n in _R13_SET), 3),
            "r14_comparable_71": round(
                sum(timings[n] for n in _R14_SET), 3),
            "r15_comparable_76": round(
                sum(timings[n] for n in _R15_SET), 3),
            "r16_comparable_78": round(
                sum(timings[n] for n in _R16_SET), 3),
        },
        "subtotals_min": {
            "r8_comparable_43": round(
                sum(tmin[n] for n in _R8_FULL_SET), 3),
            "r9_comparable_45": round(
                sum(tmin[n] for n in _R9_SET), 3),
            "r10_comparable_47": round(
                sum(tmin[n] for n in _R10_SET), 3),
            "r10_comparable_51": round(
                sum(tmin[n] for n in _R10_LATE_SET), 3),
            "r11_comparable_57": round(
                sum(tmin[n] for n in _R11_SET), 3),
            "r12_comparable_60": round(
                sum(tmin[n] for n in _R12_SET), 3),
            "r12_comparable_66": round(
                sum(tmin[n] for n in _R12_LATE_SET), 3),
            "r13_comparable_70": round(
                sum(tmin[n] for n in _R13_SET), 3),
            "r14_comparable_71": round(
                sum(tmin[n] for n in _R14_SET), 3),
            "r15_comparable_76": round(
                sum(tmin[n] for n in _R15_SET), 3),
            "r16_comparable_78": round(
                sum(tmin[n] for n in _R16_SET), 3),
        },
        "queries_min": tmin,
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
    # full 3-decimal line FIRST, adaptive queries-bearing line LAST —
    # see render_final_line's docstring for why the order and the
    # length cap are load-bearing (r17 verdict task 1)
    print(render_full_line(
        total, sf_from_dir(SF_DIR), timings["streaming_floor"], timings))
    print(render_final_line(
        total, sf_from_dir(SF_DIR), timings["streaming_floor"], timings,
        detail["subtotals_min"]))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
