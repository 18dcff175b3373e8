"""Late-data goldens for the windowed streaming entries (SURVEY §2.7
late-data policy; round-7 verdict #5).

Each gate entry (`streaming_w2_window`, `streaming_w6_session`,
`streaming_w7_sliding`) runs in COMPLETE output mode precisely so its
result equals the batch oracle over ALL data: Spark keeps every
window's state, so a row arriving after the watermark passed its
window is still merged — oracle parity by construction. The
reference's Flink defaults (no allowed lateness) instead DROP such
rows; that behavior corresponds to Spark's APPEND mode, which the
operators also support via their ``watermark`` parameter. These tests
pin BOTH halves of the contract per window type: complete merges the
late row (what the gate relies on), append drops it (what the
reference does).

Driven through real multi-micro-batch file streams: batch 1 carries
on-time rows plus a far-future row that advances the watermark past
the windows under test, batch 2 carries the late row, batch 3 a
heartbeat that flushes append-mode results.
"""

import pyspark.sql.functions as F

from mktd6_flink_spark.streaming import sources

BASE = 1_700_000_000_000  # ms epoch
SCHEMA = "player string, v double, ms long"


def _drive(spark, tmp_path, tag, agg_of, mode, batches):
    """Run one streaming aggregation over successive availableNow
    passes, one per batch of input rows; returns the final result rows.
    complete mode overwrites the output per micro-batch (the sink sees
    the full result each time), append mode accumulates emissions."""
    in_dir = str(tmp_path / f"{tag}_{mode}_in")
    ckpt = str(tmp_path / f"{tag}_{mode}_ckpt")
    out_dir = str(tmp_path / f"{tag}_{mode}_out")
    write_mode = "overwrite" if mode == "complete" else "append"
    for rows in batches:
        sources.write_stream_input(spark, in_dir, rows, SCHEMA)
        stream = sources.file_stream_source(spark, in_dir, SCHEMA).select(
            "player", "v", F.timestamp_millis(F.col("ms")).alias("ts"))
        out = agg_of(stream.withWatermark("ts", "10 milliseconds"))
        q = (out.writeStream.foreachBatch(
                lambda bdf, bid: bdf.write.mode(write_mode)
                .parquet(out_dir))
             .outputMode(mode)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
    return spark.read.parquet(out_dir).collect()


def _tumbling(stream):
    return (stream.groupBy(F.window("ts", "100 milliseconds").alias("_w"),
                           "player")
            .agg(F.sum("v").alias("sum_v"))
            .select(F.unix_millis("_w.start").alias("w_ms"),
                    "player", "sum_v"))


def _session(stream):
    return (stream.groupBy(
                F.session_window("ts", "100 milliseconds").alias("_w"),
                "player")
            .agg(F.sum("v").alias("sum_v"),
                 F.count(F.lit(1)).alias("n"))
            .select(F.unix_millis("_w.start").alias("w_ms"),
                    "player", "sum_v", "n"))


def _sliding(stream):
    return (stream.groupBy(
                F.window("ts", "200 milliseconds",
                         "100 milliseconds").alias("_w"),
                "player")
            .agg(F.sum("v").alias("sum_v"))
            .select(F.unix_millis("_w.start").alias("w_ms"),
                    "player", "sum_v"))


# batch 1 on-time + watermark-advancer; batch 2 the late row; batch 3
# flushes append mode. The late row lands in a window whose end the
# watermark passed during batch 1.
W2_BATCHES = [
    [("p1", 1.0, BASE + 10), ("p1", 2.0, BASE + 20),
     ("adv", 5.0, BASE + 10_000)],
    [("p1", 100.0, BASE + 30)],
    [("adv2", 7.0, BASE + 100_000)],
]


def test_w2_tumbling_complete_merges_late_row(spark, tmp_path):
    rows = _drive(spark, tmp_path, "w2", _tumbling, "complete",
                  W2_BATCHES)
    sums = {(r.player, r.w_ms): r.sum_v for r in rows}
    # the gate entries' mode: late 100.0 still merged into [BASE, +100)
    assert sums[("p1", BASE)] == 103.0


def test_w2_tumbling_append_drops_late_row(spark, tmp_path):
    rows = _drive(spark, tmp_path, "w2", _tumbling, "append", W2_BATCHES)
    sums = {(r.player, r.w_ms): r.sum_v for r in rows}
    # Flink-default semantics: window closed at 3.0, late row dropped
    assert sums[("p1", BASE)] == 3.0


W6_BATCHES = [
    [("p1", 1.0, BASE), ("p1", 2.0, BASE + 50),
     ("adv", 5.0, BASE + 10_000)],
    [("p1", 4.0, BASE + 60)],
    [("adv2", 7.0, BASE + 100_000)],
]


def test_w6_session_complete_merges_late_row(spark, tmp_path):
    rows = _drive(spark, tmp_path, "w6", _session, "complete",
                  W6_BATCHES)
    p1 = [r for r in rows if r.player == "p1"]
    # the late row falls INSIDE the closed session's span and must be
    # absorbed into it: still one session, sum includes it
    assert len(p1) == 1
    assert (p1[0].w_ms, p1[0].sum_v, p1[0].n) == (BASE, 7.0, 3)


def test_w6_session_append_drops_late_row(spark, tmp_path):
    rows = _drive(spark, tmp_path, "w6", _session, "append", W6_BATCHES)
    p1 = [r for r in rows if r.player == "p1"]
    assert len(p1) == 1
    assert (p1[0].w_ms, p1[0].sum_v, p1[0].n) == (BASE, 3.0, 2)


W7_BATCHES = [
    [("p1", 1.0, BASE + 50), ("adv", 5.0, BASE + 10_000)],
    [("p1", 2.0, BASE + 150)],
    [("adv2", 7.0, BASE + 100_000)],
]


def test_w7_sliding_complete_merges_late_row_into_both_windows(
        spark, tmp_path):
    rows = _drive(spark, tmp_path, "w7", _sliding, "complete",
                  W7_BATCHES)
    sums = {(r.player, r.w_ms): r.sum_v for r in rows}
    # on-time row in [-100,100) and [0,200); late row in [0,200) and
    # [100,300) — every overlapping window absorbs it
    assert sums[("p1", BASE - 100)] == 1.0
    assert sums[("p1", BASE)] == 3.0
    assert sums[("p1", BASE + 100)] == 2.0


def test_w7_sliding_append_drops_late_row_from_all_windows(
        spark, tmp_path):
    rows = _drive(spark, tmp_path, "w7", _sliding, "append", W7_BATCHES)
    sums = {(r.player, r.w_ms): r.sum_v for r in rows}
    assert sums[("p1", BASE - 100)] == 1.0
    assert sums[("p1", BASE)] == 1.0
    # the late row's windows either never materialize or exclude it
    assert sums.get(("p1", BASE + 100), 0.0) == 0.0
