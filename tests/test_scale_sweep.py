"""Hostile-scale sweep for the flagship ST6 settlement ledger
(VERDICT r8 task 4): run the sf0.1 events table through the STREAMING
ledger paths with _STREAM_PARTS in {8, 32, 200} and assert

  1. bit-identical results across every partition count (state-store
     partitioning is a deployment knob, never a semantics knob);
  2. the full COMPOSED market dataflow — stage-1 order settling at the
     buffered/as-of price, topic hop, stage-2 validated ledger fold
     (plans/market.py, MarketDataflow.java:99-132 + 284-310 parity) —
     lands on exactly the batch `dataflow_market_ledger` final states;
  3. sublinear wall-time growth: 25x the state partitions must cost
     far less than 25x the time (fixed per-partition state-store cost
     only; measured numbers recorded in SCALING.md).

sf0.1 on purpose: ~100k events is where per-key buffers, multi-chunk
Arrow batches, and state-store scheduling overheads actually bite
(the sf0.1 sweep history: round_portable saturation, chunk-order
folds)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mktd6_flink_spark.functions.hashing import round_portable

SF_DIR = "/root/testdata/sf0.1"

# Fast/full tier (r18 -- the r17 verdict's task 2: the suite outgrew
# the driver's pytest budget, and this file's two sweeps were its
# single biggest line item). The default tier sweeps {8, 32}: the
# bit-identity-across-partitioning invariant needs two distinct
# counts, and 4x still exercises multi-partition state scheduling.
# SPARK_GRAFT_FULL_SWEEP=1 restores the hostile 25x {8, 32, 200}
# sweep (run it when touching the streaming runtime or state plumbing;
# SCALING.md's recorded numbers come from the full sweep).
_SWEEP_PARTS = (("8", "32", "200")
                if os.environ.get("SPARK_GRAFT_FULL_SWEEP") == "1"
                else ("8", "32"))

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="sf0.1 driver testdata not present")


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_streaming_st6_ledger_stream_parts_sweep(spark, monkeypatch):
    """streaming_st6_ledger at sf0.1 across {8, 32, 200} state
    partitions: identical multisets, bounded wall-time growth."""
    from mktd6_flink_spark.plans import driver_queries as dq

    # warm the streaming machinery (source listing, Arrow, state-store
    # classes) so the first TIMED run isn't a cold-start outlier — the
    # ratio bound below compares steady-state costs
    monkeypatch.setattr(dq, "_STREAM_PARTS", "8")
    dq.QUERIES["streaming_st6_ledger"](spark, SF_DIR).collect()

    results, times = {}, {}
    for parts in _SWEEP_PARTS:
        monkeypatch.setattr(dq, "_STREAM_PARTS", parts)
        t0 = time.monotonic()
        results[parts] = _canon(
            dq.QUERIES["streaming_st6_ledger"](spark, SF_DIR))
        times[parts] = time.monotonic() - t0
    assert results["8"], "empty ledger output"
    assert all(results[p] == results["8"] for p in _SWEEP_PARTS), \
        "streaming ledger result depends on _STREAM_PARTS"
    # Growth must stay below the 25x partition multiplier: the cost is
    # per-partition state-store/scheduling overhead, not per-row work
    # (on a cluster the 200 partitions spread over cores and the curve
    # flattens; local[32] serializes them). Measured: see SCALING.md.
    # sublinear in the partition multiplier (hi/8): per-partition
    # state-store overhead only, never per-row work (measured ~12x at
    # 25x on local[32] -- ~2x headroom holds at the fast tier too)
    hi = _SWEEP_PARTS[-1]
    assert times[hi] < int(hi) / 8 * times["8"], times
    print(f"\nSCALING streaming_st6_ledger sf0.1 parts->sec: "
          f"{ {k: round(v, 2) for k, v in times.items()} }")


def test_composed_market_dataflow_stream_parts_sweep(spark, tmp_path,
                                                    monkeypatch):
    """The FULL composed market dataflow through the streaming runtime
    at sf0.1 — stage-1 ST5 settle (orders buffered until the first
    price, then settled at the latest as-of price) -> updates topic ->
    stage-2 validated ST6 ledger — swept across {8, 32, 200} state
    partitions and compared bit-for-bit against the batch
    `dataflow_market_ledger` final states."""
    from mktd6_flink_spark.plans import driver_queries as dq
    from mktd6_flink_spark.plans import market

    # --- batch expectation: final state per trader -------------------
    expect = _canon(dq.QUERIES["dataflow_market_ledger"](spark, SF_DIR))
    assert expect

    # --- stage the four input topics once (batch, deterministic) -----
    # seq ranks the union by (ts, prices-first, event_id) so the
    # streaming fold order per trader equals the batch fold's
    # (ts, event_id) — prices sort FIRST at an equal timestamp because
    # the batch as-of join is inclusive (o.ts >= p.pts).
    ev = dq.events_enriched(spark, SF_DIR).filter(
        F.col("otype").isin("BUY", "SELL", "INVEST", "FEED"))
    prices = dq._prices(spark, SF_DIR)
    base = ev.select(
        "ts", F.lit(1).alias("_isord"), "event_id", "trader", "otype",
        "shares", "monkeys", "invested", "time_ms",
        F.lit(None).cast("double").alias("price"))
    pr = prices.select(
        F.col("pts").alias("ts"), F.lit(0).alias("_isord"),
        F.lit(-1).cast("long").alias("event_id"),
        F.lit(None).cast("string").alias("trader"),
        F.lit(None).cast("string").alias("otype"),
        F.lit(None).cast("int").alias("shares"),
        F.lit(None).cast("int").alias("monkeys"),
        F.lit(None).cast("double").alias("invested"),
        F.unix_millis("pts").alias("time_ms"), "price")
    ranked = base.unionByName(pr).withColumn(
        "seq", F.row_number().over(
            Window.orderBy("ts", "_isord", "event_id")).cast("long")
    ).withColumn("txnId", F.format_string("txn%09d", F.col("seq")))

    def stage(df, name):
        d = str(tmp_path / name)
        df.coalesce(1).write.mode("overwrite").json(d)
        return d

    orders_dir = stage(ranked.filter(F.col("otype").isin("BUY", "SELL"))
                       .select("trader", "seq", "time_ms", "txnId",
                               F.col("otype").alias("type"), "shares"),
                       "orders")
    prices_dir = stage(ranked.filter(F.col("_isord") == 0)
                       .select("seq", "time_ms", "price"), "prices")
    invs_dir = stage(ranked.filter(F.col("otype") == "INVEST")
                     .select("trader", "seq", "txnId", "invested"),
                     "invs")
    feeds_dir = stage(ranked.filter(F.col("otype") == "FEED")
                      .select("trader", "seq", "txnId", "monkeys"),
                      "feeds")

    def run_composed(parts: str) -> list:
        tag = f"p{parts}"
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try:
            def rs(d, schema):
                return spark.readStream.schema(schema).json(d)

            upd = market.stage1_updaters(
                rs(orders_dir, "trader string, seq long, time_ms long, "
                               "txnId string, type string, shares int"),
                rs(prices_dir, "seq long, time_ms long, price double"),
                rs(invs_dir, "trader string, seq long, txnId string, "
                             "invested double"),
                rs(feeds_dir, "trader string, seq long, txnId string, "
                              "monkeys int"))
            updates = market.FileTopic(str(tmp_path / f"updates_{tag}"),
                                       market.UPDATER_SCHEMA)
            q1 = (updates.sink(upd, str(tmp_path / f"ck1_{tag}"))
                  .trigger(availableNow=True).start())
            q1.awaitTermination(300)
            txns = market.stage2_ledger(updates.read_stream(spark))
            txn_topic = market.FileTopic(str(tmp_path / f"txns_{tag}"),
                                         market.TXN_RESULT_SCHEMA)
            q2 = (txn_topic.sink(txns, str(tmp_path / f"ck2_{tag}"))
                  .trigger(availableNow=True).start())
            q2.awaitTermination(300)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
        all_txns = spark.read.schema(market.TXN_RESULT_SCHEMA).json(
            str(tmp_path / f"txns_{tag}"))
        # final state per trader = the row with the highest txnId
        # (zero-padded seq, so lexicographic == numeric)
        final = all_txns.groupBy("trader").agg(
            F.max_by(
                F.struct("coins", "shares", "bailouts", "fedMonkeys",
                         "inFlightInvestments"),
                F.col("txnId")).alias("_s"))
        return _canon(final.select(
            "trader",
            round_portable(F.col("_s.coins")).alias("coins"),
            F.col("_s.shares").alias("shares"),
            F.col("_s.bailouts").alias("bailouts"),
            F.col("_s.fedMonkeys").alias("fed_monkeys"),
            F.col("_s.inFlightInvestments").alias("in_flight")))

    run_composed("4")  # warm cold-start costs out of the timed runs

    results, times = {}, {}
    for parts in _SWEEP_PARTS:
        t0 = time.monotonic()
        results[parts] = run_composed(parts)
        times[parts] = time.monotonic() - t0
    assert all(results[p] == results["8"] for p in _SWEEP_PARTS), \
        "composed dataflow result depends on state partition count"
    assert results["8"] == expect, \
        "composed streaming dataflow != batch dataflow_market_ledger"
    # Same bound rationale as the st6 sweep above: sublinear in the
    # 25x partition multiplier (measured ~12x on local[32] — two
    # chained stateful queries each pay the per-partition floor).
    # sublinear in the partition multiplier (hi/8): per-partition
    # state-store overhead only, never per-row work (measured ~12x at
    # 25x on local[32] -- ~2x headroom holds at the fast tier too)
    hi = _SWEEP_PARTS[-1]
    assert times[hi] < int(hi) / 8 * times["8"], times
    print(f"\nSCALING composed market dataflow sf0.1 parts->sec: "
          f"{ {k: round(v, 2) for k, v in times.items()} }")
