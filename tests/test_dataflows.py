"""End-to-end composed dataflow tests: SharePriceDataflow (§3.2) and
MarketDataflow (§3.3) run as chained streaming queries over file-backed
topics, including the reference's feedback edge (ST8 returns appended
back onto the updates topic and folded by a later stage-2 trigger)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from mktd6_flink_spark.plans import market, share_price
from mktd6_flink_spark.streaming import sources


def test_share_price_dataflow_end_to_end(spark, tmp_path):
    """gibbs → hype → influence → fused running-sum+burst → connect with
    base prices → ST4 → SharePriceInfo stream (hand-checked values,
    burst randomness pinned to never fire)."""
    gschema = "id string, seq long, text string"
    gibbs = [
        ("g1", 1, "banana up, buy! love it"),         # up buy love: +3
        ("g2", 2, "banana down... sell, hate, risk"), # -4
        ("g3", 3, "no banana here... wait yes banana: rich rich"),  # no,yes: 0
    ]
    sources.write_stream_input(spark, str(tmp_path / "gibbs"), gibbs, gschema)
    gstream = sources.file_stream_source(
        spark, str(tmp_path / "gibbs"), gschema)

    s1 = share_price.stage1_hype(gstream, rand_col=F.lit(0.99))
    q1 = sources.memory_sink(
        s1["hype_diff"], "hd", str(tmp_path / "ck1")).start()
    q1.awaitTermination(120)
    hd = spark.sql("SELECT * FROM hd ORDER BY seq, hype_total").collect()
    # walk: g1 (+buy +love +up) -> .01 .02 .03; g2 (4 negatives) ->
    # .02 .01 .00 -.01; g3 (no-, yes+) -> -.02 -.01. Rows come back
    # sorted by (seq, hype_total), i.e. ascending within each gibb.
    assert [round(r.hype_total, 4) for r in hd] == [
        0.01, 0.02, 0.03, -0.01, 0.0, 0.01, 0.02, -0.02, -0.01]
    # diff stream = deltas (no burst: rand pinned at 0.99)
    assert all(r.burst_step == 0 for r in hd)

    # stage 2: connect hype-diff with base prices
    hd_topic = market.FileTopic(
        str(tmp_path / "hd_topic"),
        "key string, seq long, diff double")
    hd_topic.append_batch(
        spark.createDataFrame(
            [(r.key, r.seq * 10 + i, r.diff) for i, r in enumerate(hd)],
            "key string, seq long, diff double"))
    prices = spark.createDataFrame(
        [("FOO", 1000, 2.0), ("FOO", 2000, 2.5)],
        "key string, seq long, price double")
    p_topic = market.FileTopic(str(tmp_path / "p_topic"),
                               "key string, seq long, price double")
    p_topic.append_batch(prices)
    out = share_price.stage2_share_price(
        hd_topic.read_stream(spark), p_topic.read_stream(spark))
    q2 = sources.memory_sink(out, "sp", str(tmp_path / "ck2")).start()
    q2.awaitTermination(120)
    sp = spark.sql("SELECT * FROM sp ORDER BY new_value").collect()
    assert len(sp) == 2  # one SharePriceInfo per base price
    # hype state at seq>=1000 is the last diff (-0.01 -> +0.01 walk ends
    # 0.01 at seq 91); price 2.0 -> newValue 2.0 + last hype diff
    assert all(r.forecast_mult > 0 for r in sp)


def test_market_dataflow_with_feedback(spark, tmp_path):
    """Stage 1 settles orders (incl. pre-price buffering) → updates
    topic; stage 2 folds the ledger; ST8 returns append back onto the
    updates topic and a second stage-2 trigger folds them — the
    reference's Kafka-mediated cycle (MarketDataflow.java:139-165)."""
    updates = market.FileTopic(str(tmp_path / "updates"),
                               market.UPDATER_SCHEMA)

    orders = spark.createDataFrame(
        [("t1", 1, 100, "o1", "BUY", 2),     # buffered until price
         ("t1", 4, 400, "o2", "SELL", 1)],   # settles at 2.0
        "trader string, seq long, time_ms long, txnId string, "
        "type string, shares int")
    prices = spark.createDataFrame(
        [(2, 200, 2.0)], "seq long, time_ms long, price double")
    invs = spark.createDataFrame(
        [("t2", 3, "i1", 4.0)],
        "trader string, seq long, txnId string, invested double")
    feeds = spark.createDataFrame(
        [("t1", 5, "f1", 2)],
        "trader string, seq long, txnId string, monkeys int")

    # stage 1 over file streams
    def as_stream(df, name):
        d = str(tmp_path / name)
        df.coalesce(1).write.mode("append").json(d)
        return spark.readStream.schema(df.schema).json(d)

    upd = market.stage1_updaters(
        as_stream(orders, "orders"), as_stream(prices, "prices"),
        as_stream(invs, "invs"), as_stream(feeds, "feeds"))
    q1 = (updates.sink(upd, str(tmp_path / "ck1"))
          .trigger(availableNow=True).start())
    q1.awaitTermination(120)

    raw_updates = spark.read.schema(market.UPDATER_SCHEMA).json(updates.path)
    got = {r.txnId: r for r in raw_updates.collect()}
    assert got["o1"].coinsDiff == -4.0 and got["o1"].sharesDiff == 2
    assert got["o2"].coinsDiff == 2.0 and got["o2"].sharesDiff == -1
    assert got["i1"].coinsDiff == -4.0 and got["i1"].investDiff == 1
    assert got["f1"].sharesDiff == -2 and got["f1"].fedMonkeys == 2

    # stage 2 run #1: ledger fold
    txn_topic = market.FileTopic(str(tmp_path / "txns"),
                                 market.TXN_RESULT_SCHEMA)

    def run_stage2(n):
        txns = market.stage2_ledger(updates.read_stream(spark))
        q = (txn_topic.sink(txns, str(tmp_path / "ck2"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return spark.read.schema(market.TXN_RESULT_SCHEMA).json(
            str(tmp_path / "txns"))

    txns = run_stage2(1)
    t = {r.txnId: r for r in txns.collect()}
    assert t["o1"].status == "ACCEPTED" and t["o1"].coins == 6.0
    assert t["o2"].coins == 8.0 and t["o2"].shares == 6
    assert t["i1"].status == "ACCEPTED" and t["i1"].inFlightInvestments == 1

    # feedback: compute the RETURN updater for the accepted investment
    # (deterministic return fn) and append it onto the updates topic
    inv_txns = market.accepted_investments(txns)
    ret = inv_txns.select(
        F.col("trader"), F.lit(99).cast("long").alias("seq"),
        F.col("txnId"), F.lit("RETURN").alias("type"),
        (F.lit(1.5) * 4.0).cast("double").alias("coinsDiff"),
        F.lit(0).alias("sharesDiff"), F.lit(False).alias("addBailout"),
        F.lit(0).alias("fedMonkeys"),
        F.lit(-1).cast("int").alias("investDiff"))
    updates.append_batch(ret)

    txns2 = run_stage2(2)
    t2 = {(r.txnId, r.type): r for r in txns2.collect()}
    back = t2[("i1", "RETURN")]
    # t2 had 6 coins, inFlight 1 after i1; return +6.0, investDiff -1
    assert back.status == "ACCEPTED"
    assert back.coins == 12.0 and back.inFlightInvestments == 0
