"""The five kata golden tests, ported from the reference's canonical
acceptance suite (SURVEY.md §5). Each cites the Java golden it mirrors and
asserts the exact expected values — including Chapter04's exact float
sequence.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mktd6_flink_spark.operators import stateless, windows
from mktd6_flink_spark.streaming import stateful


def test_chapter00_buy_or_sell(spark):
    """Chapter00_RunMyFirstFlinkAppTest.java:145-166: four forecasts →
    BUY/SELL/SELL/BUY in order."""
    rows = [(1, 3.14), (2, 0.42), (3, 0.9999), (4, 1.0001)]
    df = spark.createDataFrame(rows, "i int, mult double")
    out = (
        df.select("i", stateless.buy_sell_decision(F.col("mult")).alias("d"))
        .orderBy("i")
        .collect()
    )
    assert [r.d for r in out] == ["BUY", "SELL", "SELL", "BUY"]


def test_chapter01_up_or_down(spark):
    """Chapter01_LinearStatelessAnalysis.java:209-221: five gibbs →
    exactly UP,UP,UP,DOWN,DOWN,UP (hashtag filter → sentiment → drop
    NEUTRAL → one row per '!')."""
    gibbs = [
        ("001", "#mktd6 this is ignored"),
        ("002", "#mktd6 #bananacoins are good!!!"),
        ("003", "#mktd6 #bananacoins make me sad!!"),
        ("004", "smile happy good !!! (ignored)"),
        ("005", "#mktd6 smile! #bananacoins"),
    ]
    df = spark.createDataFrame(gibbs, "id string, text string")
    filtered = df.filter(
        stateless.contains_all(F.col("text"), "#mktd6", "#bananacoins"))
    sent = filtered.withColumn(
        "sentiment", stateless.sentiment(F.col("text")))
    non_neutral = sent.filter(stateless.non_neutral(F.col("sentiment")))
    out = stateless.explode_influencing_chars(non_neutral, "text", "sentiment")
    got = [(r.id, r.influence) for r in out.orderBy("id").collect()]
    assert got == [("002", "UP"), ("002", "UP"), ("002", "UP"),
                   ("003", "DOWN"), ("003", "DOWN"), ("005", "UP")]


def test_chapter02_valid_invalid(spark):
    """Chapter02_SplitSelectUnion.java:291-328: parse → Either routing →
    size guard → valid = orders 1,3,5; invalid = order 4 only (order 2
    parses but exceeds 1000 shares)."""
    now = 1700000000000
    orders = [
        f"{now + 1} player1 txn01 BUY 5",
        f"{now + 2} player2 txn02 BUY 99999",
        f"{now + 3} player2 txn03 SELL 8",
        f"{now + 4} player3 txn04 INVALID ORDER",
        f"{now + 5} player1 txn01 SELL 5",
    ]
    df = spark.createDataFrame([(o,) for o in orders], "text string")
    parsed = df.select(
        "text", stateless.parse_market_order(F.col("text")).alias("o"))
    invalid = parsed.filter(F.col("o").isNull()).select("text")
    valid = (
        parsed.filter(F.col("o").isNotNull())
        .filter(stateless.order_size_guard(F.col("o.shares")))
        .select("text")
    )
    assert sorted(r.text for r in valid.collect()) == sorted(
        [orders[0], orders[2], orders[4]])
    assert [r.text for r in invalid.collect()] == [orders[3]]


def test_chapter03_windowed_sums(spark):
    """Chapter03_Windowing.java:193-223: per-player 100 ms tumbling sums
    = 13 (player1: 1+2+4+6), 8 (player2: 3+5), 100 (player3)."""
    base = 1700000000000
    rows = [
        ("player1", "txn01", 1.0, base + 1),
        ("player1", "txn02", 2.0, base + 2),
        ("player2", "txn03", 3.0, base + 3),
        ("player1", "txn04", 4.0, base + 4),
        ("player2", "txn05", 5.0, base + 5),
        ("player1", "txn06", 6.0, base + 6),
        ("player3", "txn06", 100.0, base + 7),
    ]
    df = spark.createDataFrame(
        rows, "player string, txnId string, invested double, ms long"
    ).withColumn("time", F.timestamp_millis(F.col("ms")))
    out = windows.window_sum_first(
        df, "time", "player", "invested", "txnId", "100 milliseconds")
    got = {r.player: (r.sum_invested, r.first_txnId)
           for r in out.collect()}
    assert got == {"player1": (13.0, "txn01"),
                   "player2": (8.0, "txn03"),
                   "player3": (100.0, "txn06")}


CH04_GOLDEN = [1.0, 1.1, 1.29, 1.561, 1.7049, 1.73441, 1.6609690000000001]


def test_chapter04_ema_exact_floats(spark):
    """Chapter04_WorkingWithState.java:139-154: per-event EMA over prices
    1,2,3,4,3,2,1 emits EXACTLY the golden float64 sequence."""
    rows = [("EMA", i + 1, float(p))
            for i, p in enumerate([1, 2, 3, 4, 3, 2, 1])]
    df = spark.createDataFrame(rows, "key string, seq int, value double")
    out = stateful.apply_per_event_batch(
        df, ["key"], ["seq"], stateful.ema_step,
        "key string, ema double")
    got = [r.ema for r in out.collect()]
    assert got == CH04_GOLDEN  # exact float equality, incl. 1.6609690000000001
