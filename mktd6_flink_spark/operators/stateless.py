"""Stateless row operators P1–P19 (SURVEY.md §2.3) as native Column
expressions — no Python UDFs, so Catalyst keeps predicate pushdown, column
pruning and whole-stage codegen on every one of them.

Each builder cites the reference implementation it matches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Sentiment vocabularies (Chapter01_FilteringAndSentiment.java:175-182).
POS_WORDS = ("smile", "happy", "good", "yes")
NEG_WORDS = ("frown", "sad", "bad", "no")

# Hype vocabularies (ShareHypePiece.java:23-31).
HYPE_POSITIVE = (
    "up", "buy", "goup", "happy", "happiness", "joy", "cool", "yes",
    "good", "great", "awesome", "banzai", "kawai", "sugoi",
)
HYPE_NEGATIVE = (
    "down", "sell", "godown", "sad", "sadness", "sorrow", "uncool", "no",
    "bad", "terrible", "awful", "seppuku", "baka", "hentai",
)


def buy_sell_decision(forecast_mult: Column) -> Column:
    """P1 — `mult > 1 ? BUY : SELL` (Chapter00:119-125)."""
    return F.when(forecast_mult > 1.0, F.lit("BUY")).otherwise(F.lit("SELL"))


def contains_all(text: Column, *needles: str) -> Column:
    """P2 — conjunctive substring containment (Chapter01:140-147)."""
    cond = F.lit(True)
    for n in needles:
        cond = cond & text.contains(n)
    return cond


def sentiment(text: Column, pos=POS_WORDS, neg=NEG_WORDS) -> Column:
    """P3 — word-boundary regex sentiment classification (Chapter01:149-154,
    175-182): POS if any positive word matches, else NEG, else NEUTRAL."""
    pos_re = r"(?i).*\b(" + "|".join(pos) + r")\b.*"
    neg_re = r"(?i).*\b(" + "|".join(neg) + r")\b.*"
    return (
        F.when(text.rlike(pos_re), F.lit("POS"))
        .when(text.rlike(neg_re), F.lit("NEG"))
        .otherwise(F.lit("NEUTRAL"))
    )


def non_neutral(sent: Column) -> Column:
    """P4 — drop NEUTRAL sentiment (Chapter01:156-161)."""
    return sent != "NEUTRAL"


def explode_influencing_chars(df: DataFrame, text: str, sent: str) -> DataFrame:
    """P5 — one UP/DOWN row per '!' char in the text (Chapter01:163-170,
    184-192): POS + '!' -> UP, NEG + '!' -> DOWN."""
    bangs = F.filter(F.split(F.col(text), ""), lambda c: c == "!")
    return (
        df.withColumn("_bang", F.explode(bangs))
        .withColumn(
            "influence",
            F.when(F.col(sent) == "POS", F.lit("UP")).otherwise(F.lit("DOWN")),
        )
        .drop("_bang")
    )


# P6 — text -> MarketOrder parse (Chapter02:237-260). Named-group regex
# `^(?<time>\d+) (?<player>\S+) (?<txn>\S+) (?<type>BUY|SELL) (?<shares>\d+)$`;
# parse failures become the "invalid" branch (Either semantics).
ORDER_RE = r"^(\d+) (\S+) (\S+) (BUY|SELL) (\d+)$"


def parse_market_order(text: Column) -> Column:
    """Returns a struct column, null when the row doesn't parse (the Left /
    invalid branch of Chapter02's Either)."""
    return F.when(
        text.rlike(ORDER_RE),
        F.struct(
            F.regexp_extract(text, ORDER_RE, 1).cast("long").alias("time_ms"),
            F.regexp_extract(text, ORDER_RE, 2).alias("player"),
            F.regexp_extract(text, ORDER_RE, 3).alias("txnId"),
            F.regexp_extract(text, ORDER_RE, 4).alias("type"),
            F.regexp_extract(text, ORDER_RE, 5).cast("int").alias("shares"),
        ),
    )


def order_size_guard(shares: Column, max_shares: int = 1000) -> Column:
    """P7 — drop orders with shares > 1000 (Chapter02:262-270)."""
    return shares <= max_shares


def banana_filter(text: Column) -> Column:
    """P8 — text contains "banana" (SharePriceDataflow.java:145-150)."""
    return text.contains("banana")


def hype_words(df: DataFrame, text: str = "text") -> DataFrame:
    """P9 — gibb -> hype pieces (SharePriceDataflow.java:152-160,
    ShareHypePiece.java:61-84): lowercase, strip non-letters, split on
    whitespace, keep vocabulary words, emit one row per hit with positive flag.
    """
    cleaned = F.regexp_replace(F.lower(F.col(text)), r"[^a-z \n]+", "")
    word = F.explode(F.split(cleaned, r"\s+")).alias("word")
    out = df.withColumn("word", word)
    return out.withColumn(
        "positive",
        F.when(F.col("word").isin(*HYPE_POSITIVE), F.lit(True))
        .when(F.col("word").isin(*HYPE_NEGATIVE), F.lit(False)),
    ).filter(F.col("positive").isNotNull())


def scaled_influence(positive: Column, scale: float = 0.01) -> Column:
    """P10 — hype piece -> ±1 * 0.01 influence (SharePriceDataflow.java:162-167)."""
    return F.when(positive, F.lit(1.0)).otherwise(F.lit(-1.0)) * F.lit(scale)


def constant_key(value: str = "FOO") -> Column:
    """P11 — re-key to a constant = single global partition
    (SharePriceDataflow.java:137-143). At scale this is a deliberate
    1-partition hotspot; callers that don't need total order should salt."""
    return F.lit(value)


def updater_from_market_order(order_type: Column, shares: Column, price: Column):
    """P12 — MarketOrder -> TraderStateUpdater deltas
    (TraderStateUpdater.java:141-154; sign logic MarketOrderType.java:14-21):
    BUY: coins -= shares*price, shares += n; SELL: coins += shares*price,
    shares -= n.  Returns (coinsDiff, sharesDiff) columns."""
    sign = F.when(order_type == "BUY", F.lit(1)).otherwise(F.lit(-1))
    coins_diff = -sign.cast("double") * shares.cast("double") * price
    shares_diff = sign * shares
    return coins_diff, shares_diff


def accepted_only(status: Column) -> Column:
    """P14 — status == ACCEPTED (MarketDataflow.java:185-188)."""
    return status == "ACCEPTED"


def positive_balance(coins: Column) -> Column:
    """P17 — coins > 0 guard (MonkeyStockTrader.java:293-298)."""
    return coins > 0
