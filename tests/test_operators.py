"""Unit tests: operator semantics against hand-computed reference
behavior (citations inline), serde round-trips, as-of join edges,
routing."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mktd6_flink_spark import model
from mktd6_flink_spark.operators import asof, folds, routing, stateless


def test_order_regex_either_semantics(spark):
    """Chapter02:237-260: regex-pass-parse-fail rows route invalid; '_'
    not in [a-z0-9]; lowercase types pass the (?i) regex but the
    case-sensitive MarketOrderType.valueOf (Chapter02:241) throws, so
    they land in the invalid branch."""
    cases = [
        ("1 trader id BUY 5", True),
        ("12a trader id BUY 5", False),      # parseLong("12a") throws
        ("1 trader_x id BUY 5", False),      # '_' not [a-z0-9]
        ("2 p2 t2 sell 8", False),           # valueOf("sell") throws
        ("2 p2 t2 SELL 8", True),
        ("3 p3 t3 BUY 99999999999", False),  # Integer.parseInt overflow
        ("4 p4 t4 FEED 5", False),           # type not BUY|SELL
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], "text string")
    out = df.select(
        "text", stateless.parse_market_order(F.col("text")).alias("o"))
    got = {r.text: r.o is not None for r in out.collect()}
    assert got == dict(cases)
    sell = out.filter(F.col("text") == "2 p2 t2 SELL 8").collect()[0]
    assert sell.o.type == "SELL"


def test_hype_vocabulary_matches_reference(spark):
    """ShareHypePiece.java:24-31 word lists, 61-84 tokenization: mixed
    case + punctuation stripped, only vocab words kept."""
    df = spark.createDataFrame(
        [("g1", "I LOVE bananas! buy buy... but risky&dangerous, no?")],
        "id string, text string")
    out = stateless.hype_words(df)
    got = [(r.word, r.positive) for r in out.collect()]
    # 'LOVE'->love +, 'buy' x2 +, 'riskydangerous' (joined by & strip) is
    # NOT a vocab word, 'no' -
    assert got == [("love", True), ("buy", True), ("buy", True),
                   ("no", False)]


def test_trader_fold_bailout_golden(spark):
    """TraderStateUpdater.java:115-139 + TraderState.java:69-83:
    hand-computed ledger incl. auto-bailout and both rejection paths."""
    upds = [
        ("t1", 1, "a", "MARKET", -8.0, 1, False, 0, 0),   # (2, 6)
        ("t1", 2, "b", "MARKET", 0.0, -6, False, 0, 0),   # (2, 0) <=3 coins,
        # 0 shares -> bailout -> (12, 5, bailouts=1)
        ("t1", 3, "c", "MARKET", -13.0, 0, False, 0, 0),  # coins -1 -> reject
    ]
    schema = ("trader string, seq long, txnId string, type string, "
              "coinsDiff double, sharesDiff int, addBailout boolean, "
              "fedMonkeys int, investDiff int")
    df = spark.createDataFrame(upds, schema)
    out = folds.fold_by_key(
        df, ["trader"], ["seq"],
        ["txnId", "type", "coinsDiff", "sharesDiff", "addBailout",
         "fedMonkeys", "investDiff"],
        folds.trader_state_fold, "state").collect()[0]
    s = out.state
    assert (s.coins, s.shares, s.bailouts) == (12.0, 5, 1)


def test_asof_join_fallback_first(spark):
    """ST5 flush semantics: left rows before the first right row get the
    FIRST right value; <= inclusivity at equal timestamps."""
    left = spark.createDataFrame(
        [("k", 1, "early"), ("k", 5, "exact"), ("k", 7, "late")],
        "k string, t long, tag string")
    right = spark.createDataFrame(
        [("k", 5, 50.0), ("k", 6, 60.0)], "k string, t long, price double")
    out = asof.asof_join(left, right, ["k"], "t", "t", ["price"],
                         fallback="first")
    got = {r.tag: r.asof_price for r in out.collect()}
    assert got == {"early": 50.0, "exact": 50.0, "late": 60.0}
    # standard null fallback
    out2 = asof.asof_join(left, right, ["k"], "t", "t", ["price"])
    got2 = {r.tag: r.asof_price for r in out2.collect()}
    assert got2 == {"early": None, "exact": 50.0, "late": 60.0}


def test_asof_join_scalable_null_keys_match_plain(spark):
    """NULL join keys must behave identically in both physical plans:
    the plain window treats NULL as its own partition group; the
    scalable plan's internal joins go through a struct key so NULL
    rows survive (a bare equi-join would drop them)."""
    left = spark.createDataFrame(
        [("k", 1, "a"), (None, 2, "b"), (None, 9, "c"), ("k", 9, "d")],
        "k string, t long, tag string")
    right = spark.createDataFrame(
        [("k", 5, 50.0), (None, 4, 40.0)],
        "k string, t long, price double")
    for fb in ("null", "first"):
        plain = asof.asof_join(left, right, ["k"], "t", "t", ["price"],
                               fallback=fb)
        scal = asof.asof_join(left, right, ["k"], "t", "t", ["price"],
                              fallback=fb, scalable=True, partitions=3)
        p = sorted((r.tag, r.asof_price) for r in plain.collect())
        s = sorted((r.tag, r.asof_price) for r in scal.collect())
        assert p == s, fb
    assert dict(s) == {"a": 50.0, "b": 40.0, "c": 40.0, "d": 50.0}


def test_tagged_union_widens_schemas(spark):
    left = spark.createDataFrame([(1, "x")], "id int, a string")
    right = spark.createDataFrame([(2, 3.5)], "id int, b double")
    out = routing.tagged_union(left, right)
    assert set(out.columns) == {"id", "a", "b", "_side"}
    rows = {r._side: r for r in out.collect()}
    assert rows["L"].a == "x" and rows["L"].b is None
    assert rows["R"].b == 3.5 and rows["R"].a is None


def test_split_select_partitions_exactly(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "v int")
    tag = F.when(F.col("v") % 2 == 0, "even").otherwise("odd")
    branches = routing.split_select(df, tag, "even", "odd")
    assert branches["even"].count() == 5
    assert branches["odd"].count() == 5
    assert "_tag" not in branches["even"].columns


def test_topic_serde_round_trip(spark):
    """BaseJsonSerde round trip through the wire format, composite
    Trader key (TopicDef.java:20-23)."""
    t = model.TOPICS["market-orders"]
    df = spark.createDataFrame(
        [("BONOBO", "alice", None, "txn1", "BUY", 5)],
        "team string, name string, time timestamp, txnId string, "
        "type string, shares int")
    wire = t.encode(df)
    back = t.decode(wire).collect()[0]
    assert (back.team, back.name, back.txnId, back.type, back.shares) == (
        "BONOBO", "alice", "txn1", "BUY", 5)


def test_scalar_string_key_wire_format(spark):
    """String-keyed topics use a BARE JSON string key ("FOO"), not an
    object (JsonSerde.StringSerde — ADVICE round 1)."""
    t = model.TOPICS["share-price"]
    df = spark.createDataFrame(
        [("FOO", None, 2.5, 1.01)],
        "key string, time timestamp, coins double, forecastMult double")
    wire = df.transform(t.encode).collect()[0]
    assert wire.key == '"FOO"'  # bare JSON string, reference wire format
    back = t.decode(spark.createDataFrame([wire], ["key", "value"])).collect()[0]
    assert back.key == "FOO" and back.coins == 2.5


def test_corrupt_payload_decodes_null(spark):
    """Documented divergence: corrupt JSON -> null row (reference serde
    throws; we drop — model.py decode docstring)."""
    t = model.TOPICS["share-price"]
    raw = spark.createDataFrame([('"FOO"', "{not-json")], ["key", "value"])
    row = t.decode(raw).collect()[0]
    assert row.coins is None and row.forecastMult is None


def test_running_sum_scalable_matches_sequential(spark):
    """The two-phase prefix sum equals the single-partition window on
    integer accumulators, including negative values and multiple keys."""
    import random

    from mktd6_flink_spark.operators import windows

    rng = random.Random(13)
    rows = [(f"k{i % 3}", i, rng.randint(-50, 50)) for i in range(2000)]
    df = spark.createDataFrame(rows, "k string, seq int, v long")
    simple = windows.running_sum(df, ["k"], ["seq"], "v", "rs")
    scalable = windows.running_sum_scalable(df, ["k"], ["seq"], "v", "rs",
                                            partitions=16)
    a = {(r.k, r.seq): r.rs for r in simple.collect()}
    b = {(r.k, r.seq): r.rs for r in scalable.collect()}
    assert a == b


def test_trader_fold_randomized_differential(spark):
    """Two independent ST6 implementations — the JVM Column fold
    (folds.trader_state_fold) and the pure-Python step
    (streaming/stateful.trader_ledger_step) — must agree on 200 random
    updater sequences (deltas spanning accepts, both rejection paths,
    bailout triggers, INVEST/FEED mixes)."""
    import random

    from mktd6_flink_spark.streaming import stateful

    rng = random.Random(42)
    rows = []
    for k in range(200):
        for i in range(rng.randint(1, 12)):
            utype = rng.choice(["MARKET", "MARKET", "INVEST", "FEED"])
            if utype == "MARKET":
                sh = rng.randint(-6, 6)
                rows.append((f"k{k}", i, f"t{i}", utype,
                             round(-sh * 2.0, 2), sh, False, 0, 0))
            elif utype == "INVEST":
                inv = round(rng.uniform(0.5, 12.0), 2)
                rows.append((f"k{k}", i, f"t{i}", utype, -inv, 0, False, 0, 1))
            else:
                m = rng.randint(1, 4)
                rows.append((f"k{k}", i, f"t{i}", utype, 0.0, -m, False, m, 0))
    schema = ("trader string, seq long, txnId string, type string, "
              "coinsDiff double, sharesDiff int, addBailout boolean, "
              "fedMonkeys int, investDiff int")
    df = spark.createDataFrame(rows, schema)

    from mktd6_flink_spark.operators import folds

    jvm = {
        r.trader: (r.state.coins, r.state.shares, r.state.bailouts,
                   r.state.fedMonkeys, r.state.inFlightInvestments)
        for r in folds.fold_by_key(
            df, ["trader"], ["seq"],
            ["txnId", "type", "coinsDiff", "sharesDiff", "addBailout",
             "fedMonkeys", "investDiff"],
            folds.trader_state_fold, "state").collect()
    }

    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r[0], []).append(r)
    step = stateful.trader_ledger_step()
    for k, seq in by_key.items():
        state = None
        for (_, _, txn, utype, cd, sd, ab, fm, iv) in sorted(
                seq, key=lambda x: x[1]):
            state, _ = step(state, {
                "txnId": txn, "type": utype, "coinsDiff": cd,
                "sharesDiff": sd, "addBailout": ab, "fedMonkeys": fm,
                "investDiff": iv})
        py = (state[0], state[1], state[2], state[3], state[4])
        assert abs(jvm[k][0] - py[0]) < 1e-9 and jvm[k][1:] == py[1:], (
            k, jvm[k], py)


def test_parse_market_order_hypothesis(spark):
    """Property test: the Spark parser's Either routing must agree with
    an independent Python transliteration of the reference's
    parseOrder try/catch (Chapter02:237-260) on arbitrary inputs —
    batched through one DataFrame so hypothesis drives variety, Spark
    evaluates once."""
    import re

    from hypothesis import given, settings, strategies as st

    pat = re.compile(
        r"(?i)^([a-z0-9]+) ([a-z0-9]+) ([a-z0-9]+) (BUY|SELL) ([0-9]+)$")

    def py_reference(text: str):
        m = pat.match(text)
        if not m:
            return None
        try:
            t = int(m.group(1))       # Long.parseLong
            if not (-2**63 <= t < 2**63):
                return None
            sh = int(m.group(5))      # Integer.parseInt
            if not (-2**31 <= sh < 2**31):
                return None
        except ValueError:
            return None
        if m.group(4) not in ("BUY", "SELL"):
            return None                # case-sensitive valueOf throws
        return (t, m.group(2), m.group(3), m.group(4), sh)

    token = st.text(alphabet="abcxyz0189", min_size=0, max_size=12)
    line = st.one_of(
        st.tuples(token, token, token,
                  st.sampled_from(["BUY", "SELL", "buy", "HOLD", ""]),
                  token).map(lambda t: " ".join(t)),
        st.text(alphabet="abc019 _-!", min_size=0, max_size=30),
    )

    collected = []

    @settings(max_examples=300, deadline=None)
    @given(line)
    def gather(s):
        collected.append(s)

    gather()
    texts = sorted(set(collected))
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    out = df.select(
        "text", stateless.parse_market_order(F.col("text")).alias("o"))
    for r in out.collect():
        exp = py_reference(r.text)
        got = (None if r.o is None else
               (r.o.time_ms, r.o.player, r.o.txnId, r.o.type, r.o.shares))
        assert got == exp, (r.text, got, exp)


def test_bucketed_join_eliminates_shuffle(spark, tmp_path):
    """100 TB technique: bucketing both join sides on the key lets the
    sort-merge join read co-located buckets with NO Exchange in the
    physical plan — the repeated-join workhorse for the settlement
    ledger's trader key at scale."""
    import contextlib
    import io

    a = spark.createDataFrame(
        [(i, i * 2.0) for i in range(1000)], "k long, v double")
    b = spark.createDataFrame(
        [(i, f"n{i}") for i in range(1000)], "k long, name string")
    # warehouse dir is a static conf; use the default (gitignored) and
    # drop the managed tables afterwards
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for name, df in [("bt_a", a), ("bt_b", b)]:
            (df.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
             .saveAsTable(name))
        ta, tb = spark.table("bt_a"), spark.table("bt_b")
        joined = ta.join(tb, "k")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain()
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan  # bucket-co-located: no shuffle
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_serde_ignores_unknown_fields(spark):
    """FAIL_ON_UNKNOWN_PROPERTIES=false (BaseJsonSerde.java:24): wire
    payloads with extra fields decode cleanly, extras dropped."""
    t = model.TOPICS["share-price"]
    raw = spark.createDataFrame(
        [('"FOO"',
          '{"time":null,"coins":2.5,"forecastMult":1.01,'
          '"surprise":"ignored","nested":{"a":1}}')],
        ["key", "value"])
    row = t.decode(raw).collect()[0]
    assert (row.key, row.coins, row.forecastMult) == ("FOO", 2.5, 1.01)


def test_asof_join_randomized_differential(spark):
    """asof_join must agree with a per-row Python brute force (latest
    right value at-or-before each left time, per key) on 60 random
    key-sets in both fallback modes. Right (key, time) pairs are unique
    (the operator contract: dedupe ties upstream, as asof_join_price
    does with max_by)."""
    import random

    from mktd6_flink_spark.operators import asof

    rng = random.Random(7)
    lrows, rrows, rseen = [], [], set()
    for k in range(60):
        key = f"k{k}"
        for _ in range(rng.randint(1, 8)):
            lrows.append((key, rng.randint(0, 30), len(lrows)))
        for _ in range(rng.randint(0, 5)):
            t = rng.randint(0, 30)
            if (key, t) not in rseen:
                rseen.add((key, t))
                rrows.append((key, t, round(rng.uniform(0, 9), 2)))
    left = spark.createDataFrame(lrows, "k string, t long, lid long")
    right = spark.createDataFrame(rrows, "k string, t long, price double")

    def brute(fallback):
        by_key: dict = {}
        for (key, t, v) in rrows:
            by_key.setdefault(key, []).append((t, v))
        out = {}
        for (key, lt, lid) in lrows:
            cand = [(t, v) for t, v in by_key.get(key, []) if t <= lt]
            if cand:
                out[lid] = max(cand)[1]
            elif fallback == "first" and by_key.get(key):
                out[lid] = min(by_key[key])[1]
            else:
                out[lid] = None
        return out

    for fb in ("null", "first"):
        for scalable in (False, True):
            got = {
                r.lid: r.asof_price
                for r in asof.asof_join(
                    left, right, on=["k"], left_time="t", right_time="t",
                    value_cols=["price"], fallback=fb,
                    scalable=scalable).collect()
            }
            exp = brute(fb)
            assert got == exp, (fb, scalable,
                                {i: (got[i], exp[i]) for i in got
                                 if got[i] != exp[i]})


def test_asof_join_scalable_constant_key(spark):
    """The scalable two-phase plan must be bit-identical to the plain
    window plan on a CONSTANT key (the reference's "FOO" hotspot) with
    many more rows than range partitions, in both fallback modes."""
    import random

    from mktd6_flink_spark.operators import asof

    rng = random.Random(13)
    lrows = [("FOO", rng.randint(0, 5000), i) for i in range(800)]
    rrows = [("FOO", t, round(rng.uniform(1, 9), 3))
             for t in rng.sample(range(40, 5000), 60)]
    left = spark.createDataFrame(lrows, "k string, t long, lid long")
    right = spark.createDataFrame(rrows, "k string, t long, price double")
    for fb in ("null", "first"):
        plain = {
            r.lid: r.asof_price
            for r in asof.asof_join(
                left, right, ["k"], "t", "t", ["price"],
                fallback=fb).collect()}
        twophase = {
            r.lid: r.asof_price
            for r in asof.asof_join(
                left, right, ["k"], "t", "t", ["price"],
                fallback=fb, scalable=True, partitions=16).collect()}
        assert plain == twophase


def test_salted_join_matches_plain_join(spark):
    """salted_join must return exactly the plain join's rows (the salt
    only splits partitions) — inner and left joins, skewed keys."""
    import random

    from mktd6_flink_spark.operators import skew

    rng = random.Random(3)
    facts = [(f"k{rng.randint(0, 3)}", i, rng.random())
             for i in range(500)] + [("orphan", 999, 0.5)]
    dims = [(f"k{j}", f"d{j}") for j in range(4)]
    f = spark.createDataFrame(facts, "k string, fid long, v double")
    d = spark.createDataFrame(dims, "k string, label string")
    for how in ("inner", "left"):
        plain = {tuple(r) for r in
                 f.join(d, ["k"], how).select("k", "fid", "label").collect()}
        salted = {tuple(r) for r in
                  skew.salted_join(f, d, ["k"], "fid", 8, how)
                  .select("k", "fid", "label").collect()}
        assert plain == salted


def test_session_window_gap_boundary(spark):
    """Pin F.session_window's gap boundary at microsecond precision: an
    event EXACTLY gap after the previous EXTENDS the session (Spark
    merges on diff <= gap — the session end is inclusive); one
    microsecond over starts a new one. The DuckDB oracle twin
    (w6_session_window) encodes the same > rule."""
    from pyspark.sql import functions as F

    gap_us = 300_000_000
    ts = [0,
          gap_us,                       # exactly gap -> extends session 1
          gap_us + gap_us + 1,          # gap + 1us -> NEW session
          gap_us + gap_us + 1 + gap_us]  # extends session 2
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ts)], "id long, t_us long"
    ).select("id", F.timestamp_micros(F.col("t_us")).alias("ts"))
    out = (
        df.groupBy(F.session_window("ts", "5 minutes").alias("_w"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.unix_micros(F.min("ts")).alias("first_us"))
        .orderBy("first_us")
        .collect()
    )
    assert [(r.n, r.first_us) for r in out] == [
        (2, 0), (2, 2 * gap_us + 1)]


def test_events_funnel_ordering_golden(spark, tmp_path):
    """Funnel counts only strictly-ordered progressions: a purchase
    BEFORE the user's first post-signup click must not count."""
    import pandas as pd

    rows = [
        # user 1: signup(1) -> click(2) -> purchase(3): full funnel
        (1, 1, 1_000_000, "signup"), (2, 1, 2_000_000, "click"),
        (3, 1, 3_000_000, "purchase"),
        # user 2: purchase(1) before signup(2) -> click(3): no purchase
        (4, 2, 1_000_000, "purchase"), (5, 2, 2_000_000, "signup"),
        (6, 2, 3_000_000, "click"),
        # user 3: click only: not in funnel at all
        (7, 3, 1_000_000, "click"),
    ]
    pdf = pd.DataFrame(
        [(eid, pd.Timestamp(us, unit="us"), uid, et, 1.0, "{}")
         for (eid, uid, us, et) in rows],
        columns=["event_id", "ts", "user_id", "event_type", "value",
                 "props"])
    path = str(tmp_path / "events.parquet")
    pdf.to_parquet(path, index=False)

    from mktd6_flink_spark.plans import driver_queries as dq

    out = {r.name: r.n_users
           for r in dq.QUERIES["events_funnel"](spark, str(tmp_path))
           .collect()}
    assert out == {"signup": 2, "click": 2, "purchase": 1}


def test_scalable_plans_deterministic_without_persist(spark):
    """Regression: block ids must be a pure function of the row
    (operators/blocks.py). The old repartitionByRange +
    spark_partition_id() ids were re-sampled per consumer whenever the
    conditional persist skipped (always at test scale), so the carry
    stitch could join block summaries to blocks that never existed —
    observed as run-to-run flips in dataflow_market_ledger. Repeated
    runs with the persist FORCED OFF must be identical to each other
    and to the plain single-partition plan."""
    import random

    from mktd6_flink_spark.operators import asof, cache, windows

    rng = random.Random(99)
    lrows = [("FOO", rng.randint(0, 5000), i) for i in range(600)]
    rrows = [("FOO", t, round(rng.uniform(1, 9), 3))
             for t in rng.sample(range(40, 5000), 50)]
    left = spark.createDataFrame(
        lrows, "k string, t long, lid long").repartition(7)
    right = spark.createDataFrame(rrows, "k string, t long, price double")
    srows = [("FOO", rng.randint(0, 5000), i, rng.randint(-5, 9))
             for i in range(600)]
    sdf = spark.createDataFrame(
        srows, "k string, t long, sid long, v long").repartition(7)
    spark.conf.set(cache.THRESHOLD_CONF, "never")
    try:
        plain_asof = {
            r.lid: r.asof_price
            for r in asof.asof_join(
                left, right, ["k"], "t", "t", ["price"],
                fallback="first").collect()}
        plain_rs = {
            r.sid: r.rs
            for r in windows.running_sum(
                sdf, ["k"], ["t", "sid"], "v", out="rs").collect()}
        for _ in range(3):
            got = {
                r.lid: r.asof_price
                for r in asof.asof_join(
                    left, right, ["k"], "t", "t", ["price"],
                    fallback="first", scalable=True,
                    partitions=16).collect()}
            assert got == plain_asof
            got_rs = {
                r.sid: r.rs
                for r in windows.running_sum_scalable(
                    sdf, ["k"], ["t", "sid"], "v", out="rs",
                    partitions=16).collect()}
            assert got_rs == plain_rs
    finally:
        spark.conf.unset(cache.THRESHOLD_CONF)


def test_rollup_subtotals_consistent(spark):
    """tpch_rollup invariants: per-region subtotal == sum of its nation
    rows, grand total == sum of region subtotals (exact in cents)."""
    from mktd6_flink_spark.plans import driver_queries as dq

    sf_dir = os.path.join(
        os.path.dirname(
            os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
            .rstrip("/")),
        "sf0.001")
    rows = dq.QUERIES["tpch_rollup"](spark, sf_dir).collect()
    cents = lambda v: round(v * 100)
    nations = [(r.r_name, cents(r.revenue)) for r in rows
               if r.n_name is not None]
    regions = {r.r_name: cents(r.revenue) for r in rows
               if r.n_name is None and r.r_name is not None}
    grand = [cents(r.revenue) for r in rows
             if r.r_name is None and r.n_name is None]
    assert len(grand) == 1
    for region, total in regions.items():
        assert total == sum(c for rn, c in nations if rn == region), region
    assert grand[0] == sum(regions.values())


def test_tpch_q8_q9_q11_invariants(spark):
    """Internal consistency of the round-8 TPC-H shapes at sf0.001:
    q8ish market shares are probabilities over exactly the two filtered
    order years; q9ish grouped profits reconcile against a direct
    one-pass total over the same join (same cents quantization); q11ish
    keeps only parts strictly above 2x the mean per-part value, and
    recomputing the mean from the unfiltered aggregate agrees."""
    from mktd6_flink_spark.plans import driver_queries as dq

    sf_dir = os.path.join(
        os.path.dirname(
            os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
            .rstrip("/")),
        "sf0.001")

    q8 = dq.QUERIES["tpch_q8ish"](spark, sf_dir).collect()
    assert sorted(r.o_year for r in q8) == [1995, 1996]
    assert all(0.0 <= r.mkt_share <= 1.0 for r in q8)

    q9 = dq.QUERIES["tpch_q9ish"](spark, sf_dir).collect()
    got_total = round(sum(r.sum_profit for r in q9) * 100)
    li = dq.load(spark, sf_dir, "lineitem")
    o = dq.load(spark, sf_dir, "orders").select("o_orderkey")
    s = dq.load(spark, sf_dir, "supplier").select("s_suppkey")
    p = dq.load(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")).select("p_partkey", "p_retailprice")
    direct = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(p, li.l_partkey == p.p_partkey)
        .agg(F.sum(
            dq._cents(F.col("l_extendedprice") * (1.0 - F.col("l_discount")))
            - dq._cents(F.col("p_retailprice") * F.col("l_quantity")
                        * F.lit(0.1))).alias("t"))
        .collect()[0].t)
    assert got_total == direct

    q11 = dq.QUERIES["tpch_q11ish"](spark, sf_dir).collect()
    assert len(q11) == len({r.p_partkey for r in q11})
    n3 = dq.load(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3").select("n_nationkey")
    sup3 = dq.load(spark, sf_dir, "supplier").join(
        n3, F.col("s_nationkey") == F.col("n_nationkey")).select("s_suppkey")
    val = (
        li.join(sup3, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(dq._cents(F.col("l_extendedprice"))).alias("vc"))
        .collect())
    tot, np_ = sum(r.vc for r in val), len(val)
    expect = {r.l_partkey for r in val if r.vc * np_ > 2 * tot}
    assert {r.p_partkey for r in q11} == expect


def test_bucketed_join_has_no_exchange(spark):
    """join_bucketed_colocated's claim made concrete: with both sides
    bucketed+sorted on the join key, the JOIN subtree contains no
    Exchange — the only shuffle in the whole plan is the final
    5-group aggregation, never the fact join."""
    import re

    from mktd6_flink_spark.plans import driver_queries as dq

    sf_dir = os.path.join(
        os.path.dirname(
            os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
            .rstrip("/")),
        "sf0.001")
    # at sf0.001 Catalyst would broadcast (also shuffle-free, but not
    # the path under test); force the merge join a 100 TB fact pair gets
    old = {k: spark.conf.get(k, None) for k in
           ("spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold")}
    try:
        for k in old:
            spark.conf.set(k, "-1")
        df = dq.QUERIES["join_bucketed_colocated"](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    join_at = plan.find("SortMergeJoin")
    assert join_at != -1, plan
    # no Exchange below the join (Spark prints children after parents)
    assert "Exchange" not in plan[join_at:], plan[join_at:]
    assert plan.count("Exchange") <= 1, plan  # only the final group-by
    assert "Bucketed: true" in plan, plan


def test_partition_pruning_skips_files(spark):
    """scan_partition_pruned's claim made concrete: the day filter
    reaches the scan as a PartitionFilter and the file index selects
    only the 3 matching day directories out of 30."""
    import re

    from mktd6_flink_spark.plans import driver_queries as dq

    sf_dir = os.path.join(
        os.path.dirname(
            os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
            .rstrip("/")),
        "sf0.001")
    df = dq.QUERIES["scan_partition_pruned"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the day filter must reach the scan as PartitionFilters — that is
    # where FileSourceScanExec prunes the file LISTING (dirs never
    # opened), the property that makes a 100 TB day-partitioned table
    # cost only the days touched
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "day_idx" in m.group(1), plan
    assert "19730" in m.group(1) and "19733" in m.group(1), m.group(1)
    # and the partitioned read returns exactly the 3 selected days
    days = {r.day_idx for r in df.select("day_idx").distinct().collect()}
    assert days == {19730, 19731, 19732}, days


def test_block_id_rejects_non_numeric_order():
    """with_block_id needs a numeric/timestamp/date leading order
    column; a string order column must fail loudly, not bucket by
    garbage."""
    import pytest as _pytest

    from mktd6_flink_spark.operators.blocks import with_block_id
    from mktd6_flink_spark.session import get_spark

    spark = get_spark("tests")
    df = spark.createDataFrame([("a", "x", 1)], "k string, o string, v int")
    with _pytest.raises(ValueError, match="numeric/timestamp/date"):
        with_block_id(df, ["k"], "o", 4)


def test_block_id_nan_sorts_last():
    """NaN sorts LAST under Spark's asc ordering, so NaN rows must land
    in the final block (and must not poison the span min/max used to
    place every other row)."""
    import math

    from mktd6_flink_spark.operators.blocks import with_block_id
    from mktd6_flink_spark.session import get_spark

    spark = get_spark("tests")
    rows = [("a", float(i), i) for i in range(100)]
    rows += [("a", float("nan"), 1000), ("a", None, -1)]
    df = spark.createDataFrame(rows, "k string, o double, v int")
    got = with_block_id(df, ["k"], "o", 4).select("o", "_pid").collect()
    pids = {}
    for r in got:
        key = ("nan" if r.o is not None and math.isnan(r.o)
               else ("null" if r.o is None else r.o))
        pids[key] = r._pid
    assert pids["nan"] == 3           # NaN → last block
    assert pids["null"] == 0          # NULL → first block
    # finite rows still spread over all blocks (span unpoisoned by NaN)
    finite = {p for k, p in pids.items() if k not in ("nan", "null")}
    assert finite == {0, 1, 2, 3}
    # block id monotone with sort order over the finite values
    order = sorted((k for k in pids if k not in ("nan", "null")))
    seq = [pids[k] for k in order]
    assert seq == sorted(seq)


def test_bucketed_range_join_equals_naive(spark):
    """The bin-bucketed range join must be row-identical to the naive
    equi-key + range-filter join on adversarial inputs: a hot key with
    many rows, timestamps exactly on bin boundaries, intervals with a
    negative lower bound, and keys present on only one side."""
    import random

    from mktd6_flink_spark.operators.rangejoin import bucketed_range_join

    rng = random.Random(7)
    W = 1000
    lrows = [(k, t, i)
             for i, (k, t) in enumerate(
                 [("hot", rng.randint(0, 20 * W)) for _ in range(300)]
                 + [("cold", rng.randint(0, 20 * W)) for _ in range(20)]
                 + [("hot", j * W) for j in range(5)]      # exact bins
                 + [("left_only", 3 * W)])]
    rrows = [(k, t, 100 + i)
             for i, (k, t) in enumerate(
                 [("hot", rng.randint(0, 20 * W)) for _ in range(300)]
                 + [("cold", rng.randint(0, 20 * W)) for _ in range(20)]
                 + [("hot", j * W) for j in range(5)]
                 + [("right_only", 3 * W)])]
    left = spark.createDataFrame(lrows, "k string, lt long, lid long")
    right = spark.createDataFrame(rrows, "k string, rt long, rid long")

    for lo, hi in [(0, W), (-W, 0), (-W // 2, W // 2), (1, W + 1)]:
        got = {(r.lid, r.rid) for r in bucketed_range_join(
            left, right, ["k"], "lt", "rt", lo, hi).collect()}
        from pyspark.sql import functions as F
        want = {(r.lid, r.rid) for r in left.join(
            right, (left.k == right.k)
            & (right.rt >= left.lt + F.lit(lo))
            & (right.rt <= left.lt + F.lit(hi))).collect()}
        assert got == want, f"bounds ({lo},{hi}): {len(got)} vs {len(want)}"


def test_bucketed_range_join_nulls_and_contract(spark):
    """Locks the edge contract: NULL keys/timestamps pair with nothing
    (naive-join parity), empty and negative-width intervals raise, and
    an input already carrying the internal bin column is rejected
    instead of being silently overwritten."""
    import pytest
    from pyspark.sql import functions as F

    from mktd6_flink_spark.operators.rangejoin import (_BIN,
                                                       bucketed_range_join)

    lrows = [("a", 0, 0), ("a", 10, 1), (None, 5, 2), ("a", None, 3)]
    rrows = [("a", 5, 100), (None, 5, 101), ("a", None, 102),
             ("b", 5, 103)]
    left = spark.createDataFrame(lrows, "k string, lt long, lid long")
    right = spark.createDataFrame(rrows, "k string, rt long, rid long")

    got = {(r.lid, r.rid) for r in bucketed_range_join(
        left, right, ["k"], "lt", "rt", 0, 10).collect()}
    want = {(r.lid, r.rid) for r in left.join(
        right, (left.k == right.k)
        & (right.rt >= left.lt + F.lit(0))
        & (right.rt <= left.lt + F.lit(10))).collect()}
    assert got == want == {(0, 100)}

    for lo, hi in [(0, 0), (5, 5), (10, 3), (-2, -7)]:
        with pytest.raises(ValueError, match="empty interval"):
            bucketed_range_join(left, right, ["k"], "lt", "rt", lo, hi)

    with pytest.raises(ValueError, match=_BIN.replace("$", r"\$")):
        bucketed_range_join(left.withColumn(_BIN, F.lit(0)), right,
                            ["k"], "lt", "rt", 0, 10)
    with pytest.raises(ValueError, match="right input"):
        bucketed_range_join(left, right.withColumn(_BIN, F.lit(0)),
                            ["k"], "lt", "rt", 0, 10)


def test_bucketed_range_join_exact_beyond_double(spark):
    """Timestamps past 2^53 (ns-scale epochs): float-division binning
    rounds |ts| ≥ 2^53 to the wrong bin and silently drops matching
    pairs; the decimal/pmod path must stay exact over the full int64
    range. Pairs straddle bin boundaries at +/-2^60 so a single ULP of
    rounding error flips the result."""
    from pyspark.sql import functions as F

    from mktd6_flink_spark.operators.rangejoin import bucketed_range_join

    base = 2 ** 60
    width = 3_600_000_000  # one hour in µs — the repo's real bin width
    lrows, rrows = [], []
    for i, b in enumerate([base, -base, base + 7 * width]):
        start = (b // width) * width  # bin-aligned anchor near b
        # right rows just inside/outside [lt, lt+width] for lt=start+1
        lrows.append(("k", start + 1, i))
        rrows.append(("k", start + 1 + width, 100 + i))   # inside (edge)
        rrows.append(("k", start + 2 + width, 200 + i))   # outside by 1µs
        rrows.append(("k", start + 1, 300 + i))           # inside (start)
        rrows.append(("k", start, 400 + i))               # outside by 1µs
    left = spark.createDataFrame(lrows, "k string, lt long, lid long")
    right = spark.createDataFrame(rrows, "k string, rt long, rid long")

    got = {(r.lid, r.rid) for r in bucketed_range_join(
        left, right, ["k"], "lt", "rt", 0, width).collect()}
    want = {(r.lid, r.rid) for r in left.join(
        right, (left.k == right.k)
        & (right.rt >= left.lt + F.lit(0))
        & (right.rt <= left.lt + F.lit(width))).collect()}
    assert got == want
    assert {(i, 100 + i) for i in range(3)} <= got
    assert {(i, 300 + i) for i in range(3)} <= got
    assert not any(rid >= 200 and rid < 300 for _, rid in got)
    assert not any(rid >= 400 for _, rid in got)
