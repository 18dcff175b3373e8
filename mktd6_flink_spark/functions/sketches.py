"""Portable probabilistic sketches: HyperLogLog distinct-count and a
Bloom-filter join prefilter.

Both are standard large-scale techniques a 100 TB pipeline leans on —
cardinality estimation without a count-distinct shuffle of raw values,
and semi-join reduction of a big fact table before the real join — and
both are built on the portable md5 hash family (functions/hashing.py) so
the ORACLE CAN CHECK THEM BIT-FOR-BIT: Spark's own approx_count_distinct
/ BloomFilter use engine-private hashing (xxhash64) that DuckDB cannot
reproduce, while these compute identical registers/bitmaps in both
engines from the same public definitions.

HLL (Flajolet et al., "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm", AofA 2007):
- bucket = h mod m, the remaining 52 bits w = h div m give
  rho = (leading zeros in the 52-bit field) + 1 computed EXACTLY as
  53 - bitlen(w) via length(bin(w)) — no floating log anywhere;
- registers are max(rho) per (group, bucket): one m-bounded shuffle;
- the indicator sum is kept in INTEGER space: sum(2^(53-M_j)) + empty
  buckets * 2^53 is exact in int64 (m * 2^53 <= 2^61 for m <= 256), so
  cross-engine float-summation order can never flip a bit. Only the
  final estimate divides in IEEE doubles, identically on both sides.
- small-range (linear counting) correction per the paper when
  E <= 2.5m and empty buckets exist.

Bloom (Bloom, CACM 1970; broadcast-bloom semi-join reduction is the
classic distributed-join optimization, cf. Spark's own
spark.sql.optimizer.runtime.bloomFilter):
- k positions per key from the universal hash family over md5;
- the bitmap is w words of 62 usable bits each (shifts never touch the
  int64 sign bit, which DuckDB rejects as overflow) built by bit_or in
  ONE tiny aggregation (w rows), then densified into a single
  array<long> row that BROADCASTS to the big side — membership is a
  pure map-side element_at + mask test, the big side never shuffles.

Reference parity note: the reference engine (mktd6-flink) has no sketch
operators; these extend the engine for the training-data-pipeline layer
the same way dedup/similarity do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .hashing import (hash_params, md5_long, sql_md5_long,
                      sql_universal_hash, universal_hash)

# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

# 52 = 60 md5 bits - 8 bucket bits is an upper bound for any m >= 256;
# for smaller m the field is wider, so size the rho offset per call.


def _hll_alpha(m: int) -> str:
    """The paper's alpha_m as a literal arithmetic EXPRESSION string —
    evaluated in IEEE doubles identically by both engines (never
    pre-evaluate in Python: repr rounding would diverge)."""
    if m == 16:
        return "0.673"
    if m == 32:
        return "0.697"
    if m == 64:
        return "0.709"
    return f"(0.7213 / (1.0 + 1.079 / {m}.0))"


def hll_registers(df: DataFrame, group_cols: list[str], value: Column,
                  b: int = 6) -> DataFrame:
    """The HLL register table: group_cols + (_bucket, _M = max rho).

    This IS the sketch — union-able across partitions/days/streams by
    re-maxing on (group, _bucket), which is what makes it the 100 TB
    cardinality currency. Works identically on a batch frame and a
    streaming one (pure projection + groupBy-max: streamable in
    complete/update mode with per-bucket incremental state).
    """
    m = 1 << b
    wbits = 60 - b  # width of the rho field
    h = md5_long(value.cast("string"))
    bucket = F.pmod(h, F.lit(m))
    # exact h div m: m is a power of two, so shift — h is 60 bits and a
    # double-division detour would round past 2^53
    w = F.shiftright(h, b)
    rho = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits + 1) - F.length(F.bin(w)))
    return (
        df.select(*group_cols, bucket.alias("_bucket"), rho.alias("_rho"))
        .groupBy(*group_cols, "_bucket")
        .agg(F.max("_rho").alias("_M"))
    )


def hll_finalize(regs: DataFrame, group_cols: list[str],
                 b: int = 6) -> DataFrame:
    """Collapse a register table into the estimate:
    group_cols + (hll_est double, hll_empty_buckets int)."""
    m = 1 << b
    # integer indicator: sum over present buckets of 2^(R-M), empty
    # buckets contribute 2^R each (R = wbits+1, the max rho)
    R = 60 - b + 1
    est = (
        regs.groupBy(*group_cols)
        .agg(
            # F.shiftleft requires a literal shift amount; _M is a named
            # column here so the SQL form takes the column shift
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {R} - _M)"))
            .alias("_s_present"),
            F.count("*").alias("_nbuckets"),
        )
        .withColumn("_empty", (F.lit(m) - F.col("_nbuckets")).cast("int"))
        .withColumn(
            "_s",
            F.col("_s_present")
            + F.col("_empty").cast("long") * F.lit(1 << R).cast("long"))
        .withColumn(
            "_e_raw",
            F.expr(f"{_hll_alpha(m)} * {m}.0 * {m}.0 "
                   f"* CAST({1 << R} AS DOUBLE) / CAST(_s AS DOUBLE)"))
        .withColumn(
            "hll_est",
            F.when((F.col("_e_raw") <= F.lit(2.5 * m))
                   & (F.col("_empty") > 0),
                   F.expr(f"{m}.0 * ln({m}.0 / CAST(_empty AS DOUBLE))"))
            .otherwise(F.col("_e_raw")))
    )
    from .hashing import round_portable

    return est.select(
        *group_cols,
        round_portable(F.col("hll_est"), 6).alias("hll_est"),
        F.col("_empty").alias("hll_empty_buckets"))


def hll_distinct(df: DataFrame, group_cols: list[str], value: Column,
                 b: int = 6) -> DataFrame:
    """Estimated distinct ``value`` per group via an m=2^b-register HLL.

    Output: group_cols + (hll_est double, hll_empty_buckets int).
    Cost: one shuffle bounded by |groups| * m rows, then one by
    |groups| — never a shuffle of distinct raw values.
    """
    return hll_finalize(hll_registers(df, group_cols, value, b),
                        group_cols, b)


def sql_hll_distinct(table_sql: str, group_cols: list[str],
                     value_expr: str, b: int = 6) -> str:
    """DuckDB twin of :func:`hll_distinct` — same registers, same
    integer indicator sum, same correction branch."""
    m = 1 << b
    R = 60 - b + 1
    g = ", ".join(group_cols)
    h = sql_md5_long(f"CAST({value_expr} AS VARCHAR)")
    return f"""
    WITH _hll_in AS ({table_sql}),
    _hll_h AS (
      SELECT {g}, {h} AS _h FROM _hll_in
    ),
    _hll_rho AS (
      SELECT {g}, _h % {m} AS _bucket,
             CASE WHEN _h // {m} = 0 THEN {R}
                  ELSE {R} - length(bin(_h // {m})) END AS _rho
      FROM _hll_h
    ),
    _hll_regs AS (
      SELECT {g}, _bucket, max(_rho) AS _M
      FROM _hll_rho GROUP BY {g}, _bucket
    ),
    _hll_sum AS (
      SELECT {g},
             sum((CAST(1 AS BIGINT) << ({R} - _M))) AS _s_present,
             count(*) AS _nbuckets
      FROM _hll_regs GROUP BY {g}
    ),
    _hll_est AS (
      SELECT {g},
             CAST({m} - _nbuckets AS INTEGER) AS _empty,
             _s_present + ({m} - _nbuckets) * (CAST(1 AS BIGINT) << {R})
               AS _s
      FROM _hll_sum
    )
    SELECT {g},
           ROUND6(CASE WHEN ({_hll_alpha(m)} * {m}.0 * {m}.0
                        * CAST(CAST(1 AS BIGINT) << {R} AS DOUBLE)
                        / CAST(_s AS DOUBLE)) <= {2.5 * m}
                       AND _empty > 0
                  THEN {m}.0 * ln({m}.0 / CAST(_empty AS DOUBLE))
                  ELSE ({_hll_alpha(m)} * {m}.0 * {m}.0
                        * CAST(CAST(1 AS BIGINT) << {R} AS DOUBLE)
                        / CAST(_s AS DOUBLE)) END) AS hll_est,
           _empty AS hll_empty_buckets
    FROM _hll_est
    """


# ---------------------------------------------------------------------------
# Bloom-filter join prefilter
# ---------------------------------------------------------------------------

WORD_BITS = 62  # 1 << 62 is the largest shift both engines allow

# Internal columns injected into the probe side; collision-resistant
# names, rejected if the input already carries them (same hazard class
# operators/rangejoin.py guards with _BIN).
_ARR = "__bloom_arr__"
_P = "__bloom_p{}__"


def bloom_bitmap(small: DataFrame, key: Column, k: int = 3,
                 bits: int = 4092) -> DataFrame:
    """One-row DataFrame holding the dense ``array<long>`` bitmap
    (bits/62 words of 62 usable bits) over the small side's keys. The
    word aggregation is bits/62 rows — constant-size regardless of
    input, so the final single-row densification is not a scale hazard;
    the row then broadcasts to the probe side."""
    assert bits % WORD_BITS == 0
    words = bits // WORD_BITS
    h = md5_long(key.cast("string"))
    pos = [F.pmod(universal_hash(h, a, b_), F.lit(bits)) for a, b_ in
           hash_params(k)]
    word_rows = (
        small.select(F.explode(F.array(*pos)).alias("_p"))
        # shiftleft needs the shift as a named-column SQL expression
        .select(
            ((F.col("_p") - F.pmod(F.col("_p"), F.lit(WORD_BITS)))
             / F.lit(WORD_BITS)).cast("long").alias("_word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), "
                   f"CAST(pmod(_p, {WORD_BITS}) AS INT))").alias("_mask"))
        .groupBy("_word").agg(F.bit_or("_mask").alias("_bits"))
    )
    return word_rows.agg(
        F.map_from_entries(F.collect_list(F.struct("_word", "_bits")))
        .alias("_m")
    ).select(
        F.transform(
            F.sequence(F.lit(0).cast("long"),
                       F.lit(words - 1).cast("long")),
            lambda i: F.coalesce(F.element_at(F.col("_m"), i),
                                 F.lit(0).cast("long")),
        ).alias(_ARR))


def bloom_filter(big: DataFrame, key: Column, bitmap: DataFrame,
                 k: int = 3, bits: int = 4092) -> DataFrame:
    """Rows of ``big`` whose key passes the Bloom membership test —
    a superset of the true semi-join (false positives, never negatives).
    Pure map-side: the 1-row bitmap broadcasts, each row tests its k
    positions with element_at + mask; the big side never shuffles."""
    reserved = [_ARR] + [_P.format(j) for j in range(k)]
    clash = [c for c in big.columns if c in reserved]
    if clash:
        raise ValueError(
            f"bloom_filter input already has internal column(s) {clash}")
    h = md5_long(key.cast("string"))
    probed = big.crossJoin(F.broadcast(bitmap))
    pcols = []
    for j, (a, b_) in enumerate(hash_params(k)):
        pc = _P.format(j)
        pcols.append(pc)
        probed = probed.withColumn(
            pc, F.pmod(universal_hash(h, a, b_), F.lit(bits)))
    cond = None
    for pc in pcols:
        word = ((F.col(pc) - F.pmod(F.col(pc), F.lit(WORD_BITS)))
                / F.lit(WORD_BITS)).cast("long")
        mask = F.expr("shiftleft(CAST(1 AS BIGINT), "
                      f"CAST(pmod({pc}, {WORD_BITS}) AS INT))")
        test = F.element_at(F.col(_ARR),
                            (word + 1).cast("int")).bitwiseAND(mask) != 0
        cond = test if cond is None else (cond & test)
    return probed.filter(cond).drop(_ARR, *pcols)


def bloom_filter_literal(big: DataFrame, key: Column, words: list[int],
                         k: int = 3, bits: int = 4092) -> DataFrame:
    """``bloom_filter`` with the bitmap embedded as a PLAN LITERAL —
    Spark's own runtime-bloom-filter shape: the word array is CONSTANT
    SIZE (bits/62 longs, independent of build-side row count), so
    materializing it on the driver and inlining it turns the probe into
    a bare scan+filter inside whole-stage codegen (no BroadcastExchange,
    no nested-loop probe join). Same positions, same membership
    predicate, bit-identical results (verified row-for-row vs
    ``bloom_filter`` at sf0.1).

    The md5 base hash is evaluated ONCE per row by computing it in an
    ``F.aggregate`` zero-accumulator and reading the lambda VARIABLE in
    the finish clause: a plain k-conjunct filter inlines the md5
    subtree 2k times (Catalyst substitutes projected columns into
    pushed predicates and codegen does not CSE across filter
    conjuncts) — the round-9 isolate profile showed that repetition,
    not the bitmap build, was join_bloom_prefilter's whole bench
    regression (probe 1.17 s -> 0.54 s at sf0.1)."""
    assert len(words) == bits // WORD_BITS, (len(words), bits // WORD_BITS)
    # one true array Literal (F.lit(list) constant-folds) — a
    # CreateArray of 66 literal children is rebuilt per evaluation and
    # measured SLOWER than the broadcast join it replaced
    arr = F.lit([int(w) for w in words]).cast("array<long>")
    h = md5_long(key.cast("string"))

    def _tests(hvar: Column) -> Column:
        cond = None
        for a, b_ in hash_params(k):
            p = F.pmod(universal_hash(hvar, a, b_), F.lit(bits))
            word = ((p - F.pmod(p, F.lit(WORD_BITS)))
                    / F.lit(WORD_BITS)).cast("long")
            # 2.0**n is exact for n in [0, 61] (a pure exponent-field
            # double); F.shiftleft needs a literal shift and F.expr
            # cannot name a lambda variable, so the power form is the
            # portable in-lambda spelling of (1 << n)
            mask = (F.lit(2.0)
                    ** F.pmod(p, F.lit(WORD_BITS)).cast("double")
                    ).cast("long")
            test = F.element_at(
                arr, (word + 1).cast("int")).bitwiseAND(mask) != 0
            cond = test if cond is None else (cond & test)
        return cond

    cond = F.aggregate(
        F.lit([1]),                      # one dummy element
        F.struct(h.alias("h")),          # zero: md5 evaluated ONCE
        lambda acc, _: acc,              # merge: pass-through
        lambda acc: _tests(acc["h"]))    # finish: k cheap table probes
    return big.filter(cond)


def sql_bloom_positions(key_expr: str, k: int, bits: int) -> list[str]:
    h = sql_md5_long(f"CAST({key_expr} AS VARCHAR)")
    return [f"({sql_universal_hash(h, a, b_)} % {bits})"
            for a, b_ in hash_params(k)]


def sql_bloom_filter(small_sql: str, small_key: str, big_sql: str,
                     big_key: str, k: int = 3, bits: int = 4092) -> str:
    """DuckDB twin: identical positions, identical words, identical
    dense list, identical membership predicate. Returns a CTE chain
    ending in ``_bloom_pass`` (all columns of the big side that pass)."""
    words = bits // WORD_BITS
    small_pos = sql_bloom_positions(small_key, k, bits)
    pos_union = " UNION ALL ".join(
        f"SELECT {p} AS _p FROM _bloom_small" for p in small_pos)
    big_tests = " AND ".join(
        f"(_bloom_arr.arr[CAST({p} // {WORD_BITS} AS INTEGER) + 1]"
        f" & (CAST(1 AS BIGINT) << CAST({p} % {WORD_BITS} AS INTEGER)))"
        f" != 0"
        for p in (f"({q})" for q in sql_bloom_positions(big_key, k, bits)))
    return f"""
    _bloom_small AS ({small_sql}),
    _bloom_pos AS ({pos_union}),
    _bloom_words AS (
      SELECT _p // 62 AS _word,
             bit_or(CAST(1 AS BIGINT) << CAST(_p % 62 AS INTEGER))
               AS _bits
      FROM _bloom_pos GROUP BY 1
    ),
    _bloom_arr AS (
      SELECT list(coalesce(w._bits, 0) ORDER BY s.i) AS arr
      FROM generate_series(0, {words - 1}) AS s(i)
      LEFT JOIN _bloom_words w ON w._word = s.i
    ),
    _bloom_big AS ({big_sql}),
    _bloom_pass AS (
      SELECT _bloom_big.* FROM _bloom_big, _bloom_arr
      WHERE {big_tests}
    )
    """


# ---------------------------------------------------------------------------
# Count-min sketch (frequency estimation)
# ---------------------------------------------------------------------------

def cms_counters(df: DataFrame, value: Column, d: int = 3,
                 w: int = 512) -> DataFrame:
    """The count-min counter table (Cormode & Muthukrishnan, J.Alg
    2005): d universal-hash rows x w counters; returns (_row, _slot,
    _cnt). Like the HLL registers this IS the sketch — d*w integers
    regardless of input size, mergeable by summing slot-wise — so
    per-day/per-partition frequency summaries union at constant cost.
    Build is one explode(d) + groupBy on (row, slot): partial-agg
    map-side, shuffle bounded by d*w rows per task. All-integer, so the
    oracle match is exact by construction."""
    h = md5_long(value.cast("string"))
    rows = F.array(*[
        F.struct(F.lit(j).alias("_row"),
                 F.pmod(universal_hash(h, a, b_), F.lit(w)).alias("_slot"))
        for j, (a, b_) in enumerate(hash_params(d))])
    return (
        df.select(F.explode(rows).alias("_rs"))
        .select("_rs._row", "_rs._slot")
        .groupBy("_row", "_slot")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )


def cms_estimate(counters: DataFrame, probe: DataFrame, key: Column,
                 d: int = 3, w: int = 512) -> DataFrame:
    """Point-frequency estimates for ``probe`` keys: est = min over the
    d rows of the key's counter (an over-estimate, never under). The
    counter table broadcasts (d*w rows); probes are map-side joins."""
    probed = probe.select(key.alias("_key"))
    h = md5_long(F.col("_key").cast("string"))
    for j, (a, b_) in enumerate(hash_params(d)):
        probed = probed.withColumn(
            f"_slot{j}", F.pmod(universal_hash(h, a, b_), F.lit(w)))
    out = probed
    for j in range(d):
        cj = counters.filter(F.col("_row") == j).select(
            F.col("_slot").alias(f"_s{j}"),
            F.col("_cnt").alias(f"_c{j}"))
        out = out.join(F.broadcast(cj),
                       out[f"_slot{j}"] == cj[f"_s{j}"], "left")
    est = F.least(*[F.coalesce(F.col(f"_c{j}"), F.lit(0))
                    for j in range(d)])
    return out.select(F.col("_key"), est.alias("cms_est"))


def sql_cms_estimate(table_sql: str, value_expr: str, probe_sql: str,
                     probe_key: str, d: int = 3, w: int = 512) -> str:
    """DuckDB twin: identical counters, identical min-over-rows."""
    h_in = sql_md5_long(f"CAST({value_expr} AS VARCHAR)")
    h_probe = sql_md5_long(f"CAST({probe_key} AS VARCHAR)")
    slot_rows = " UNION ALL ".join(
        f"SELECT {j} AS _row, "
        f"({sql_universal_hash('_h', a, b_)}) % {w} AS _slot "
        f"FROM _cms_h"
        for j, (a, b_) in enumerate(hash_params(d)))
    probe_mins = ", ".join(
        f"(SELECT coalesce(min(_cnt), 0) FROM _cms_counters c "
        f"WHERE c._row = {j} AND c._slot = "
        f"({sql_universal_hash('p._h', a, b_)}) % {w}) AS _e{j}"
        for j, (a, b_) in enumerate(hash_params(d)))
    least_expr = "least(" + ", ".join(f"_e{j}" for j in range(d)) + ")"
    return f"""
    WITH _cms_in AS ({table_sql}),
    _cms_h AS (SELECT {h_in} AS _h FROM _cms_in),
    _cms_slots AS ({slot_rows}),
    _cms_counters AS (
      SELECT _row, _slot, count(*) AS _cnt
      FROM _cms_slots GROUP BY _row, _slot
    ),
    _cms_probe AS (
      SELECT {probe_key} AS _key, {h_probe} AS _h FROM ({probe_sql})
    ),
    _cms_est AS (
      SELECT _key, {probe_mins} FROM _cms_probe p
    )
    SELECT _key, CAST({least_expr} AS BIGINT) AS cms_est FROM _cms_est
    """


# ---------------------------------------------------------------------------
# Quantile-histogram sketch (mergeable percentiles)
# ---------------------------------------------------------------------------

QHIST_WIDTH_CENTS = 500  # 5.00-unit bins over integer cents


def qhist_bins(df: DataFrame, value: Column,
               width_cents: int = QHIST_WIDTH_CENTS) -> DataFrame:
    """The equi-width histogram bin table: (_bin, _c). Like the HLL
    registers and CMS counters this IS the sketch — mergeable across
    partitions/days/streams by SUMMING _c per _bin, which is what
    makes it the 100 TB percentile currency (the exact-rank answer,
    pipeline_length_quantiles style, needs a per-group sort; the
    histogram needs one bounded groupBy and unions at constant cost).
    Bin ids are floor(integer_cents / width): all-integer state, so
    shard merges are exact by construction and the quantile estimate
    carries a HARD error bound of one bin width. Works identically on
    a batch frame and a streaming one (pure projection + groupBy-sum:
    complete/update-mode incremental state, one integer per active
    bin)."""
    cents = F.floor(value * F.lit(100.0) + F.lit(0.5)).cast("long")
    b = F.floor(cents.cast("double") / F.lit(float(width_cents)))
    return (df.select(b.cast("long").alias("_bin"))
            .groupBy("_bin").agg(F.count(F.lit(1)).alias("_c")))


def qhist_quantiles(bins: DataFrame,
                    percentiles: tuple = (50, 90, 99),
                    width_cents: int = QHIST_WIDTH_CENTS) -> DataFrame:
    """Finalize a bin table into percentile estimates: for each p the
    FIRST bin whose cumulative count reaches ceil(p·n/100), reported
    as the bin's lower edge in cents — fully deterministic (no
    interpolation, integer rank arithmetic), so the oracle matches
    bit-for-bit and the true type-1 quantile provably lies within
    [est, est + width). The cumulative window runs over the BIN table
    (cardinality = value-range / width, hundreds of rows — the
    documented bounded-cardinality single-partition case, same class
    as the HLL/CMS finalizers)."""
    from ..operators import cache

    # persist the bin table: the cumulative window, the total, and the
    # per-percentile rows each consume it — unpersisted, every
    # reference re-ran the corpus scan+groupBy that built the bins
    # (persist_audit)
    bins = cache.maybe_persist(bins)
    wcum = Window.orderBy("_bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    cum = bins.select(
        "_bin", F.sum("_c").over(wcum).alias("_cum"))
    tot = bins.agg(F.sum("_c").alias("_n"))
    ps = None
    for p in percentiles:
        row = tot.select(F.lit(p).cast("long").alias("pct"), "_n")
        ps = row if ps is None else ps.unionByName(row)
    # k_p = ceil(p*n/100), exact in integers
    ps = ps.select(
        "pct", "_n",
        F.floor((F.col("pct") * F.col("_n") + F.lit(99))
                / F.lit(100.0)).cast("long").alias("_k"))
    return (
        ps.join(cum, cum["_cum"] >= ps["_k"])
        .groupBy("pct", "_n")
        .agg((F.min("_bin") * F.lit(width_cents)).alias("est_cents"))
        .select("pct", F.col("est_cents").cast("long"),
                F.col("_n").cast("long").alias("n_rows"))
    )


def sql_qhist_quantiles(table_sql: str, value_expr: str,
                        percentiles: tuple = (50, 90, 99),
                        width_cents: int = QHIST_WIDTH_CENTS) -> str:
    """DuckDB twin: identical bins, identical integer rank pick."""
    plist = ", ".join(str(p) for p in percentiles)
    return f"""
    WITH _qh_in AS ({table_sql}),
    _qh_bins AS (
      SELECT CAST(floor(CAST(floor({value_expr} * 100.0 + 0.5) AS BIGINT)
                        / {width_cents}.0) AS BIGINT) AS _bin,
             count(*) AS _c
      FROM _qh_in GROUP BY 1
    ),
    _qh_cum AS (
      SELECT _bin, sum(_c) OVER (ORDER BY _bin) AS _cum FROM _qh_bins
    ),
    _qh_tot AS (SELECT CAST(sum(_c) AS BIGINT) AS _n FROM _qh_bins),
    _qh_p AS (SELECT CAST(unnest([{plist}]) AS BIGINT) AS pct)
    SELECT p.pct,
           CAST(min(c._bin) * {width_cents} AS BIGINT) AS est_cents,
           t._n AS n_rows
    FROM _qh_p p
    CROSS JOIN _qh_tot t
    JOIN _qh_cum c
      ON c._cum >= CAST(floor((p.pct * t._n + 99) / 100.0) AS BIGINT)
    GROUP BY p.pct, t._n
    """


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch
# ---------------------------------------------------------------------------
# Bar-Yossef et al., "Counting distinct elements in a data stream"
# (RANDOM 2002); unbiased estimator D ~ (k-1) * H / h_(k) from Beyer et
# al., "On synopses for distinct value estimation under multiset
# operations" (SIGMOD 2007). Complements HLL: the sketch IS the k
# smallest distinct hash values, so two shards union by re-taking the
# bottom-k of the concatenation — and unlike HLL registers, a KMV pair
# also supports INTERSECTION estimates (Jaccard over the union sketch),
# which is why engines ship both (cf. DataSketches ThetaSketch).

KMV_K = 64
KMV_SPACE = 1 << 60  # md5_long yields uniform 60-bit hashes


def kmv_bottomk(df: DataFrame, group_cols: list[str], value: Column,
                k: int = KMV_K) -> DataFrame:
    """The sketch: per group, the k smallest DISTINCT 60-bit hashes of
    ``value`` as (group_cols..., _h, _rn). Built scale-safely in three
    bounded stages: (1) one distinct shuffle on (group, hash) — the
    same grain the HLL register build pays; (2) bottom-k WITHIN each
    post-shuffle partition (any globally-k-smallest hash is k-smallest
    in its own partition, so this prunes to <= k * P rows without a
    global sort); (3) bottom-k over that bounded remainder. No stage
    sorts more than one partition's rows or k*P survivors."""
    h = md5_long(value.cast("string"))
    dedup = (df.select(*group_cols, h.alias("_h"))
             .groupBy(*group_cols, "_h").agg(F.lit(1).alias("_one"))
             .drop("_one"))
    wpart = Window.partitionBy(*group_cols,
                               F.spark_partition_id()).orderBy("_h")
    pruned = (dedup.withColumn("_prn", F.row_number().over(wpart))
              .filter(F.col("_prn") <= k).drop("_prn"))
    wglob = Window.partitionBy(*group_cols).orderBy("_h")
    return (pruned.withColumn("_rn", F.row_number().over(wglob))
            .filter(F.col("_rn") <= k))


def kmv_estimate(mins: DataFrame, group_cols: list[str],
                 k: int = KMV_K) -> DataFrame:
    """Finalize a bottom-k table: (group_cols..., kmv_k_used,
    kmv_kth_hash, kmv_est). A group holding fewer than k hashes was
    counted EXACTLY (the sketch saw every distinct value); otherwise
    est = SPACE // (h_(k) // (k-1)) — the Beyer estimator computed in
    two int64 floor-divisions (divisor-first, so no 60-bit * 6-bit
    overflow and no IEEE rounding anywhere; the truncation error is
    O(D/2^60), far below the sketch's own 1/sqrt(k-2) noise)."""
    agg = mins.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("kmv_k_used"),
        F.max("_h").alias("kmv_kth_hash"))
    est = F.when(
        F.col("kmv_k_used") < k, F.col("kmv_k_used")
    ).otherwise(
        F.expr(f"div(CAST({KMV_SPACE} AS BIGINT), "
               f"greatest(div(kmv_kth_hash, {k - 1}), CAST(1 AS BIGINT)))"))
    return agg.select(*group_cols, "kmv_k_used", "kmv_kth_hash",
                      est.cast("long").alias("kmv_est"))


def sql_kmv_distinct(table_sql: str, group_cols: list[str],
                     value_expr: str, k: int = KMV_K) -> str:
    """DuckDB twin: identical hashes, ranks, and floor-division
    estimator (DuckDB ``//`` == Spark ``div`` on non-negative int64)."""
    gc = ", ".join(group_cols)
    return f"""
    SELECT {gc}, kmv_k_used, kmv_kth_hash,
           CAST(CASE WHEN kmv_k_used < {k} THEN kmv_k_used
                ELSE {KMV_SPACE} // greatest(kmv_kth_hash // {k - 1}, 1)
                END AS BIGINT) AS kmv_est
    FROM (
      SELECT {gc}, CAST(count(*) AS BIGINT) AS kmv_k_used,
             max(_h) AS kmv_kth_hash
      FROM (
        SELECT {gc}, _h,
               row_number() OVER (PARTITION BY {gc} ORDER BY _h) AS _rn
        FROM (SELECT DISTINCT {gc},
                     {sql_md5_long(f"CAST({value_expr} AS VARCHAR)")} AS _h
              FROM ({table_sql}))
      ) WHERE _rn <= {k} GROUP BY {gc}
    )
    """
