"""Property tests (hypothesis) for the late round-8 operators: each is
checked against a brute-force Python oracle over random small inputs,
covering the space the fixed-corpus gate entries cannot (degenerate
docs, tie-heavy interval sets, empty groups).

* containment_pairs == brute-force |A∩B| / min over distinct n-grams;
* events-style sweep-line peak concurrency == brute-force max overlap
  at interval endpoints (validates the tie-order-invariance argument
  the operator's determinism rests on);
* forward as-of (time negation) == brute-force earliest right row
  at-or-after each left row.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mktd6_flink_spark.functions import dedup as dd
from mktd6_flink_spark.operators import asof, windows

WORDS = ["aa", "bb", "cc", "dd", "ee"]

doc_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12),
    min_size=2, max_size=6)


def _grams(tokens, n=3):
    return {" ".join(tokens[i:i + n]) for i in range(len(tokens) - n + 1)}


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(docs=doc_strategy)
def test_containment_matches_bruteforce(spark, docs):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): (r.common_ngrams, r.na, r.nb)
           for r in dd.containment_pairs(df, threshold_pct=50).collect()}
    gram_sets = {i: _grams(toks) for i, toks in enumerate(docs)}
    want = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            inter = gram_sets[a] & gram_sets[b]
            if not inter:
                continue  # pairs sharing no gram never meet in the join
            na, nb = len(gram_sets[a]), len(gram_sets[b])
            if 100 * len(inter) >= 50 * min(na, nb):
                want[(a, b)] = (len(inter), na, nb)
    assert got == want


interval_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 50)),
    min_size=1, max_size=25)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=interval_strategy)
def test_sweepline_peak_matches_bruteforce(spark, data):
    """+1/-1 boundary points through running_sum_scalable keyed by day;
    the per-day MAX must equal the brute-force maximum number of
    intervals covering any single point — including tie-heavy inputs
    (identical endpoints, zero-length intervals)."""
    spans = [(d, min(a, b), max(a, b)) for d, a, b in data]
    rows = ([(d, s, 1) for d, s, _ in spans]
            + [(d, e, -1) for d, _, e in spans])
    df = (spark.createDataFrame(rows, "day long, t long, delta int")
          .withColumn("_nd", -F.col("delta")))
    run = windows.running_sum_scalable(
        df, ["day"], ["t", "_nd"], "delta", out="conc")
    got = {r.day: r.m for r in
           run.groupBy("day").agg(F.max("conc").alias("m")).collect()}
    for day in {d for d, _, _ in spans}:
        day_spans = [(s, e) for d, s, e in spans if d == day]
        points = {p for s, e in day_spans for p in (s, e)}
        want = max(sum(1 for s, e in day_spans if s <= p <= e)
                   for p in points)
        assert got[day] == want, (day, got[day], want)


asof_strategy = st.tuples(
    st.lists(st.integers(0, 30), min_size=1, max_size=12),   # left times
    st.lists(st.tuples(st.integers(0, 30), st.integers(0, 9)),
             min_size=0, max_size=12))                       # (t, price)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=asof_strategy)
def test_forward_asof_via_negation_matches_bruteforce(spark, data):
    lts, rts = data
    # dedupe right times (the operator contract: unique (key, time))
    rmap = {}
    for t, p in rts:
        rmap[t] = p
    left = spark.createDataFrame(
        [(i, "k", -t) for i, t in enumerate(lts)],
        "lid long, k string, _negt long")
    right = spark.createDataFrame(
        [("k", -t, float(p)) for t, p in rmap.items()],
        "k string, _negt long, price double")
    if not rmap:
        right = spark.createDataFrame([], "k string, _negt long, price double")
    out = {r.lid: r.asof_price for r in asof.asof_join(
        left, right, on=["k"], left_time="_negt", right_time="_negt",
        value_cols=["price"], fallback="null").collect()}
    for i, t in enumerate(lts):
        nxt = [rt for rt in rmap if rt >= t]
        want = float(rmap[min(nxt)]) if nxt else None
        assert out[i] == want, (i, t, out[i], want)


# -- round-9 operators -------------------------------------------------------

def _py_winnow(text, k, w):
    """Pure-python winnowing oracle: md5-based k-gram hashes, min per
    w-window (value min — position-independent), distinct."""
    import hashlib

    if len(text) < k:
        return set()
    hs = [int(hashlib.md5(text[i:i + k].encode()).hexdigest()[:15], 16)
          for i in range(len(text) - k + 1)]
    n_win = max(len(hs) - w + 1, 1)
    return {min(hs[j:j + w]) for j in range(n_win)}


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(texts=st.lists(st.text(alphabet="abcx ", min_size=0, max_size=40),
                      min_size=2, max_size=5),
       shared=st.text(alphabet="qrs", min_size=23, max_size=30))
def test_winnowing_matches_bruteforce_and_guarantee(spark, texts, shared):
    """winnowing_pairs (threshold 1%, no cap) == the brute-force
    fingerprint-set intersection; and two docs carrying the same
    >= w+k-1-char substring always surface as a pair (the Schleimer
    guarantee), regardless of the random surroundings."""
    k, w = dd.WINNOW_K, dd.WINNOW_W
    docs = list(texts) + [texts[0] + shared, texts[1] + shared]
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.shared_fps
           for r in dd.winnowing_pairs(
               df, threshold_pct=1, max_df=None).collect()}
    fsets = {i: _py_winnow(t, k, w) for i, t in enumerate(docs)}
    want = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            inter = fsets[a] & fsets[b]
            na, nb = len(fsets[a]), len(fsets[b])
            if inter and 100 * len(inter) >= 1 * min(na, nb):
                want[(a, b)] = len(inter)
    assert got == want
    assert (len(docs) - 2, len(docs) - 1) in got  # the guarantee pair


def test_dsir_weight_sign_separates_domains(spark):
    """DSIR sanity: with a target domain whose vocabulary is disjoint
    from the rest of the raw corpus, target-vocabulary docs must score
    strictly higher than raw-only docs, and a token balanced across
    both contributes bits_r - bits_t exactly as the integer-bits
    formula says (checked against a pure-python recomputation)."""
    from mktd6_flink_spark.functions import text as tx

    docs = [
        (0, "alpha beta alpha beta", "en"),     # target domain
        (1, "alpha alpha beta beta", "en"),     # target domain
        (2, "gamma delta gamma delta", "fr"),   # raw-only
        (3, "alpha gamma", "fr"),               # mixed, raw side
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    got = {r.doc_id: r.dsir_weight_bits for r in tx.dsir_weights(
        df, F.col("lang") == "en").collect()}

    # pure-python recomputation of the integer-bits model
    toks = {i: t.split() for i, t, _ in docs}
    raw, tgt = {}, {}
    for i, ws in toks.items():
        for wd in ws:
            raw[wd] = raw.get(wd, 0) + 1
            if i in (0, 1):
                tgt[wd] = tgt.get(wd, 0) + 1
    NR, NT, V = sum(raw.values()), sum(tgt.values()), len(raw)
    def bits(n, c):
        return ((n + V) // (c + 1)).bit_length() - 1
    want = {i: sum(bits(NR, raw[wd]) - bits(NT, tgt.get(wd, 0))
                   for wd in ws)
            for i, ws in toks.items()}
    assert got == want, (got, want)
    assert min(got[0], got[1]) > max(got[2], got[3])


def test_semdedup_k_scales_with_corpus_and_bounds_pairs(spark):
    """The SemDeDup pair-fan-out bound must be STRUCTURAL, not
    documented: K = max(8, n // _SEMDEDUP_TARGET) pins average
    cluster size, so candidate pairs (sum s_i*(s_i-1)/2 over the
    REAL trained assignment) stay O(n * s_max) with s_max roughly
    flat in n — checked at sf0.01 (n=500, K=8) vs sf0.1 (n=2000,
    K=31): measured s_max 71 vs 77 while n grew 4x."""
    from mktd6_flink_spark.functions import similarity as sim
    from mktd6_flink_spark.functions.similarity import l2sq
    from mktd6_flink_spark.plans import driver_queries as dq

    stats = {}
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        emb = dq.load(spark, sf, "embeddings")
        n = emb.count()
        k = dq._semdedup_k(n)
        assert k == max(8, n // dq._SEMDEDUP_TARGET)
        cents = sim.kmeans_centroids(emb, dq._EMB_DIM, k=k)
        cvec = cents.groupBy("centroid_id").agg(
            F.transform(F.array_sort(F.collect_list(
                F.struct("dim", F.col("centroid").alias("val")))),
                lambda s: s["val"]).alias("_cv"))
        assign = (emb.crossJoin(F.broadcast(cvec))
                  .select("vec_id", "centroid_id",
                          l2sq(F.col("embedding"), F.col("_cv"))
                          .alias("_d"))
                  .groupBy("vec_id")
                  .agg(F.min_by("centroid_id",
                                F.struct("_d", "centroid_id")).alias("c")))
        sizes = [r.s for r in assign.groupBy("c")
                 .agg(F.count(F.lit(1)).alias("s")).collect()]
        pairs = sum(s * (s - 1) // 2 for s in sizes)
        # the structural bound: sum s(s-1)/2 <= s_max * n / 2
        assert pairs <= max(sizes) * n / 2
        stats[sf] = (n, k, max(sizes), pairs)
    (n1, k1, m1, p1), (n2, k2, m2, p2) = stats.values()
    assert n2 > n1 and k2 > k1          # K grows with the corpus
    assert m2 <= 2 * m1                 # cluster size ~flat, not ~n
    # pair DENSITY (pairs / all-pairs) falls as the corpus grows —
    # the whole point of scaling K with n
    assert p2 / (n2 * n2) < p1 / (n1 * n1)


_entropy_alphabet = st.sampled_from(list("ab ") + ["é", "中"])
_entropy_doc = st.one_of(
    st.none(),
    st.text(alphabet=_entropy_alphabet, min_size=0, max_size=40),
    st.text(min_size=0, max_size=25))


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(docs=st.lists(_entropy_doc, min_size=1, max_size=8))
def test_char_entropy_matches_bruteforce(spark, docs):
    """char_entropy's sort + run-length fold == the definitional
    per-distinct-char computation, over random text including runs,
    multi-byte chars, empty strings, and NULLs. Pins the exact
    integer-bits contract (sum k*(bitlen(n)-bitlen(k))) and the
    portable mean (floor(x*1e6+0.5)/1e6 in IEEE doubles), so any
    future respelling of the fold must stay bit-identical."""
    import math
    from collections import Counter

    from mktd6_flink_spark.functions import text as tx

    rows = [(i, d) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in tx.char_entropy(df).collect()}
    assert set(got) == set(range(len(docs)))
    for i, d in enumerate(docs):
        r = got[i]
        if d is None:
            assert (r.n_chars is None and r.n_distinct is None
                    and r.entropy_bits is None
                    and r.avg_bits_per_char is None)
            continue
        arr = list(d) if d else [""]
        n = len(arr)
        counts = Counter(arr)
        bl = lambda x: x.bit_length() - 1
        ent = sum(k * (bl(n) - bl(k)) for k in counts.values())
        x = ent / n * 1e6 + 0.5
        avg = (x - math.fmod(x, 1.0)) / 1e6
        assert r.n_chars == len(d), (d, r)
        assert r.n_distinct == len(counts), (d, r)
        assert r.entropy_bits == ent, (d, r)
        assert r.avg_bits_per_char == avg, (d, r)


_lpa_edges = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(
        lambda e: e[0] != e[1]),
    min_size=1, max_size=20)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(raw=_lpa_edges, iters=st.integers(1, 3))
def test_lpa_matches_bruteforce(spark, raw, iters):
    """lpa_labels == the definitional synchronous update on random
    small directed graphs: every node simultaneously adopts the most
    frequent label among {in-neighbors} + {self}, smallest label on
    ties. Validates the min_by-over-(-cnt, lbl) argmax spelling and
    the self-vote union against a direct Counter-based oracle,
    including multi-edges (the operator counts them as multiple
    votes, as does the oracle) and asymmetric edges."""
    from collections import Counter

    from mktd6_flink_spark.functions import graph as gr

    labels = ["n%d" % a for a in range(8)]
    edges = [("n%d" % a, "n%d" % b) for a, b in raw]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.lbl for r in gr.lpa_labels(df, iters).collect()}

    nodes = sorted({x for e in edges for x in e})
    lbl = {n: n for n in nodes}
    for _ in range(iters):
        nxt = {}
        for n in nodes:
            votes = Counter(lbl[s] for s, d in edges if d == n)
            votes[lbl[n]] += 1
            best = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
            nxt[n] = best[0]
        lbl = nxt
    assert got == lbl
