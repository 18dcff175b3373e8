"""Unit tests for the LLM-pipeline layer: hashing portability (vs
hashlib), dedup behavior vs a pure-python reference implementation,
similarity ranking, text analysis, multimodal plumbing."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from mktd6_flink_spark.functions import (dedup, hashing, multimodal,
                                         similarity, text)


def py_md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_md5_long_matches_hashlib(spark):
    words = ["hello", "spark", "a b c", ""]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {r.w: r.h for r in df.select(
        "w", hashing.md5_long(F.col("w")).alias("h")).collect()}
    assert got == {w: py_md5_long(w) for w in words}


def test_universal_hash_family_distinct_and_bounded(spark):
    params = hashing.hash_params(8)
    assert len(set(params)) == 8
    x = py_md5_long("doc")
    for a, b in params:
        h = (a * (x % hashing.MERSENNE_P) + b) % hashing.MERSENNE_P
        assert 0 <= h < hashing.MERSENNE_P
        # no int64 overflow: a*(x mod p) < 2^62
        assert a * (x % hashing.MERSENNE_P) < 2 ** 62


def test_minhash_finds_planted_near_dups(spark):
    base = " ".join(f"w{i}" for i in range(60))
    near = base + " extra"
    other = " ".join(f"z{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id long, text string")
    pairs = dedup.minhash_lsh_pairs(df).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in got
    assert all(3 not in p for p in got)
    est = {(r.id_a, r.id_b): r.est_jaccard for r in pairs}[(1, 2)]
    assert est > 0.5


def test_minhash_signature_estimates_jaccard(spark):
    """Signature agreement should approximate true shingle Jaccard."""
    a = " ".join(f"w{i}" for i in range(40))
    b = " ".join(f"w{i}" for i in range(20)) + " " + " ".join(
        f"q{i}" for i in range(20))
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    sigs = df.select(
        "doc_id", dedup.minhash_signature(F.col("text")).alias("sig")
    ).collect()
    s1, s2 = [dict((r.doc_id, r.sig) for r in sigs)[i] for i in (1, 2)]
    agree = sum(x == y for x, y in zip(s1, s2)) / len(s1)

    def shingle_set(t):
        ws = t.split()
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    sa, sb = shingle_set(a), shingle_set(b)
    true_j = len(sa & sb) / len(sa | sb)
    assert abs(agree - true_j) < 0.35  # 16 hashes -> coarse but unbiased


def test_simhash_near_dup_small_hamming(spark):
    base = " ".join(f"w{i}" for i in range(100))
    near = base.replace("w50", "x50")
    other = " ".join(f"z{i}" for i in range(100))
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id long, text string")
    got = {r.doc_id: r.simhash for r in dedup.simhash(df).collect()}
    ham_near = bin(got[1] ^ got[2]).count("1")
    ham_far = bin(got[1] ^ got[3]).count("1")
    assert ham_near < ham_far


def test_ngram_jaccard_exact_value(spark):
    a = "a b c d e"     # 3-grams: abc bcd cde
    b = "a b c d x"     # 3-grams: abc bcd cdx
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    out = dedup.ngram_jaccard_pairs(df, threshold=0.0).collect()
    assert len(out) == 1
    assert out[0].jaccard == 0.5  # |∩|=2, |∪|=4


def test_cosine_topk_ranking(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.01, 0.0]),   # nearly parallel to 0
        (2, [0.0, 1.0, 0.0]),    # orthogonal
        (3, [-1.0, 0.0, 0.0]),   # opposite
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.cosine_topk(df, [0], k=3).collect()
    order = [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)]
    assert order == [1, 2, 3]


def test_lsh_ann_subset_of_exact(spark):
    import random

    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {(r.query_id, r.neighbor_id)
             for r in similarity.cosine_topk(df, [0, 1], k=5).collect()}
    ann = similarity.lsh_ann_topk(df, [0, 1], dim=16, k=5).collect()
    # ANN returns only same-bucket candidates; every ANN hit must be a
    # real vector pair with correctly computed cosine (spot check rank 1
    # is the best in-bucket cosine)
    by_q = {}
    for r in ann:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r.rank)
        assert all(rs[i].cosine >= rs[i + 1].cosine
                   for i in range(len(rs) - 1))


def test_text_tokenizer_and_stats(spark):
    df = spark.createDataFrame(
        [(1, "Hello, World! 123 foo-bar")], "doc_id long, text string")
    stats = text.token_stats(df).collect()[0]
    # tokens: hello world 123 foobar  (punct stripped, '-' removed)
    assert stats.n_tokens == 4
    # BPE-ish: Hello , World ! 123 foo - bar  => 8
    assert stats.n_bpe_tokens == 8


def test_lang_id_votes(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat and it is a hat"),
         (2, "el gato es un animal y la casa es grande"),
         (3, "xyzzy plugh")],
        "doc_id long, text string")
    got = {r.doc_id: r.pred_lang for r in text.lang_id(df).collect()}
    assert got[1] == "en" and got[2] == "es" and got[3] == "und"


def test_gopher_rules_each_rule_flips(spark):
    """The sf corpus is single-line with no symbols, so the bullet /
    ellipsis / symbol / alpha rules never fire there; crafted docs
    prove each rule trips independently (and NULL text keeps=False)."""
    base = "the a " + " ".join(f"word{i}" for i in range(30))
    docs = [
        (1, base),                                   # passes everything
        (2, "the a short"),                          # word count < 20
        (3, "xyzzy " * 40),                          # no 2 common words
        (4, base + " ##########"),                   # >0.1 symbols/word
        (5, base.replace("word", "1000")),           # <80% alphabetic words
        (6, "\n".join(["- b " + base] * 10)),        # all lines bullets
        (7, "\n".join(["l " + base + " ..."] * 10)), # all lines ellipsis-end
        (8, None),                                   # NULL text
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in text.gopher_rules(df).collect()}
    assert got[1].keep
    assert not got[2].r_word_count and not got[2].keep
    assert not got[3].r_common_words and not got[3].keep
    assert not got[4].r_symbol_ratio and not got[4].keep
    assert not got[5].r_alpha_words and not got[5].keep
    assert not got[6].r_bullet_lines and not got[6].keep
    assert not got[7].r_ellipsis_lines and not got[7].keep
    assert not got[8].keep and not got[8].r_word_count


def test_line_dedup_drops_corpus_boilerplate(spark):
    """Lines repeated across the corpus vanish from every doc, empty
    lines are dropped and never counted, survivors keep original
    order, and NULL-text docs keep row identity with zero counts."""
    docs = [
        (1, "cookie banner\nunique one\n\nunique two"),
        (2, "cookie banner\nunique three"),
        (3, "  cookie banner  \nonly here"),  # trims to the same line
        (4, None),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in text.line_dedup(df).collect()}
    assert got[1].n_lines == 3 and got[1].n_kept == 2
    assert got[1].text_clean == "unique one\nunique two"  # order kept
    assert got[2].text_clean == "unique three"
    assert got[3].text_clean == "only here"
    assert got[4].n_lines == 0 and got[4].text_clean == ""


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha")],
        "doc_id long, text string")
    got = {r.doc_id: r.fingerprint for r in text.fingerprint(df).collect()}
    assert got[1] != got[2]
    # portable reference computation
    p, B = hashing.MERSENNE_P, text.FINGERPRINT_BASE
    acc = 0
    for w in ["alpha", "beta", "gamma"]:
        acc = (acc * B + py_md5_long(w) % p) % p
    assert got[1] == acc


def test_multimodal_decode_stub(spark):
    docs = spark.createDataFrame(
        [(1, "hello world")], "doc_id long, text string")
    media = multimodal.fake_media_from_documents(docs)
    decoded = multimodal.decode_media(media, fake=True).collect()[0]
    assert decoded.width == len("hello world") % 640 + 16
    assert len(decoded.features) == multimodal.N_FEATURES
    with pytest.raises(Exception) as exc:
        multimodal.decode_media(media, fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError)


def test_round_portable_spark_matches_python(spark):
    vals = [1.005, 2.675, 0.5, -1.0045, 0.1234565]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [r.r for r in df.select(
        hashing.round_portable(F.col("v")).alias("r")).collect()]
    exp = [math.floor(v * 1e6 + 0.5) / 1e6 for v in vals]
    assert got == exp


def test_connected_components_matches_union_find(spark):
    """Label propagation must agree with a Python union-find on 30
    random graphs (batched into one disjoint node space so Spark runs
    once): every node's component is the MIN id reachable from it."""
    import random

    from mktd6_flink_spark.functions import dedup as dd

    rng = random.Random(11)
    nodes, edges = [], []
    base = 0
    for g in range(30):
        n = rng.randint(1, 12)
        ids = list(range(base, base + n))
        nodes.extend(ids)
        for _ in range(rng.randint(0, n * 2)):
            a, b = rng.sample(ids, 2) if n > 1 else (ids[0], ids[0])
            edges.append((min(a, b), max(a, b)))
        base += n

    parent = {i: i for i in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    exp = {i: find(i) for i in nodes}

    ndf = spark.createDataFrame([(i,) for i in nodes], "doc_id long")
    edf = spark.createDataFrame(
        edges or [(0, 0)], "id_a long, id_b long")
    got = {r.doc_id: r.component
           for r in dd.connected_components(ndf, edf).collect()}
    assert got == exp, {i: (got[i], exp[i]) for i in nodes
                        if got[i] != exp[i]}


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """With ``setCheckpointDir`` configured (the cluster-durable path),
    connected_components must take the reliable ``checkpoint()`` branch
    — verified by checkpoint files actually landing in the dir — and
    still converge to the same labels as the localCheckpoint path."""
    import os

    from mktd6_flink_spark.functions import dedup as dd

    nodes = [(i,) for i in range(8)]
    edges = [(0, 1), (1, 2), (4, 5), (6, 7), (5, 6)]
    ndf = spark.createDataFrame(nodes, "doc_id long")
    edf = spark.createDataFrame(edges, "id_a long, id_b long")
    exp = {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4, 6: 4, 7: 4}

    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None  # session default: local path
    local = {r.doc_id: r.component
             for r in dd.connected_components(ndf, edf).collect()}
    assert local == exp

    ckpt = str(tmp_path / "ckpt")
    sc.setCheckpointDir(ckpt)
    try:
        reliable = {r.doc_id: r.component
                    for r in dd.connected_components(ndf, edf).collect()}
        assert reliable == exp
        # proof the reliable branch ran: RDD checkpoint files on disk
        assert any(files for _, _, files in os.walk(ckpt)), \
            "no checkpoint files written — localCheckpoint branch taken?"
    finally:
        # don't leak a tmp checkpoint dir into the session-scoped fixture
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(
            sc._jvm.scala.Option.apply(None))


def test_repetition_stats_golden(spark):
    """'a b a b a b c': 2-grams ab,ba,ab,ba,ab,bc -> top frac 3/6;
    3-grams aba,bab,aba,bab,abc -> dup frac 4/5."""
    from mktd6_flink_spark.functions import text as tx

    df = spark.createDataFrame([(1, "a b a b a b c"), (2, "x y")],
                               "doc_id long, text string")
    rows = {r.doc_id: r for r in tx.repetition_stats(df).collect()}
    assert rows[1].top_2gram_frac == 0.5
    assert rows[1].dup_3gram_frac == 0.8
    assert 2 not in rows  # < 3 tokens: no 3-gram, excluded


def test_hll_distinct_accuracy_and_merge_semantics(spark):
    """m=64 HLL: estimate within the sketch's expected error envelope
    (~1.04/sqrt(64) = 13% std; assert 3 sigma) on cardinalities
    spanning the linear-counting and raw branches, and empty-bucket
    count is consistent with the estimate branch taken."""
    from mktd6_flink_spark.functions import sketches as sk

    rows = [(grp, f"v{grp}_{i}")
            for grp, n in [("tiny", 10), ("mid", 150), ("big", 5000)]
            for i in range(n)]
    df = spark.createDataFrame(rows, "g string, v string")
    got = {r.g: (r.hll_est, r.hll_empty_buckets)
           for r in sk.hll_distinct(df, ["g"], df.v).collect()}
    for g, n in [("tiny", 10), ("mid", 150), ("big", 5000)]:
        est, empty = got[g]
        assert abs(est - n) / n < 0.40, (g, est, n)
    # duplicates must not move the estimate (set semantics)
    df2 = df.union(df)
    got2 = {r.g: r.hll_est
            for r in sk.hll_distinct(df2, ["g"], df2.v).collect()}
    assert {g: e for g, (e, _) in got.items()} == got2


def test_bloom_filter_no_false_negatives_and_fp_rate(spark):
    """Every true member's row must survive the Bloom (no false
    negatives — the correctness half of the contract), and the false-
    positive rate on 2000 non-members must be within ~4x of the
    theoretical (1-e^(-kn/m))^k (the efficiency half)."""
    import math

    from mktd6_flink_spark.functions import sketches as sk
    from pyspark.sql import functions as F

    members = spark.createDataFrame(
        [(i,) for i in range(300)], "k long")
    probe = spark.createDataFrame(
        [(i,) for i in range(5000)], "k long")  # 300 members + 4700 not
    bitmap = sk.bloom_bitmap(members, F.col("k"))
    passed = {r.k for r in
              sk.bloom_filter(probe, F.col("k"), bitmap).collect()}
    assert set(range(300)) <= passed, "false negative!"
    fp = len(passed) - 300
    k_, n, m = 3, 300, 4092
    theo = (1 - math.exp(-k_ * n / m)) ** k_
    assert fp / 4700 < max(4 * theo, 0.02), (fp, theo)


def test_trigram_surprisal_golden(spark):
    """Hand-computed tiny corpus: docs 'aaaa' (x2) and 'abcd'.
    Trigrams: aaa x4 (2 docs x 2), abc, bcd. N=6, V=3, N+V=9.
    Surprisal bits: aaa -> floor(log2(9//5))=0; abc/bcd ->
    floor(log2(9//2))=2. Doc scores: 'aaaa' avg 0; 'abcd' avg 2."""
    from mktd6_flink_spark.functions import text as tx

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaaa"), (3, "abcd"), (4, "xy")],
        "doc_id long, text string")
    got = {r.doc_id: (r.n_trigrams, r.avg_surprisal_bits)
           for r in tx.trigram_surprisal(df).collect()}
    assert got == {1: (2, 0.0), 2: (2, 0.0), 3: (2, 2.0)}
    # doc 4 is shorter than a trigram: excluded entirely


def test_bloom_probe_side_never_shuffles(spark):
    """The whole point of the Bloom prefilter: the probe (big) side is
    filtered MAP-SIDE against a broadcast bitmap. The physical plan
    must contain a broadcast exchange for the bitmap and NO
    hash-partition shuffle anywhere — a shuffle would mean the big side
    paid the cost the filter exists to avoid."""
    from mktd6_flink_spark.functions import sketches as sk

    members = spark.createDataFrame([(i,) for i in range(100)], "k long")
    probe = spark.createDataFrame([(i, i * 1.5) for i in range(1000)],
                                  "k long, v double")
    bitmap = sk.bloom_bitmap(members, F.col("k"))
    plan = (sk.bloom_filter(probe, F.col("k"), bitmap)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastExchange" in plan
    # the ONLY permitted shuffle is the constant-size (bits/62-row) word
    # aggregation inside the bitmap build; any other hash partitioning
    # means the probe side shuffled
    import re as _re

    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert _re.search(r"hashpartitioning\(_word", line), plan


def test_hll_registers_partial_aggregation(spark):
    """The register build must partial-aggregate map-side (max is
    algebraic): the plan has a partial HashAggregate BELOW the exchange,
    so the shuffle carries at most groups x m rows per task, never the
    raw values — the property that keeps the sketch 100 TB-viable."""
    from mktd6_flink_spark.functions import sketches as sk

    df = spark.createDataFrame([("g", f"v{i}") for i in range(500)],
                               "g string, v string")
    plan = (sk.hll_registers(df, ["g"], df.v)
            ._jdf.queryExecution().executedPlan().toString())
    assert "partial_max" in plan, plan


def test_temperature_mix_upweights_small_sources(spark):
    """tau=0.5 mixing contract on a skewed corpus (1000/100/10 docs):
    keep RATE must be monotone-decreasing in source size (that's the
    whole point of temperature resampling), the implied kept total must
    respect the budget envelope, and the operator is deterministic."""
    from mktd6_flink_spark.functions import text as tx

    rows = [(f"{s}_{i}", s) for s, n in
            [("big", 1000), ("mid", 100), ("small", 10)]
            for i in range(n)]
    df = spark.createDataFrame(rows, "text string, source string")
    out = {r.source: r for r in
           tx.temperature_mix_report(df, text="text").collect()}
    assert out["small"].keep_ppm >= out["mid"].keep_ppm >= \
        out["big"].keep_ppm
    # budget: sum over sources of n*ppm/1e6 <= total/2 (+1 per-source
    # floor slack); small source should be kept (almost) entirely
    implied = sum(v.n_docs * v.keep_ppm / 1e6 for v in out.values())
    assert implied <= 1110 / 2 + 3
    assert out["small"].keep_ppm == 1000000  # rate capped at 1: keep all
    assert out["small"].n_kept == 10
    for v in out.values():
        assert 0 <= v.n_kept <= v.n_docs
    out2 = {r.source: r for r in
            tx.temperature_mix_report(df, text="text").collect()}
    assert {k: tuple(v) for k, v in out.items()} == \
        {k: tuple(v) for k, v in out2.items()}


def test_cms_overestimates_never_under(spark):
    """Count-min contract: the estimate is >= the true count for EVERY
    key (min over d rows of colliding sums can only add), equals it
    when the sketch is sparse relative to keys, and the counter table
    is exactly d x w bounded regardless of input size."""
    from mktd6_flink_spark.functions import sketches as sk

    rows = [(f"k{i % 50}",) for i in range(2000)]  # 50 keys, 40 each
    df = spark.createDataFrame(rows, "k string")
    counters = sk.cms_counters(df, F.col("k"))
    assert counters.count() <= 3 * 512
    probes = spark.createDataFrame(
        [(f"k{i}",) for i in range(50)] + [("absent",)], "k string")
    est = {r._key: r.cms_est for r in
           sk.cms_estimate(counters, probes, F.col("k")).collect()}
    for i in range(50):
        assert est[f"k{i}"] >= 40
    # 50 keys in 3x512 slots: collisions are rare; most estimates exact
    assert sum(1 for i in range(50) if est[f"k{i}"] == 40) >= 45
    assert est["absent"] >= 0  # may collide, never negative


def test_sketch_merge_contracts(spark):
    """The 100 TB story for both sketches is MERGEABILITY: building a
    sketch per shard and merging must equal building one sketch over
    the union. HLL merges by re-maxing registers; CMS merges by
    slot-wise summing counters. Exercised over a 2-way split."""
    from mktd6_flink_spark.functions import sketches as sk

    rows = [("g", f"v{i}") for i in range(3000)]
    df = spark.createDataFrame(rows, "g string, v string")
    half_a = df.filter(F.md5("v").substr(1, 1) < "8")
    half_b = df.subtract(half_a)

    whole_hll = sk.hll_distinct(df, ["g"], df.v).collect()[0]
    merged_regs = (
        sk.hll_registers(half_a, ["g"], half_a.v)
        .unionByName(sk.hll_registers(half_b, ["g"], half_b.v))
        .groupBy("g", "_bucket").agg(F.max("_M").alias("_M")))
    merged_hll = sk.hll_finalize(merged_regs, ["g"]).collect()[0]
    assert (whole_hll.hll_est, whole_hll.hll_empty_buckets) == \
        (merged_hll.hll_est, merged_hll.hll_empty_buckets)

    probes = spark.createDataFrame(
        [(f"v{i}",) for i in range(0, 3000, 100)], "v string")
    whole_cms = {r._key: r.cms_est for r in sk.cms_estimate(
        sk.cms_counters(df, df.v), probes, F.col("v")).collect()}
    merged_counters = (
        sk.cms_counters(half_a, half_a.v)
        .unionByName(sk.cms_counters(half_b, half_b.v))
        .groupBy("_row", "_slot").agg(F.sum("_cnt").alias("_cnt")))
    merged_cms = {r._key: r.cms_est for r in sk.cms_estimate(
        merged_counters, probes, F.col("v")).collect()}
    assert whole_cms == merged_cms


def test_bloom_empty_member_set_rejects_all(spark):
    """Degenerate but real at 100 TB (a shard with no members): an
    empty small side must yield an all-zero bitmap that rejects every
    probe — not a crash, not an accept-all."""
    from mktd6_flink_spark.functions import sketches as sk

    members = spark.createDataFrame([], "k long")
    probe = spark.createDataFrame([(i,) for i in range(100)], "k long")
    bitmap = sk.bloom_bitmap(members, F.col("k"))
    assert sk.bloom_filter(probe, F.col("k"), bitmap).count() == 0


def test_bloom_rejects_internal_column_collision(spark):
    """A probe side already carrying one of the injected internal
    columns must raise, not be silently clobbered (ADVICE r7 — same
    guard class as rangejoin's _BIN rejection)."""
    import pytest

    from mktd6_flink_spark.functions import sketches as sk

    members = spark.createDataFrame([(1,)], "k long")
    bitmap = sk.bloom_bitmap(members, F.col("k"))
    probe = spark.createDataFrame(
        [(1, 0)], f"k long, {sk._ARR} int")
    with pytest.raises(ValueError, match="internal column"):
        sk.bloom_filter(probe, F.col("k"), bitmap)


def test_kmv_distinct_accuracy_and_exact_small_groups(spark):
    """k=64 KMV: a group with fewer than k distinct values is counted
    EXACTLY (the sketch holds every hash); a large group's estimate
    lands within the sketch's error envelope (std ~ 1/sqrt(k-2) = 13%;
    assert 3 sigma). Duplicates must never move either (set
    semantics)."""
    from mktd6_flink_spark.functions import sketches as sk

    rows = [(grp, f"v{grp}_{i}")
            for grp, n in [("tiny", 10), ("big", 5000)]
            for i in range(n)]
    df = spark.createDataFrame(rows, "g string, v string")
    est = {r.g: (r.kmv_k_used, r.kmv_est)
           for r in sk.kmv_estimate(
               sk.kmv_bottomk(df, ["g"], df.v), ["g"]).collect()}
    assert est["tiny"] == (10, 10)  # under-full => exact
    k_used, e = est["big"]
    assert k_used == sk.KMV_K
    assert abs(e - 5000) / 5000 < 0.40, e
    df2 = df.union(df)
    est2 = {r.g: (r.kmv_k_used, r.kmv_est)
            for r in sk.kmv_estimate(
                sk.kmv_bottomk(df2, ["g"], df2.v), ["g"]).collect()}
    assert est == est2


def test_containment_catches_excerpt_jaccard_misses(spark):
    """A short doc fully contained in a long one must surface as a
    containment pair (~1.0) while its Jaccard stays below any dedup
    threshold — the quote/excerpt class the operator exists for. The
    hot-gram cap must also drop boilerplate-only pairs."""
    from mktd6_flink_spark.functions import dedup as dd

    words = [f"w{i}" for i in range(300)]
    long_doc = " ".join(words)
    excerpt = " ".join(words[:30])
    rows = [(1, long_doc), (2, excerpt), (3, "totally different text here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.id_a, r.id_b): (r.containment, r.na, r.nb)
             for r in dd.containment_pairs(df).collect()}
    assert (1, 2) in pairs
    c, na, nb = pairs[(1, 2)]
    assert c == 1.0 and nb < na
    jac = {(r.id_a, r.id_b): r.jaccard
           for r in dd.ngram_jaccard_pairs(df, threshold=0.0).collect()}
    assert jac[(1, 2)] < 0.15  # Jaccard structurally misses the excerpt
    # hot-gram cap: a gram shared by all docs is dropped before the join
    boiler = [(i, "common header line alpha beta") for i in (10, 11, 12)]
    df2 = spark.createDataFrame(rows + boiler, "doc_id long, text string")
    capped = dd.containment_pairs(df2, max_df=2).collect()
    assert all({r.id_a, r.id_b} != {10, 11} for r in capped)


def test_pq_codebook_vectors_encode_to_themselves(spark):
    """PQ invariants: (a) a vector that IS a codebook entry must
    encode to its own code with zero error in every subspace; (b) ADC
    distance of a query to a codebook vector equals the sum of its
    distance-table entries at that vector's codes — here zero for the
    query itself when the query is a codebook entry."""
    from mktd6_flink_spark.functions import similarity as sim

    import random
    rnd = random.Random(7)
    dim, n = 16, 40
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(dim)])
            for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    codes = {(r.vec_id, r.subspace): (r.code, r.err_micro)
             for r in sim.pq_codes(df, dim, m=4, k=16).collect()}
    for vid in range(16):
        for s in range(4):
            code, err = codes[(vid, s)]
            assert code == vid and err == 0, (vid, s, code, err)
    # every vector gets exactly m codes in [0, 16)
    assert len(codes) == n * 4
    assert all(0 <= c < 16 for c, _ in codes.values())


def test_markov_transition_rows_are_probabilities(spark):
    """Per from_type the transition probabilities must sum to 1 and
    the counts must equal n_events - n_users_with_that_last_type
    (every event except each user's final one emits one transition)."""
    from mktd6_flink_spark.plans import driver_queries as dq

    out = dq.QUERIES["events_markov_transitions"](
        spark, "/root/testdata/sf0.001").collect()
    import collections
    psum = collections.defaultdict(float)
    total = 0
    for r in out:
        psum[r.from_type] += r.p
        total += r.n
    for ft, s in psum.items():
        assert abs(s - 1.0) < 1e-9, (ft, s)
    ev = dq.load(spark, "/root/testdata/sf0.001", "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert total == n_events - n_users


def test_round_portable_no_bigint_saturation(spark):
    """round_portable must stay in the double domain: Spark's
    floor(double) returns BIGINT and saturates at 2^63, which clamped
    huge accumulators (st2's 1e43 product at sf0.1) to 9.22e12 while
    DuckDB's double floor sailed past. Large magnitudes must pass
    through unclamped and small values must still round to micros."""
    from mktd6_flink_spark.functions.hashing import round_portable

    import duckdb
    vals = [1.404596900468535e+43, 9.3e12, 123.4567894, 1.005,
            -2.6754315, 0.0000004, -1e40]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r.y for r in df.select(
        round_portable(F.col("x")).alias("y")).collect()]
    want = [duckdb.sql(
        f"SELECT floor(CAST({v!r} AS DOUBLE) * 1000000.0 + 0.5) "
        f"/ 1000000.0").fetchone()[0] for v in vals]
    assert got == want, list(zip(vals, got, want))
    assert got[0] > 1e42  # genuinely unclamped


def test_pq_codes_incomplete_codebook_fails_fast(spark):
    """pq_codes' codebook is the first-k vectors by contract (ids
    0..k-1 all present). With a gap the old code silently built a
    short codebook and emitted biased codes; now the in-plan
    assert_true aborts. Complete ids must still encode cleanly."""
    import numpy as np
    rng = np.random.RandomState(7)
    rows = [(i, rng.randn(8).tolist()) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    ok = similarity.pq_codes(df, dim=8, m=2, k=4)
    assert ok.count() == 20 * 2
    gappy = df.filter(F.col("vec_id") != 2)  # id 2 missing from 0..3
    with pytest.raises(Exception, match="incomplete codebook|assert"):
        similarity.pq_codes(gappy, dim=8, m=2, k=4).collect()


def test_pq_trained_incomplete_codebook_fails_fast(spark):
    """pq_trained_codebooks initializes from the SAME first-k-ids
    contract as pq_codes; without a guard, training from a gappy id
    space silently proceeds from a short codebook and every code it
    emits is biased (the exact failure the pq_codes assert was added
    for). The shared _codebook_count_guard must make it fatal on both
    the trained codebook and the ADC path built on it."""
    import numpy as np
    rng = np.random.RandomState(11)
    rows = [(i, rng.randn(8).tolist()) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    ok = similarity.pq_trained_codebooks(df, dim=8, m=2, k=4, iters=1)
    assert ok.count() <= 2 * 4  # empty codes may drop out, never exceed
    gappy = df.filter(F.col("vec_id") != 1)  # id 1 missing from 0..3
    with pytest.raises(Exception, match="incomplete codebook|assert"):
        similarity.pq_trained_codebooks(gappy, dim=8, m=2, k=4,
                                        iters=1).collect()
    with pytest.raises(Exception, match="incomplete codebook|assert"):
        similarity.pq_adc_topk_trained(gappy, [0], dim=8, m=2, kcent=4,
                                       iters=1).collect()


def test_keep_best_dedup_rejects_wide_doc_ids(spark, monkeypatch):
    """pipeline_keep_best_dedup packs priority as toks*1e6 +
    (999999 - doc_id); a doc_id >= 1e6 would unpack to a wrong
    kept_doc_id via negative-remainder arithmetic. The in-plan guard
    must abort instead of returning a wrong answer."""
    from mktd6_flink_spark.plans import driver_queries as dq

    big = spark.createDataFrame(
        [(1_000_001, "alpha beta gamma delta"),
         (7, "alpha beta gamma delta")],
        "doc_id long, text string")
    monkeypatch.setattr(dq, "_docs2", lambda s, d: big)
    with pytest.raises(Exception, match="doc_id >= 1e6|assert"):
        dq.QUERIES["pipeline_keep_best_dedup"](spark, "/unused").collect()


def test_pq_trained_beats_sampled_on_quantization_error(spark):
    """The trained-PQ quality bar, pinned on the trainer's OBJECTIVE:
    Lloyd-trained per-subspace codebooks must quantize the real
    embeddings table with at most the sampled codebook's total error
    (measured: ~30% lower, monotone in iterations). Recall@5 is now
    measured over the registry's 100-query truth set (500 samples) —
    the round-9 10-query dial was too noisy to order two codebooks
    (it measured trained BELOW sampled while error strictly
    improved); at 100 queries the ordering resolves (sf0.01: trained
    0.138 vs sampled 0.104; sf0.1: 0.096 vs 0.050), so the recall
    dial itself must now rank trained >= sampled."""
    from mktd6_flink_spark.plans import driver_queries as dq
    from mktd6_flink_spark.functions.similarity import (_pq_subvectors,
                                                        l2sq)

    sf = "/root/testdata/sf0.01"
    emb = dq.load(spark, sf, "embeddings")
    err_sampled = similarity.pq_codes(emb, 64).agg(
        F.sum("err_micro")).collect()[0][0]
    cb = similarity.pq_trained_codebooks(emb, 64)
    subs = _pq_subvectors(emb, 64, 4, "vec_id", "embedding")
    err_trained = (
        subs.join(F.broadcast(cb.withColumnRenamed("subspace", "_cs")),
                  F.col("subspace") == F.col("_cs"))
        .select("vec_id", "subspace",
                F.floor(l2sq(F.col("_sv"), F.col("cvec")) * F.lit(1e6)
                        + F.lit(0.5)).cast("long").alias("_dm"))
        .groupBy("vec_id", "subspace").agg(F.min("_dm").alias("d"))
        .agg(F.sum("d")).collect()[0][0])
    assert err_trained <= err_sampled, (err_trained, err_sampled)

    sampled = {r.query_id: r.recall_at_5 for r in
               dq.QUERIES["sim_pq_recall"](spark, sf).collect()}
    trained = {r.query_id: r.recall_at_5 for r in
               dq.QUERIES["sim_pq_trained_recall"](spark, sf).collect()}
    assert set(trained) == set(sampled)
    assert len(trained) == 100
    mean_s = sum(sampled.values()) / len(sampled)
    mean_t = sum(trained.values()) / len(trained)
    assert mean_t >= mean_s, (mean_t, mean_s)


def test_winnowing_finds_planted_dups_and_guarantee(spark):
    """Winnowing must (a) surface every planted near-dup pair of the
    registry's docs2 corpus at the 80% relative threshold, and (b)
    honor the paper's guarantee on a constructed case: two documents
    sharing a substring of length >= w + k - 1 share at least one
    selected fingerprint even when everything else differs."""
    from mktd6_flink_spark.plans import driver_queries as dq

    got = dq.QUERIES["dedup_winnowing"](spark, "/root/testdata/sf0.01") \
        .collect()
    planted = {(r.id_a, r.id_b) for r in got if r.id_b == r.id_a + 10000}
    assert len(planted) == 50, len(planted)

    # guarantee check: shared 23-char substring, different surroundings
    shared = "abcdefghijklmnopqrstuvw"  # w + k - 1 = 23 chars
    df = spark.createDataFrame(
        [(1, "zzzzzzzz " + shared + " yyyyyyyy"),
         (2, "qqqqqqqq " + shared + " rrrrrrrr")],
        "doc_id long, text string")
    pairs = dedup.winnowing_pairs(df, threshold_pct=1, max_df=None)
    assert pairs.filter("id_a = 1 and id_b = 2").count() == 1


def test_ivfpq_neighbors_come_from_probed_lists_and_guard(spark):
    """IVFADC structural contract: (a) every returned neighbor lives
    in one of its query's nprobe probed inverted lists (the pruning
    invariant that makes candidates O(n*nprobe/n_centroids)); (b) the
    shared codebook guard makes gappy first-k ids fatal rather than
    silently training a short residual codebook."""
    import numpy as np
    rng = np.random.RandomState(5)
    rows = [(i, rng.randn(16).tolist()) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = similarity.ivfpq_adc_topk(
        df, [0, 7, 33], dim=16, m=2, kcent=8, n_centroids=8, nprobe=2,
        k=3).collect()
    assert got, "no neighbors returned"
    # recompute coarse assignment + probes exactly as the index does
    cents = {r.vec_id: r.embedding for r in df.filter(
        F.col("vec_id") < 8).collect()}
    vecs = {r.vec_id: r.embedding for r in df.collect()}

    def dm(a, b):
        d = sum((float(x) - float(y)) ** 2 for x, y in zip(a, b))
        import math
        return math.floor(d * 1e6 + 0.5)

    def assign(v):
        return min(cents, key=lambda c: (dm(vecs[v], cents[c]), c))

    def probes(qid):
        order = sorted(cents, key=lambda c: (dm(vecs[qid], cents[c]), c))
        return set(order[:2])

    for r in got:
        assert assign(r.neighbor_id) in probes(r.query_id), r
    gappy = df.filter(F.col("vec_id") != 3)
    with pytest.raises(Exception, match="incomplete codebook|assert"):
        similarity.ivfpq_adc_topk(
            gappy, [0], dim=16, m=2, kcent=8, n_centroids=8,
            nprobe=2, k=3).collect()


def test_char_entropy_exact_integer_bits(spark):
    """Hand-checked quantized-entropy values: floor-log2 bits per
    char, weighted by count. 'aaaa' = 0 (one symbol), 'abab' =
    2*(2-1)+2*(2-1) = 4, 'abcd' = 4*(2-0) = 8; empty text splits to
    [''] in BOTH engines (one symbol -> 0 bits); NULL text keeps the
    row with NULL metrics."""
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, ""), (5, None)],
        "doc_id long, text string")
    got = {r.doc_id: r for r in text.char_entropy(df).collect()}
    assert got[1].entropy_bits == 0
    assert got[2].entropy_bits == 4
    assert got[3].entropy_bits == 8
    assert got[3].avg_bits_per_char == 2.0
    assert got[4].entropy_bits == 0 and got[4].n_chars == 0
    assert got[5].entropy_bits is None and got[5].n_distinct is None
    assert got[2].n_distinct == 2 and got[3].n_distinct == 4


def test_bpe_merge_exhaustion_keeps_vocab(spark):
    """A corpus whose pair supply runs out before the requested merge
    count must pass the vocabulary through the remaining iterations
    UNCHANGED: the driver-side loop breaks on an empty pair table,
    while the oracle's remaining iterations no-op over the unchanged
    vocab via the NULL scalar subquery — identical merge tables and
    final vocabs by construction."""
    from mktd6_flink_spark.plans.driver_queries import _bpe_train

    docs = spark.createDataFrame(
        [(1, "ab ab ab"), (2, "ab")], "doc_id long, text string")
    vocab, merges = _bpe_train(docs, 3, apply_last=True)
    rows = {w: s for w, _f, s in vocab}
    # rank 1 merges (a, b); ranks 2-3 find no pairs: the loop breaks
    # and the vocab passes through unchanged
    assert rows == {"ab": ["ab"]}
    assert len(merges) == 1 and merges[0]["m"] == "ab"
