"""Similarity search over embedding columns (array<float>): brute-force
cosine top-k as the exact baseline, and an LSH-bucketed (random-hyperplane
/ sign-LSH) variant as the 100 TB scale path.

Sign-LSH per Charikar (STOC 2002); IVF per Jegou/Douze/Schmid,
"Product quantization for nearest neighbor search" (TPAMI 2011) —
coarse quantizer + inverted lists (without the PQ compression stage).

Scale design:
- Brute force is O(|Q| x |N|) — correct baseline, fine when the query set
  is small and the corpus side fits a broadcast; the plan below broadcasts
  the QUERY side so the corpus is never shuffled.
- Sign-LSH: each vector gets a b-bit signature from deterministic ±1
  hyperplanes (derived from md5, so both engines and any number of
  executors agree without sharing state). Candidates = equi-join on the
  signature bucket → O(candidates); multi-probe (flipping one bit) can
  raise recall without changing the join shape.
- Dot products use a left-to-right fold over zipped arrays so Spark and the
  DuckDB oracle accumulate in the SAME order; results are rounded to 6 dp
  (fp error ~1e-15 for 64-dim, far below the rounding quantum).

All ranking ties are broken by vec_id so top-k sets are deterministic.
"""

from __future__ import annotations

import hashlib

from .hashing import expand_round6, round_portable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SIGN_LSH_BITS = 8


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold dot product in float64 (order matches the DuckDB
    twin exactly)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def sql_dot(a: str, b: str, dim: int) -> str:
    prods = (
        f"list_transform(generate_series(1, {dim}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))"
    )
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {prods}), "
        f"(acc, x) -> acc + x)"
    )


def l2sq_pre(aa: Column, ab: Column, bb: Column) -> Column:
    """``l2sq`` from PRE-computed per-side self-dots: the identical
    expression tree ``aa - 2.0*ab + bb``, for call sites that hoist
    ``dot(a,a)``/``dot(b,b)`` below a join. The HOF fold lambdas
    defeat common-subexpression elimination, so the inline spelling
    re-evaluates both self-dots per PAIR; hoisting evaluates each
    once per ROW — same doubles, ~1/3 the fold work on an n×Q scored
    product (guide: project/compute before the exchange)."""
    return aa - 2.0 * ab + bb


def cosine_pre(ab: Column, an: Column, bn: Column) -> Column:
    """``cosine`` from PRE-computed per-side norms ``sqrt(dot(x,x))``:
    same expression tree and zero-norm nullif guard as ``cosine``,
    with the two norm folds hoisted to once per row (see
    ``l2sq_pre``)."""
    return ab / F.nullif(an * bn, F.lit(0.0))


def norm_col(v: Column) -> Column:
    """The per-row vector norm ``sqrt(dot(v,v))`` for ``cosine_pre``."""
    return F.sqrt(dot(v, v))


def cosine(a: Column, b: Column) -> Column:
    # zero-norm guard via nullif: cosine against the zero vector is
    # undefined — NULL, not an ANSI divide-by-zero crash (a 100 TB
    # corpus WILL contain zero embeddings from failed encoders; found
    # by the degenerate sweep). nullif keeps each dot-product HOF
    # evaluated ONCE — a when()-branch form re-evaluated the norms
    # (HOF lambdas defeat CSE) and doubled sim_cosine_topk's cost at
    # sf0.1. NULL sorts after every real score in both engines' DESC
    # rankings.
    return dot(a, b) / F.nullif(
        F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)), F.lit(0.0))


def sql_cosine(a: str, b: str, dim: int) -> str:
    return (
        f"(({sql_dot(a, b, dim)}) / "
        f"nullif(sqrt({sql_dot(a, a, dim)})"
        f" * sqrt({sql_dot(b, b, dim)}), 0.0))"
    )


def cosine_topk(embeddings: DataFrame, query_ids: list[int], k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force exact cosine top-k: for each query id, the k nearest
    OTHER vectors. The query side (|Q| rows) is broadcast, so the corpus
    scan never shuffles — at 100 TB this is one pass over the corpus plus a
    cheap per-partition top-k via the rank window on (query, score)."""
    q = F.broadcast(
        embeddings.filter(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"),
            norm_col(F.col(vec_col)).alias("_qn")
        )
    )
    # self-norms hoisted below the cross join: inline cosine() would
    # re-fold each side's dot(x,x) per PAIR (HOFs defeat CSE)
    c = embeddings.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("_cv"),
                          norm_col(F.col(vec_col)).alias("_cn"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            round_portable(cosine_pre(dot(F.col("_qv"), F.col("_cv")),
                                      F.col("_qn"), F.col("_cn")))
            .alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine",
                F.col("rank").cast("int").alias("rank"))
    )


def sql_cosine_topk(table: str, query_ids: list[int], dim: int, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    ids = ", ".join(str(i) for i in query_ids)
    cos = sql_cosine("q._qv", "c._cv", dim)
    return expand_round6(f"""
    WITH q AS (SELECT {id_col} AS query_id, {vec_col} AS _qv FROM {table}
               WHERE {id_col} IN ({ids})),
    c AS (SELECT {id_col} AS neighbor_id, {vec_col} AS _cv FROM {table}),
    scored AS (
      SELECT query_id, neighbor_id, ROUND6({cos}) AS cosine
      FROM q CROSS JOIN c WHERE query_id <> neighbor_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id ASC) AS rank
          FROM scored)
    WHERE rank <= {k}
    """)


# -- sign-LSH (random hyperplane) ANN ----------------------------------------

def _plane_sign(bit: int, dim_idx: int) -> int:
    """Deterministic ±1 hyperplane component from md5 — reproducible on any
    engine/executor with no shared state (same construction as the DuckDB
    twin in sql_lsh_signature)."""
    h = hashlib.md5(f"plane_{bit}_{dim_idx}".encode()).hexdigest()
    return 1 if int(h[:15], 16) % 2 == 0 else -1


def lsh_signature(vec: Column, dim: int, bits: int = SIGN_LSH_BITS) -> Column:
    """b-bit sign-LSH signature: bit_j = 1 iff dot(vec, plane_j) > 0, packed
    into an int. Pure map-side expression; the ±1 plane components are
    compile-time literals."""
    sig = None
    for j in range(bits):
        proj = None
        for i in range(dim):
            term = F.element_at(vec, i + 1).cast("double") * F.lit(
                float(_plane_sign(j, i))
            )
            proj = term if proj is None else proj + term
        bit = F.when(proj > 0, F.lit(2 ** j)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return sig.cast("int")


def sql_lsh_signature(vec: str, dim: int, bits: int = SIGN_LSH_BITS) -> str:
    terms = []
    for j in range(bits):
        proj = " + ".join(
            f"CAST({vec}[{i + 1}] AS DOUBLE) * ({float(_plane_sign(j, i))})"
            for i in range(dim)
        )
        terms.append(f"CASE WHEN ({proj}) > 0 THEN {2 ** j} ELSE 0 END")
    return "CAST((" + " + ".join(terms) + ") AS INTEGER)"


def lsh_ann_topk(embeddings: DataFrame, query_ids: list[int], dim: int,
                 k: int = 5, bits: int = SIGN_LSH_BITS,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: rank by exact cosine WITHIN the query's LSH
    bucket. The bucket equi-join replaces the cross join — O(candidates).
    Queries whose bucket has < k neighbors return fewer rows (recall trade,
    standard for single-probe LSH)."""
    # per-row norm hoisted below the bucket join (see l2sq_pre)
    with_sig = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        lsh_signature(F.col(vec_col), dim, bits).alias("_bucket"),
        norm_col(F.col(vec_col)).alias("_n"),
    )
    q = F.broadcast(
        with_sig.filter(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
            F.col("_bucket").alias("_qb"),
            F.col("_n").alias("_qn"),
        )
    )
    scored = (
        q.join(with_sig, F.col("_qb") == F.col("_bucket"))
        .filter(F.col("query_id") != F.col(id_col))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            round_portable(cosine_pre(dot(F.col("_qv"), F.col(vec_col)),
                                      F.col("_qn"), F.col("_n")))
            .alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine",
                F.col("rank").cast("int").alias("rank"))
    )


def sql_lsh_ann_topk(table: str, query_ids: list[int], dim: int, k: int = 5,
                     bits: int = SIGN_LSH_BITS, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> str:
    ids = ", ".join(str(i) for i in query_ids)
    sig = sql_lsh_signature(vec_col, dim, bits)
    cos = sql_cosine("q._qv", "c._cv", dim)
    return expand_round6(f"""
    WITH s AS (SELECT {id_col}, {vec_col}, {sig} AS _bucket FROM {table}),
    q AS (SELECT {id_col} AS query_id, {vec_col} AS _qv, _bucket AS _qb
          FROM s WHERE {id_col} IN ({ids})),
    c AS (SELECT {id_col} AS neighbor_id, {vec_col} AS _cv, _bucket FROM s),
    scored AS (
      SELECT query_id, neighbor_id, ROUND6({cos}) AS cosine
      FROM q JOIN c ON q._qb = c._bucket
      WHERE query_id <> neighbor_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id ASC) AS rank
          FROM scored)
    WHERE rank <= {k}
    """)


# -- k-means training (Lloyd) -------------------------------------------------

KMEANS_K = 8
KMEANS_ITERS = 2


def l2sq(a: Column, b: Column) -> Column:
    """Squared euclidean distance via dot products (one pass per term,
    same associativity as the DuckDB twin)."""
    return dot(a, a) - 2.0 * dot(a, b) + dot(b, b)


def sql_l2sq(a: str, b: str, dim: int) -> str:
    return (f"(({sql_dot(a, a, dim)}) - 2.0 * ({sql_dot(a, b, dim)}) "
            f"+ ({sql_dot(b, b, dim)}))")


def kmeans_centroids(embeddings: DataFrame, dim: int, k: int = KMEANS_K,
                     iters: int = KMEANS_ITERS, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Sampled Lloyd k-means — the REAL IVF coarse-quantizer trainer
    (Jegou 2011 §III trains the coarse quantizer with k-means; the
    first-K sample in ``ivf_centroids`` is the cheap stand-in).

    Deterministic and oracle-checkable by construction:
    - init = the first-K vectors (id < k), centroid_id = vec id;
    - assignment = argmin of ROUND6(squared L2) (tie → lowest id),
      computed as a broadcast cross join against the constant-size
      centroid set then ``groupBy(vec).agg(min_by)`` — map-side
      partials, ONE row per vector shuffled;
    - update = per-(centroid, dim) mean with integer-micros sums, so
      aggregation order cannot change the result (the repo's cents
      rule applied to vectors).

    Each iteration is one broadcast join + two uniform-key shuffles
    (n·dim rows then k·dim rows) — no iteration-to-iteration driver
    state beyond the tiny centroid table, so the loop count is the only
    sequential dimension. Empty clusters drop out (both engines).
    Returns (centroid_id, dim, centroid) rows.
    """
    # per-vector self-dot hoisted below the assignment cross join:
    # inline l2sq re-folds dot(v,v) once per (vector, centroid) PAIR
    # and dot(c,c) once per pair too (K and n times the needed work —
    # HOF lambdas defeat CSE); hoisting keeps the same doubles
    emb_pre = embeddings.select(
        F.col(id_col), F.col(vec_col),
        dot(F.col(vec_col), F.col(vec_col)).alias("_vv"))
    cents = embeddings.filter(F.col(id_col) < k).select(
        F.col(id_col).cast("int").alias("centroid_id"),
        F.col(vec_col).alias("_cvec"))
    for _ in range(iters):
        cpre = F.broadcast(cents.withColumn(
            "_cc", dot(F.col("_cvec"), F.col("_cvec"))))
        scored = emb_pre.crossJoin(cpre).select(
            id_col, vec_col, "centroid_id",
            round_portable(l2sq_pre(F.col("_vv"),
                                    dot(F.col(vec_col), F.col("_cvec")),
                                    F.col("_cc"))).alias("_d"))
        best = scored.groupBy(id_col).agg(
            F.min_by(
                F.struct(F.col("centroid_id"), F.col(vec_col).alias("_v")),
                F.struct(F.col("_d"), F.col("centroid_id").alias("_c")),
            ).alias("_b")
        ).select(F.col("_b.centroid_id").alias("centroid_id"),
                 F.col("_b._v").alias(vec_col))
        means = (
            best.select("centroid_id",
                        F.posexplode(vec_col).alias("_d0", "_v"))
            .groupBy("centroid_id",
                     (F.col("_d0") + 1).cast("int").alias("dim"))
            .agg((F.sum(F.floor(F.col("_v").cast("double") * 1000000.0
                                + 0.5).cast("long")).cast("double")
                  / 1000000.0 / F.count(F.lit(1))).alias("val"))
        )
        cents = means.groupBy("centroid_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "val"))),
                lambda s: s["val"],
            ).alias("_cvec"))
    return cents.select(
        "centroid_id",
        F.posexplode("_cvec").alias("_d0", "centroid"),
    ).select("centroid_id", (F.col("_d0") + 1).cast("int").alias("dim"),
             "centroid")


def sql_kmeans_centroids(table: str, dim: int, k: int = KMEANS_K,
                         iters: int = KMEANS_ITERS, id_col: str = "vec_id",
                         vec_col: str = "embedding") -> str:
    """DuckDB twin of ``kmeans_centroids``: the same fixed-iteration
    Lloyd loop unrolled into chained CTEs."""
    micros = ("CAST(sum(CAST(floor(CAST({v}[g.i] AS DOUBLE) * 1000000.0 "
              "+ 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / count(*)")
    parts = [
        f"c0 AS (SELECT CAST({id_col} AS INTEGER) AS centroid_id, "
        f"{vec_col} AS cvec FROM {table} WHERE {id_col} < {k})"
    ]
    for it in range(1, iters + 1):
        prev = f"c{it - 1}"
        d = sql_l2sq("e." + vec_col, "c.cvec", dim)
        parts.append(f"""a{it} AS (
  SELECT {id_col}, {vec_col}, centroid_id FROM (
    SELECT e.{id_col}, e.{vec_col}, c.centroid_id,
           row_number() OVER (PARTITION BY e.{id_col}
             ORDER BY ROUND6({d}) ASC, c.centroid_id ASC) AS rn
    FROM {table} e CROSS JOIN {prev} c) WHERE rn = 1)""")
        parts.append(
            f"m{it} AS (SELECT centroid_id, CAST(g.i AS INTEGER) AS dim, "
            f"{micros.format(v=vec_col)} AS val FROM a{it}, "
            f"(SELECT unnest(generate_series(1, {dim})) AS i) g "
            f"GROUP BY 1, 2)")
        parts.append(
            f"c{it} AS (SELECT centroid_id, list(val ORDER BY dim) AS cvec "
            f"FROM m{it} GROUP BY 1)")
    body = ",\n".join(parts)
    return expand_round6(
        f"WITH {body}\n"
        f"SELECT centroid_id, dim, val AS centroid FROM m{iters}")


# -- IVF (inverted-file) ANN --------------------------------------------------

IVF_N_CENTROIDS = 32    # CONSTANT centroid count — does not grow with corpus
IVF_NPROBE = 2


def ivf_centroids(embeddings: DataFrame, n_centroids: int = IVF_N_CENTROIDS,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Deterministic first-K "training" sample (vec_id < K) — the cheap
    trainer both engines and every executor reproduce without shared
    state; ``kmeans_centroids`` is the REAL (Lloyd) trainer with the
    same determinism guarantees. K is a CONSTANT either way, so the
    centroid set stays broadcast-sized no matter how large the corpus
    grows (the round-2 vec_id % 50 == 0 scheme made centroid count —
    and the assignment cross join — grow linearly with n)."""
    return embeddings.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("centroid_id"),
        F.col(vec_col).alias("_cvec"),
    )


def ivf_assign(embeddings: DataFrame, dim: int,
               n_centroids: int = IVF_N_CENTROIDS,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """IVF coarse quantization: each vector joins its best centroid by
    cosine (tie → lowest centroid id). The scoring is a broadcast cross
    join against the constant-size centroid set (map-side, no corpus
    shuffle); the best-centroid pick is ``groupBy(vec).agg(max_by)`` so
    the aggregate gets map-side partial combining — the shuffle carries
    ONE row per vector, not the n×K scored product a row_number window
    would sort."""
    # centroid-side norm hoisted below the cross join (see l2sq_pre);
    # the vector-side norm is hoisted too — n rows once vs n×K times
    cents = F.broadcast(
        ivf_centroids(embeddings, n_centroids, id_col, vec_col)
        .withColumn("_cn", norm_col(F.col("_cvec"))))
    scored = embeddings.select(
        id_col, vec_col, norm_col(F.col(vec_col)).alias("_vn")
    ).crossJoin(cents).select(
        id_col, vec_col, "centroid_id",
        round_portable(cosine_pre(dot(F.col(vec_col), F.col("_cvec")),
                                  F.col("_vn"), F.col("_cn")))
        .alias("_ccos"),
    )
    # max of struct(_ccos, -centroid_id) == highest cosine, then lowest
    # centroid id — Spark struct comparison is lexicographic.
    best = scored.groupBy(id_col).agg(
        F.max_by(
            F.struct(F.col("centroid_id"), F.col(vec_col).alias("_v")),
            F.struct(F.col("_ccos").alias("_c"),
                     (-F.col("centroid_id")).alias("_nid")),
        ).alias("_best")
    )
    return best.select(
        id_col,
        F.col("_best._v").alias(vec_col),
        F.col("_best.centroid_id").alias("centroid_id"),
    )


def ivf_ann_topk(embeddings: DataFrame, query_ids: list[int], dim: int,
                 k: int = 5, nprobe: int = IVF_NPROBE,
                 n_centroids: int = IVF_N_CENTROIDS,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """IVF search: each query probes its ``nprobe`` nearest centroids and
    ranks only those inverted lists by exact cosine — candidates are
    O(n * nprobe / n_centroids) instead of O(n)."""
    # norms hoisted below both joins (see l2sq_pre): corpus-side once
    # per vector (vs once per candidate pair), query-side once per query
    assigned = ivf_assign(embeddings, dim, n_centroids, id_col, vec_col) \
        .withColumn("_an", norm_col(F.col(vec_col)))
    cents = F.broadcast(
        ivf_centroids(embeddings, n_centroids, id_col, vec_col)
        .withColumn("_cn", norm_col(F.col("_cvec"))))
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"),
        norm_col(F.col(vec_col)).alias("_qn"))
    probe_scored = q.crossJoin(cents).select(
        "query_id", "_qv", "_qn", "centroid_id",
        round_portable(cosine_pre(dot(F.col("_qv"), F.col("_cvec")),
                                  F.col("_qn"), F.col("_cn")))
        .alias("_pcos"),
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("_pcos").desc(), F.col("centroid_id").asc())
    probes = (
        probe_scored.withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "_qv", "_qn", "centroid_id")
    )
    # Broadcast the probe list (|Q| x nprobe rows) so the corpus-sized
    # inverted lists are never shuffled — the scan stays map-side.  No
    # dedup needed: each vector lives in exactly ONE inverted list, so a
    # (query, neighbor) pair can appear at most once.
    cands = F.broadcast(probes).join(assigned, "centroid_id").filter(
        F.col("query_id") != F.col(id_col))
    scored = cands.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        round_portable(cosine_pre(dot(F.col("_qv"), F.col(vec_col)),
                                  F.col("_qn"), F.col("_an")))
        .alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine",
                F.col("rank").cast("int").alias("rank"))
    )


def sql_ivf_ann_topk(table: str, query_ids: list[int], dim: int, k: int = 5,
                     nprobe: int = IVF_NPROBE,
                     n_centroids: int = IVF_N_CENTROIDS,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> str:
    ids = ", ".join(str(i) for i in query_ids)
    acos = sql_cosine("v._v", "c._cvec", dim)
    pcos = sql_cosine("q._qv", "c._cvec", dim)
    fcos = sql_cosine("q._qv", "a._v", dim)
    return expand_round6(f"""
    WITH cents AS (SELECT {id_col} AS centroid_id, {vec_col} AS _cvec
                   FROM {table} WHERE {id_col} < {n_centroids}),
    v AS (SELECT {id_col} AS vid, {vec_col} AS _v FROM {table}),
    assigned AS (
      SELECT vid, _v, centroid_id FROM (
        SELECT v.vid, v._v, c.centroid_id,
               row_number() OVER (PARTITION BY v.vid
                 ORDER BY ROUND6({acos}) DESC, c.centroid_id ASC) AS rn
        FROM v CROSS JOIN cents c) WHERE rn = 1),
    q AS (SELECT {id_col} AS query_id, {vec_col} AS _qv FROM {table}
          WHERE {id_col} IN ({ids})),
    probes AS (
      SELECT query_id, _qv, centroid_id FROM (
        SELECT q.query_id, q._qv, c.centroid_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY ROUND6({pcos}) DESC, c.centroid_id ASC) AS rn
        FROM q CROSS JOIN cents c) WHERE rn <= {nprobe}),
    scored AS (
      SELECT q.query_id, a.vid AS neighbor_id,
             ROUND6({fcos}) AS cosine
      FROM probes q JOIN assigned a ON a.centroid_id = q.centroid_id
      WHERE q.query_id <> a.vid)
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id ASC) AS rank
          FROM scored)
    WHERE rank <= {k}
    """)


# -- Product quantization (PQ) ------------------------------------------------

PQ_M = 4   # subspaces
PQ_K = 16  # codes per subspace (4 bits)


def _codebook_count_guard(cents: DataFrame, m: int, k: int, fn: str):
    """The first-k-ids codebook-completeness guard shared by the
    sampled (``pq_codes``) and trained (``pq_trained_codebooks``)
    paths: both initialize codebooks from ``filter(id_col < k)``, so
    with id gaps (or ids not starting at 0) the codebook is silently
    short and every emitted code is biased. Returns (1-row count
    frame to broadcast-crossJoin, guard column) — the guard is 0L
    when all m*k subvector rows exist and fatal (assert_true)
    otherwise, so folding it in as +0 leaves values unchanged while
    making the precondition violation abort the job in-plan."""
    ncent = cents.agg(F.count(F.lit(1)).alias("_ncent"))
    guard = F.coalesce(
        F.assert_true(
            F.col("_ncent") == F.lit(m * k),
            F.lit(f"{fn}: incomplete codebook — expected ids 0..{k - 1}"
                  f" all present ({m * k} subvector rows)")).cast("long"),
        F.lit(0).cast("long"))
    return ncent, guard


def pq_codes(embeddings: DataFrame, dim: int, m: int = PQ_M,
             k: int = PQ_K, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Product-quantization encoding (Jegou, Douze, Schmid, "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): split each
    vector into m subvectors, quantize each against a per-subspace
    codebook of k entries → an m-byte code replacing a dim-float
    vector (here 4 codes for 64 floats: 64× compression). At 100 TB
    THIS is what makes billion-vector ANN fit in memory — IVF prunes
    candidates, PQ shrinks what every candidate costs to score.

    Deterministic and oracle-checkable like the IVF/k-means family:
    codebook = the first-k vectors' subvectors (ivf_centroids-style
    cheap trainer, constant-size so it broadcasts at any corpus
    scale); assignment = argmin of micro-quantized squared L2
    (floor(d*1e6+0.5) — the fold order matches the SQL twin exactly,
    so the integer can never differ), ties to the lower code. The
    scored product (n·m·k rows) is map-side only; the argmin is
    groupBy(vec, subspace).agg(min_by) — map-side partial combining,
    ONE row per (vector, subspace) shuffled.

    PRECONDITION (enforced): the codebook is the first-k vectors, so
    ids 0..k-1 must all exist in the input — with gaps (or ids not
    starting at 0) the codebook would be short and the encoder would
    silently emit biased codes. An in-plan assert_true on the
    broadcast codebook's row count (m*k, a constant-size aggregate
    over the tiny cents side) aborts the job instead.

    Returns (id, subspace, code, err_micro) — err_micro is the
    per-subspace quantization error, the quantity a codebook trainer
    monitors."""
    sub = dim // m
    subs = embeddings.select(
        id_col,
        F.explode(F.array(*[
            F.struct(F.lit(j).cast("int").alias("subspace"),
                     F.slice(F.col(vec_col), j * sub + 1, sub)
                     .alias("_sv"))
            for j in range(m)])).alias("_e")
    ).select(id_col, F.col("_e.subspace").alias("subspace"),
             F.col("_e._sv").alias("_sv"))
    cents = subs.filter(F.col(id_col) < k).select(
        F.col("subspace").alias("_cs"),
        F.col(id_col).cast("int").alias("_code"),
        F.col("_sv").alias("_cv"))
    # Fail-fast id-contiguity guard: count the (constant-size) codebook
    # once, broadcast the 1-row count, and fold an assert_true into the
    # distance as +0 — values unchanged, incomplete codebooks fatal.
    ncent, cguard = _codebook_count_guard(cents, m, k, "pq_codes")
    # subvector/code self-dots hoisted below the k-way encode join
    # (see l2sq_pre): n·m + m·k rows once vs n·m·k pairs
    scored = subs.withColumn(
        "_svv", dot(F.col("_sv"), F.col("_sv"))
    ).join(F.broadcast(cents.withColumn(
        "_cvv", dot(F.col("_cv"), F.col("_cv")))),
        F.col("subspace") == F.col("_cs")).crossJoin(
        F.broadcast(ncent)).select(
        id_col, "subspace", "_code",
        (F.floor(l2sq_pre(F.col("_svv"),
                          dot(F.col("_sv"), F.col("_cv")),
                          F.col("_cvv")) * F.lit(1000000.0)
                 + F.lit(0.5)).cast("long") + cguard).alias("_dm"))
    best = scored.groupBy(id_col, "subspace").agg(
        F.min_by(
            F.struct(F.col("_code"), F.col("_dm")),
            F.struct(F.col("_dm").alias("_d"),
                     F.col("_code").alias("_c")),
        ).alias("_b"))
    return best.select(
        id_col, "subspace",
        F.col("_b._code").alias("code"),
        F.col("_b._dm").alias("err_micro"))


def sql_pq_codes(table: str, dim: int, m: int = PQ_M, k: int = PQ_K,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> str:
    """DuckDB twin: identical subvector slices, distances, micro
    quantization, and tie order."""
    sub = dim // m
    d = sql_l2sq("a.sv", "c.cv", sub)
    return f"""
    WITH _pq_sub AS (
      SELECT {id_col}, CAST(g.s AS INTEGER) AS subspace,
             {vec_col}[g.s * {sub} + 1 : (g.s + 1) * {sub}] AS sv
      FROM {table},
           (SELECT unnest(generate_series(0, {m - 1})) AS s) g
    ),
    _pq_cent AS (
      SELECT subspace, CAST({id_col} AS INTEGER) AS code, sv AS cv
      FROM _pq_sub WHERE {id_col} < {k}
    ),
    _pq_scored AS (
      SELECT a.{id_col}, a.subspace, c.code,
             CAST(floor(({d}) * 1000000.0 + 0.5) AS BIGINT) AS dm
      FROM _pq_sub a JOIN _pq_cent c ON c.subspace = a.subspace
    )
    SELECT {id_col}, subspace, code, dm AS err_micro FROM (
      SELECT *, row_number() OVER (PARTITION BY {id_col}, subspace
                   ORDER BY dm ASC, code ASC) AS rn
      FROM _pq_scored) WHERE rn = 1
    """


def pq_adc_topk(embeddings: DataFrame, query_ids: list[int], dim: int,
                m: int = PQ_M, kcent: int = PQ_K, k: int = 5,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Asymmetric distance computation (ADC) search over PQ codes
    (Jegou 2011 §IV): each query precomputes an m x kcent distance
    table against the codebook, then every corpus vector is scored by
    LOOKUP — sum over subspaces of table[subspace][code] — without
    ever touching the original floats. This is the scan that makes
    compressed billion-vector search cheap: the corpus side carries
    only the m small codes, the distance tables (|Q| * m * kcent
    integers) broadcast, scoring is map-side adds, and the only
    shuffle is the (query, vector) partial-sum combine. Distances
    stay micro-quantized integers end to end, so cross-engine
    summation order cannot flip a bit.

    Returns (query_id, neighbor_id, adc_micro, rank), k nearest OTHER
    vectors per query by approximate distance, ties to lower id."""
    sub = dim // m
    codes = pq_codes(embeddings, dim, m, kcent, id_col, vec_col)
    qsubs = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.explode(F.array(*[
            F.struct(F.lit(j).cast("int").alias("subspace"),
                     F.slice(F.col(vec_col), j * sub + 1, sub)
                     .alias("_qsv"))
            for j in range(m)])).alias("_e")
    ).select("query_id", F.col("_e.subspace").alias("subspace"),
             F.col("_e._qsv").alias("_qsv"))
    cents = embeddings.filter(F.col(id_col) < kcent).select(
        F.col(id_col).cast("int").alias("_code"),
        F.explode(F.array(*[
            F.struct(F.lit(j).cast("int").alias("_cs"),
                     F.slice(F.col(vec_col), j * sub + 1, sub)
                     .alias("_cv"))
            for j in range(m)])).alias("_e")
    ).select("_code", F.col("_e._cs").alias("_cs"),
             F.col("_e._cv").alias("_cv"))
    dtab = qsubs.join(cents, F.col("subspace") == F.col("_cs")).select(
        "query_id", "subspace", "_code",
        F.floor(l2sq(F.col("_qsv"), F.col("_cv")) * F.lit(1000000.0)
                + F.lit(0.5)).cast("long").alias("_dm"))
    scored = (
        codes.join(F.broadcast(dtab),
                   (codes.subspace == dtab.subspace)
                   & (codes.code == dtab._code))
        .filter(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", F.col(id_col).alias("neighbor_id"))
        .agg(F.sum("_dm").alias("adc_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_micro").asc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "adc_micro",
                    F.col("rank").cast("int").alias("rank")))


def sql_pq_adc_topk(table: str, query_ids: list[int], dim: int,
                    m: int = PQ_M, kcent: int = PQ_K, k: int = 5,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> str:
    """DuckDB twin: same codes, same distance tables, same integer
    sums and tie order."""
    sub = dim // m
    ids = ", ".join(str(i) for i in query_ids)
    d = sql_l2sq("q.qsv", "c.cv", sub)
    return f"""
    WITH _adc_codes AS ({sql_pq_codes(table, dim, m, kcent,
                                      id_col, vec_col)}),
    _adc_q AS (
      SELECT {id_col} AS query_id, CAST(g.s AS INTEGER) AS subspace,
             {vec_col}[g.s * {sub} + 1 : (g.s + 1) * {sub}] AS qsv
      FROM {table},
           (SELECT unnest(generate_series(0, {m - 1})) AS s) g
      WHERE {id_col} IN ({ids})
    ),
    _adc_c AS (
      SELECT CAST({id_col} AS INTEGER) AS code,
             CAST(g.s AS INTEGER) AS cs,
             {vec_col}[g.s * {sub} + 1 : (g.s + 1) * {sub}] AS cv
      FROM {table},
           (SELECT unnest(generate_series(0, {m - 1})) AS s) g
      WHERE {id_col} < {kcent}
    ),
    _adc_dtab AS (
      SELECT q.query_id, q.subspace, c.code,
             CAST(floor(({d}) * 1000000.0 + 0.5) AS BIGINT) AS dm
      FROM _adc_q q JOIN _adc_c c ON c.cs = q.subspace
    ),
    _adc_scored AS (
      SELECT t.query_id, x.{id_col} AS neighbor_id,
             CAST(sum(t.dm) AS BIGINT) AS adc_micro
      FROM _adc_codes x
      JOIN _adc_dtab t ON t.subspace = x.subspace AND t.code = x.code
      WHERE x.{id_col} <> t.query_id
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, adc_micro, CAST(rank AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY adc_micro ASC, neighbor_id ASC) AS rank
          FROM _adc_scored)
    WHERE rank <= {k}
    """


# -- Trained product quantization ---------------------------------------------

PQ_TRAIN_ITERS = 2
# Lloyd training set target: ~this many vectors per subspace. Training on
# the full corpus is the one not-100x-safe shape in the PQ family — each
# iteration re-shuffles the whole corpus just to fit a constant m*k-row
# model. A deterministic modulo sample (vec_id % s == 0, s = n // target)
# trains the same-quality codebook from a bounded set, exactly as
# kmeans/IVF already train from bounded first-k seeds. 512 vectors per
# 16-code subquantizer is ~32 points per centroid — comfortably above the
# k-means stability floor for 16-dim subvectors.
PQ_TRAIN_SAMPLE = 512


def _pq_subvectors(embeddings: DataFrame, dim: int, m: int,
                   id_col: str, vec_col: str) -> DataFrame:
    """(id, subspace, _sv): each vector split into its m subvectors."""
    sub = dim // m
    return embeddings.select(
        id_col,
        F.explode(F.array(*[
            F.struct(F.lit(j).cast("int").alias("subspace"),
                     F.slice(F.col(vec_col), j * sub + 1, sub)
                     .alias("_sv"))
            for j in range(m)])).alias("_e")
    ).select(id_col, F.col("_e.subspace").alias("subspace"),
             F.col("_e._sv").alias("_sv"))


def _pq_train_local(embeddings: DataFrame, dim: int, m: int, k: int,
                    iters: int, id_col: str, vec_col: str,
                    sample_mod: int) -> list[tuple]:
    """Driver-side Lloyd trainer shared by ``pq_trained_codebooks``
    (which wraps the rows in a literal frame) and
    ``pq_adc_topk_trained`` (which consumes them directly — no extra
    collect round trip). Returns [(subspace, code, cvec), ...]."""
    import numpy as np

    sub = dim // m
    cond = (F.lit(True) if sample_mod <= 1
            else (F.col(id_col) < k)
            | (F.col(id_col) % sample_mod == 0))
    rows = (embeddings.filter(cond).select(id_col, vec_col)
            .orderBy(F.col(id_col).asc()).collect())
    init = [(int(r[0]), r[1]) for r in rows if int(r[0]) < k]
    if len(init) != k:
        # Same first-k-ids precondition as pq_codes, same fail-fast
        # contract as the shared _codebook_count_guard: training from
        # a silently-short codebook emits biased codes with no error.
        raise ValueError(
            f"pq_trained_codebooks: incomplete codebook init "
            f"({len(init)} of {k} first-k vectors present)")
    train = np.array(
        [[float(x) for x in r[1]] for r in rows
         if sample_mod <= 1 or int(r[0]) % sample_mod == 0],
        dtype=np.float64).reshape(-1, dim)
    out = []
    for j in range(m):
        a = train[:, j * sub:(j + 1) * sub]  # float64, exact widening
        # codes ascend with init id, so argmin's first-index rule is
        # the tie-to-lower-code contract
        cents = [(code, [float(x) for x in vec[j * sub:(j + 1) * sub]])
                 for code, vec in init]
        # dot(a,a) / dot(b,b) / dot(a,b) as SEQUENTIAL per-dim
        # accumulation — identical addition order to the engines'
        # left-assoc folds, vectorized across rows only. aa depends
        # only on the fixed training matrix, so hoist it out of the
        # iteration loop (same bits, half the norm work).
        aa = np.zeros(len(a))
        for d in range(sub):
            aa = aa + a[:, d] * a[:, d]
        for _ in range(iters):
            dms = np.empty((len(a), len(cents)), dtype=np.int64)
            for ci, (_code, cv) in enumerate(cents):
                ab = np.zeros(len(a))
                for d in range(sub):
                    ab = ab + a[:, d] * cv[d]
                bb = 0.0
                for d in range(sub):
                    bb = bb + cv[d] * cv[d]
                dms[:, ci] = np.floor(
                    (aa - 2.0 * ab + bb) * 1000000.0 + 0.5)
            best = np.argmin(dms, axis=1)
            new_cents = []
            for ci, (code, _cv) in enumerate(cents):
                mem = a[best == ci]
                if not len(mem):
                    continue  # empty codes drop out, both engines
                micros = np.floor(mem * 1000000.0 + 0.5).astype(
                    np.int64).sum(axis=0)
                new_cents.append((code, [
                    (float(s) / 1000000.0) / len(mem) for s in micros]))
            cents = new_cents
        out.extend((j, code, cv) for code, cv in cents)
    return out


def pq_trained_codebooks(embeddings: DataFrame, dim: int, m: int = PQ_M,
                         k: int = PQ_K, iters: int = PQ_TRAIN_ITERS,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         sample_mod: int | None = None) -> DataFrame:
    """Per-subspace Lloyd-trained PQ codebooks (Jegou 2011 §II trains
    each subquantizer with k-means — the sampled first-k codebook in
    ``pq_codes`` is the cheap stand-in; THIS is the real index's
    trainer).

    Determinism contract (same as the kmeans/IVF family): init = the
    first-k vectors' subvectors (incomplete init fail-fasts, like the
    pq_codes guard); assignment = argmin of micro-quantized squared
    L2, ties to the lower code; update = per-(subspace, code, dim)
    integer-micros mean, so aggregation order cannot change a bit.
    Empty codes drop out in both engines.

    ``sample_mod``: train on the deterministic modulo sample
    ``id % sample_mod == 0`` instead of the full corpus. The model is
    a constant m*k rows; fitting it from a bounded sample is the
    100x-safe shape, and membership is a pure function of the id so
    the DuckDB twin samples identically. Init (first-k vectors) is
    unaffected. Default None DERIVES the corpus-size modulus
    ``max(1, n // PQ_TRAIN_SAMPLE)`` (one column-pruned count) so the
    collect below is bounded for every caller — an explicit 1 opts
    into full-corpus training for small corpora/tests (the r13
    default, which silently collected the whole corpus to the driver
    for any direct caller at scale).

    Training runs DRIVER-SIDE on the collected sample (round 13; the
    BPE-trainer lesson): the input is bounded by the sample contract
    and the model is constant-size, while the distributed loop paid
    ~1 s of scheduling + codegen per iteration to process a few
    hundred rows — the bench head halved once and then stalled on
    that fixed cost. Distributed work remains exactly the bounded
    scan+filter that feeds the collect. The numpy arithmetic is
    BIT-IDENTICAL to the old in-plan loop and the DuckDB twin:
    float32 subvectors widen exactly to float64; the l2sq fold
    accumulates ACROSS DIMS sequentially (vectorized across rows), so
    per-row addition order equals the HOF/list_aggregate fold; argmin
    over int64 micro-quantized distances with np.argmin's first-index
    rule = tie-to-lower-code; means are integer-micros sums (order-
    free) divided as (S / 1e6) / n. The pinned proof is the oracle
    gate itself: hashes must match the unrolled-CTE twin at both SFs.

    Returns (subspace, code, cvec) — a LITERAL constant-size frame
    (the broadcast-a-trained-model pattern)."""
    if sample_mod is None:
        sample_mod = max(1, embeddings.count() // PQ_TRAIN_SAMPLE)
    return embeddings.sparkSession.createDataFrame(
        _pq_train_local(embeddings, dim, m, k, iters, id_col, vec_col,
                        sample_mod),
        "subspace int, code int, cvec array<double>")


def sql_pq_trained_codebooks(table: str, dim: int, m: int = PQ_M,
                             k: int = PQ_K, iters: int = PQ_TRAIN_ITERS,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             sample_mod: int | str | None = None) -> str:
    """DuckDB twin of ``pq_trained_codebooks``: the same fixed-iteration
    per-subspace Lloyd loop unrolled into chained CTEs, with the same
    deterministic ``id % sample_mod == 0`` training sample.
    ``sample_mod`` may be a SQL expression (scalar subquery) — entry
    oracles are static strings built at import time, so a
    corpus-size-derived modulus must be computed by the engine.
    Default None mirrors the python side's derived modulus
    ``max(1, n // PQ_TRAIN_SAMPLE)`` as a scalar subquery, so a direct
    caller pairing the two functions' DEFAULTS trains on the same
    sample (round 15; previously python defaulted derived while this
    defaulted 1 = full corpus, silently diverging)."""
    if sample_mod is None:
        sample_mod = (f"SELECT greatest(1, count(*) // "
                      f"{PQ_TRAIN_SAMPLE}) FROM {table}")
    sub = dim // m
    micro_mean = ("CAST(sum(CAST(floor(CAST(sv[g.i] AS DOUBLE) "
                  "* 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) "
                  "/ 1000000.0 / count(*)")
    parts = [
        f"_tq_sub AS (SELECT {id_col}, CAST(g.s AS INTEGER) AS subspace, "
        f"{vec_col}[g.s * {sub} + 1 : (g.s + 1) * {sub}] AS sv "
        f"FROM {table}, "
        f"(SELECT unnest(generate_series(0, {m - 1})) AS s) g)",
        f"_tq_train AS (SELECT * FROM _tq_sub"
        + (f" WHERE {id_col} % ({sample_mod}) = 0)"
           if (isinstance(sample_mod, str) or sample_mod > 1) else ")"),
        f"_tq_c0 AS (SELECT subspace, CAST({id_col} AS INTEGER) AS code, "
        f"sv AS cv FROM _tq_sub WHERE {id_col} < {k})",
    ]
    for it in range(1, iters + 1):
        prev = f"_tq_c{it - 1}"
        d = sql_l2sq("a.sv", "c.cv", sub)
        parts.append(f"""_tq_a{it} AS (
  SELECT {id_col}, subspace, code, sv FROM (
    SELECT a.{id_col}, a.subspace, c.code, a.sv,
           row_number() OVER (PARTITION BY a.{id_col}, a.subspace
             ORDER BY CAST(floor(({d}) * 1000000.0 + 0.5) AS BIGINT)
               ASC, c.code ASC) AS rn
    FROM _tq_train a JOIN {prev} c ON c.subspace = a.subspace)
  WHERE rn = 1)""")
        parts.append(
            f"_tq_m{it} AS (SELECT subspace, code, "
            f"CAST(g.i AS INTEGER) AS dim, {micro_mean} AS val "
            f"FROM _tq_a{it}, "
            f"(SELECT unnest(generate_series(1, {sub})) AS i) g "
            f"GROUP BY 1, 2, 3)")
        parts.append(
            f"_tq_c{it} AS (SELECT subspace, code, "
            f"list(val ORDER BY dim) AS cv FROM _tq_m{it} GROUP BY 1, 2)")
    return (",\n".join(parts)
            + f",\n_tq_cb AS (SELECT subspace, code, cv AS cvec "
              f"FROM _tq_c{iters})")


def pq_adc_topk_trained(embeddings: DataFrame, query_ids: list[int],
                        dim: int, m: int = PQ_M, kcent: int = PQ_K,
                        iters: int = PQ_TRAIN_ITERS, k: int = 5,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """ADC search over TRAINED PQ codebooks: train per-subspace Lloyd
    codebooks, encode the corpus against them, precompute each query's
    m x kcent distance table, score by lookup — the full Jegou 2011
    index path rather than the sampled-codebook stand-in.

    The trained codebook is materialized to the driver once and
    re-created as a literal DataFrame: it is a CONSTANT-SIZE model
    (m*k rows, here 64 x 16 doubles — the broadcast-a-trained-model
    pattern, not a data collect); without it both the encoder join
    and the distance-table join would re-run the whole Lloyd lineage,
    re-scanning the corpus per consumer. Everything downstream is the
    same shape as ``pq_adc_topk``: codes + tables broadcast, scoring
    map-side, one (query, vector) combine shuffle.

    Training runs on the deterministic modulo sample targeting
    PQ_TRAIN_SAMPLE vectors (s = max(1, n // PQ_TRAIN_SAMPLE)): the
    codebook is a constant m*kcent rows, so at 100x the corpus the
    sample — not the corpus — bounds training cost. The one count()
    here is a column-pruned scan, the cheapest possible full pass."""
    sub = dim // m
    sample_mod = max(1, embeddings.count() // PQ_TRAIN_SAMPLE)
    cb_rows = _pq_train_local(
        embeddings, dim, m, kcent, iters, id_col, vec_col, sample_mod)
    spark = embeddings.sparkSession
    cb = spark.createDataFrame(
        cb_rows, "subspace int, code int, cvec array<double>")
    subs = _pq_subvectors(embeddings, dim, m, id_col, vec_col)
    # self-dots hoisted below the encode join (see l2sq_pre)
    scored0 = subs.withColumn(
        "_svv", dot(F.col("_sv"), F.col("_sv"))
    ).join(
        F.broadcast(cb.withColumnRenamed("subspace", "_cs")
                    .withColumn("_cvv", dot(F.col("cvec"),
                                            F.col("cvec")))),
        F.col("subspace") == F.col("_cs")).select(
        id_col, "subspace", "code",
        F.floor(l2sq_pre(F.col("_svv"),
                         dot(F.col("_sv"), F.col("cvec")),
                         F.col("_cvv")) * F.lit(1000000.0)
                + F.lit(0.5)).cast("long").alias("_dm"))
    codes = scored0.groupBy(id_col, "subspace").agg(
        F.min_by(F.struct(F.col("code"), F.col("_dm")),
                 F.struct(F.col("_dm").alias("_d"),
                          F.col("code").alias("_c"))).alias("_b")
    ).select(id_col, "subspace", F.col("_b.code").alias("code"))
    qsubs = _pq_subvectors(
        embeddings.filter(F.col(id_col).isin(query_ids)), dim, m,
        id_col, vec_col).select(
        F.col(id_col).alias("query_id"), "subspace",
        F.col("_sv").alias("_qsv"))
    dtab = qsubs.join(
        F.broadcast(cb.withColumnRenamed("subspace", "_cs")),
        F.col("subspace") == F.col("_cs")).select(
        "query_id", F.col("subspace").alias("_ts"),
        F.col("code").alias("_tcode"),
        F.floor(l2sq(F.col("_qsv"), F.col("cvec")) * F.lit(1000000.0)
                + F.lit(0.5)).cast("long").alias("_dm"))
    scored = (
        codes.join(F.broadcast(dtab),
                   (codes.subspace == dtab._ts)
                   & (codes.code == dtab._tcode))
        .filter(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", F.col(id_col).alias("neighbor_id"))
        .agg(F.sum("_dm").alias("adc_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_micro").asc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "adc_micro",
                    F.col("rank").cast("int").alias("rank")))


def sql_pq_adc_topk_trained(table: str, query_ids: list[int], dim: int,
                            m: int = PQ_M, kcent: int = PQ_K,
                            iters: int = PQ_TRAIN_ITERS, k: int = 5,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> str:
    """DuckDB twin of ``pq_adc_topk_trained``: trained codebook CTEs,
    then the same encode / distance-table / lookup-sum pipeline. The
    training-sample modulus is a scalar subquery (count(*) is known
    only at run time; entry oracles are static strings) computing the
    identical max(1, n // PQ_TRAIN_SAMPLE)."""
    sub = dim // m
    ids = ", ".join(str(i) for i in query_ids)
    denc = sql_l2sq("a.sv", "c.cvec", sub)
    dq = sql_l2sq("q.qsv", "c.cvec", sub)
    smod = (f"SELECT greatest(1, count(*) // {PQ_TRAIN_SAMPLE}) "
            f"FROM {table}")
    return f"""
    WITH {sql_pq_trained_codebooks(table, dim, m, kcent, iters,
                                   id_col, vec_col, sample_mod=smod)},
    _tadc_codes AS (
      SELECT {id_col}, subspace, code FROM (
        SELECT a.{id_col}, a.subspace, c.code,
               row_number() OVER (PARTITION BY a.{id_col}, a.subspace
                 ORDER BY CAST(floor(({denc}) * 1000000.0 + 0.5)
                   AS BIGINT) ASC, c.code ASC) AS rn
        FROM _tq_sub a JOIN _tq_cb c ON c.subspace = a.subspace)
      WHERE rn = 1),
    _tadc_q AS (
      SELECT {id_col} AS query_id, CAST(g.s AS INTEGER) AS subspace,
             {vec_col}[g.s * {sub} + 1 : (g.s + 1) * {sub}] AS qsv
      FROM {table},
           (SELECT unnest(generate_series(0, {m - 1})) AS s) g
      WHERE {id_col} IN ({ids})),
    _tadc_dtab AS (
      SELECT q.query_id, q.subspace, c.code,
             CAST(floor(({dq}) * 1000000.0 + 0.5) AS BIGINT) AS dm
      FROM _tadc_q q JOIN _tq_cb c ON c.subspace = q.subspace),
    _tadc_scored AS (
      SELECT t.query_id, x.{id_col} AS neighbor_id,
             CAST(sum(t.dm) AS BIGINT) AS adc_micro
      FROM _tadc_codes x
      JOIN _tadc_dtab t ON t.subspace = x.subspace AND t.code = x.code
      WHERE x.{id_col} <> t.query_id
      GROUP BY 1, 2)
    SELECT query_id, neighbor_id, adc_micro, CAST(rank AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY adc_micro ASC, neighbor_id ASC) AS rank
          FROM _tadc_scored)
    WHERE rank <= {k}
    """


# -- IVFADC: IVF + PQ over residuals (the composed billion-scale index) ------


def _residual(vec: Column, cvec: Column) -> Column:
    """Element-wise residual x - c in the DOUBLE domain. Each element
    is cast float->double BEFORE subtracting: float widening is exact
    and double subtraction is IEEE-identical in both engines, whereas
    a float-domain subtraction would round differently than DuckDB's
    (which promotes on its own schedule — the FLOAT*1e6 quantization
    trap, round 8)."""
    return F.zip_with(vec, cvec,
                      lambda a, b: a.cast("double") - b.cast("double"))


def _sql_residual(vec: str, cvec: str, dim: int) -> str:
    return (f"list_transform(generate_series(1, {dim}), "
            f"i -> CAST({vec}[i] AS DOUBLE) - CAST({cvec}[i] AS DOUBLE))")


def ivfpq_adc_topk(embeddings: DataFrame, query_ids: list[int], dim: int,
                   m: int = PQ_M, kcent: int = PQ_K,
                   n_centroids: int = IVF_N_CENTROIDS,
                   nprobe: int = IVF_NPROBE, k: int = 5,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """IVFADC (Jegou, Douze, Schmid, TPAMI 2011 §V): the COMPOSED
    index every billion-vector deployment actually runs — IVF coarse
    quantization prunes the corpus to nprobe inverted lists, and PQ
    codes encode each vector's RESIDUAL (x - coarse_centroid), so the
    fine quantizer spends its bits on the part the coarse one missed.
    Search: per probed centroid the query forms its own residual and
    an m x kcent ADC lookup table; candidates in that list are scored
    by m table lookups, never a vector read.

    Scale shape — the reason this composition wins at 100 TB: the
    centroid set and codebook are CONSTANT-size broadcasts; encoding
    shuffles ONE row per (vector, subspace); the per-query distance
    tables (|Q| * nprobe * m * kcent rows) broadcast so the
    corpus-sized code lists never shuffle; candidates are
    O(n * nprobe / n_centroids) instead of O(n); the final combine is
    a partial-aggregated groupBy(query, neighbor).

    Determinism contract (whole kmeans/IVF/PQ family): coarse
    centroids = first-n_centroids vectors, residual codebook = first
    kcent vectors' residual subvectors (completeness enforced by the
    shared _codebook_count_guard), every distance micro-quantized
    floor(d*1e6+0.5) in int64, all ties to the lower id. L2 end to
    end (ADC approximates L2; mixing the cosine coarse metric of
    ivf_ann_topk would make the probe ranking incoherent with the
    lookup scores).

    Returns (query_id, neighbor_id, adc_micro, rank)."""
    sub = dim // m
    cents = embeddings.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).cast("int").alias("centroid_id"),
        F.col(vec_col).alias("_cvec"))
    # coarse assign: argmin micro-L2, tie -> lowest centroid id
    # (self-dots hoisted below the n x n_centroids join — see l2sq_pre)
    cscored = embeddings.select(
        id_col, vec_col,
        dot(F.col(vec_col), F.col(vec_col)).alias("_vv")
    ).crossJoin(F.broadcast(cents.withColumn(
        "_ccd", dot(F.col("_cvec"), F.col("_cvec"))))).select(
        id_col, vec_col, "centroid_id", "_cvec",
        F.floor(l2sq_pre(F.col("_vv"),
                         dot(F.col(vec_col), F.col("_cvec")),
                         F.col("_ccd")) * F.lit(1000000.0)
                + F.lit(0.5)).cast("long").alias("_cd"))
    assigned = cscored.groupBy(id_col).agg(
        F.min_by(
            F.struct(F.col("centroid_id"), F.col(vec_col).alias("_v"),
                     F.col("_cvec")),
            F.struct(F.col("_cd"), F.col("centroid_id").alias("_c")),
        ).alias("_b")
    ).select(id_col, F.col("_b.centroid_id").alias("centroid_id"),
             _residual(F.col("_b._v"), F.col("_b._cvec")).alias("_r"))
    rsubs = assigned.select(
        id_col, "centroid_id",
        F.explode(F.array(*[
            F.struct(F.lit(j).cast("int").alias("subspace"),
                     F.slice(F.col("_r"), j * sub + 1, sub).alias("_sv"))
            for j in range(m)])).alias("_e")
    ).select(id_col, "centroid_id",
             F.col("_e.subspace").alias("subspace"),
             F.col("_e._sv").alias("_sv"))
    cb = rsubs.filter(F.col(id_col) < kcent).select(
        F.col("subspace").alias("_cs"),
        F.col(id_col).cast("int").alias("_code"),
        F.col("_sv").alias("_cv"))
    ncent, cguard = _codebook_count_guard(cb, m, kcent, "ivfpq_adc_topk")
    # residual-encode self-dots hoisted below the k-way join
    enc = rsubs.withColumn(
        "_svv", dot(F.col("_sv"), F.col("_sv"))
    ).join(F.broadcast(cb.withColumn(
        "_cvv", dot(F.col("_cv"), F.col("_cv")))),
        F.col("subspace") == F.col("_cs")).crossJoin(
        F.broadcast(ncent)).select(
        id_col, "centroid_id", "subspace", "_code",
        (F.floor(l2sq_pre(F.col("_svv"),
                          dot(F.col("_sv"), F.col("_cv")),
                          F.col("_cvv")) * F.lit(1000000.0)
                 + F.lit(0.5)).cast("long") + cguard).alias("_dm"))
    codes = enc.groupBy(id_col, "centroid_id", "subspace").agg(
        F.min_by(F.col("_code"),
                 F.struct(F.col("_dm"), F.col("_code").alias("_c")))
        .alias("code"))
    # query side: probe nprobe nearest centroids, residual per probe
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    pscored = q.crossJoin(F.broadcast(cents)).select(
        "query_id", "_qv", "centroid_id", "_cvec",
        F.floor(l2sq(F.col("_qv"), F.col("_cvec")) * F.lit(1000000.0)
                + F.lit(0.5)).cast("long").alias("_pd"))
    wp = Window.partitionBy("query_id").orderBy(
        F.col("_pd").asc(), F.col("centroid_id").asc())
    probes = (pscored.withColumn("_rn", F.row_number().over(wp))
              .filter(F.col("_rn") <= nprobe)
              .select("query_id", "centroid_id",
                      _residual(F.col("_qv"), F.col("_cvec")).alias("_qr")))
    qsubs = probes.select(
        "query_id", "centroid_id",
        F.explode(F.array(*[
            F.struct(F.lit(j).cast("int").alias("subspace"),
                     F.slice(F.col("_qr"), j * sub + 1, sub).alias("_qsv"))
            for j in range(m)])).alias("_e")
    ).select("query_id", F.col("centroid_id").alias("_tc"),
             F.col("_e.subspace").alias("_ts"),
             F.col("_e._qsv").alias("_qsv"))
    dtab = qsubs.join(F.broadcast(cb),
                      F.col("_ts") == F.col("_cs")).select(
        "query_id", "_tc", "_ts",
        F.col("_code").alias("_tcode"),
        F.floor(l2sq(F.col("_qsv"), F.col("_cv")) * F.lit(1000000.0)
                + F.lit(0.5)).cast("long").alias("_tdm"))
    scored = (codes.join(F.broadcast(dtab),
                         (F.col("centroid_id") == F.col("_tc"))
                         & (F.col("subspace") == F.col("_ts"))
                         & (F.col("code") == F.col("_tcode")))
              .filter(F.col(id_col) != F.col("query_id"))
              .groupBy("query_id", F.col(id_col).alias("neighbor_id"))
              .agg(F.sum("_tdm").alias("adc_micro")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_micro").asc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "adc_micro",
                    F.col("rank").cast("int").alias("rank")))


def sql_ivfpq_adc_topk(table: str, query_ids: list[int], dim: int,
                       m: int = PQ_M, kcent: int = PQ_K,
                       n_centroids: int = IVF_N_CENTROIDS,
                       nprobe: int = IVF_NPROBE, k: int = 5,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> str:
    """DuckDB twin of ``ivfpq_adc_topk``: identical coarse argmin,
    residuals, codebook, encoding, probe ranking, lookup sums, ties."""
    sub = dim // m
    ids = ", ".join(str(i) for i in query_ids)
    dc = sql_l2sq(f"e.{vec_col}", "c._cvec", dim)
    denc = sql_l2sq("a.sv", "b.cv", sub)
    dq = sql_l2sq("q.qsv", "b.cv", sub)
    return f"""
    WITH _ipq_cents AS (
      SELECT CAST({id_col} AS INTEGER) AS centroid_id,
             {vec_col} AS _cvec
      FROM {table} WHERE {id_col} < {n_centroids}),
    _ipq_assign AS (
      SELECT vec_id, centroid_id,
             {_sql_residual('_v', '_cvec', dim)} AS _r
      FROM (
        SELECT e.{id_col} AS vec_id, c.centroid_id,
               e.{vec_col} AS _v, c._cvec,
               row_number() OVER (PARTITION BY e.{id_col}
                 ORDER BY CAST(floor(({dc}) * 1000000.0 + 0.5) AS BIGINT)
                   ASC, c.centroid_id ASC) AS rn
        FROM {table} e CROSS JOIN _ipq_cents c) WHERE rn = 1),
    _ipq_rsub AS (
      SELECT vec_id, centroid_id, CAST(g.s AS INTEGER) AS subspace,
             _r[g.s * {sub} + 1 : (g.s + 1) * {sub}] AS sv
      FROM _ipq_assign,
           (SELECT unnest(generate_series(0, {m - 1})) AS s) g),
    _ipq_cb AS (
      SELECT subspace, CAST(vec_id AS INTEGER) AS code, sv AS cv
      FROM _ipq_rsub WHERE vec_id < {kcent}),
    _ipq_codes AS (
      SELECT vec_id, centroid_id, subspace, code FROM (
        SELECT a.vec_id, a.centroid_id, a.subspace, b.code,
               row_number() OVER (PARTITION BY a.vec_id, a.subspace
                 ORDER BY CAST(floor(({denc}) * 1000000.0 + 0.5)
                   AS BIGINT) ASC, b.code ASC) AS rn
        FROM _ipq_rsub a JOIN _ipq_cb b ON b.subspace = a.subspace)
      WHERE rn = 1),
    _ipq_probes AS (
      SELECT query_id, centroid_id,
             {_sql_residual('_qv', '_cvec', dim)} AS _qr
      FROM (
        SELECT e.{id_col} AS query_id, c.centroid_id,
               e.{vec_col} AS _qv, c._cvec,
               row_number() OVER (PARTITION BY e.{id_col}
                 ORDER BY CAST(floor(({sql_l2sq(f'e.{vec_col}', 'c._cvec',
                                                dim)}) * 1000000.0 + 0.5)
                   AS BIGINT) ASC, c.centroid_id ASC) AS rn
        FROM {table} e CROSS JOIN _ipq_cents c
        WHERE e.{id_col} IN ({ids})) WHERE rn <= {nprobe}),
    _ipq_qsub AS (
      SELECT query_id, centroid_id, CAST(g.s AS INTEGER) AS subspace,
             _qr[g.s * {sub} + 1 : (g.s + 1) * {sub}] AS qsv
      FROM _ipq_probes,
           (SELECT unnest(generate_series(0, {m - 1})) AS s) g),
    _ipq_dtab AS (
      SELECT q.query_id, q.centroid_id, q.subspace, b.code,
             CAST(floor(({dq}) * 1000000.0 + 0.5) AS BIGINT) AS dm
      FROM _ipq_qsub q JOIN _ipq_cb b ON b.subspace = q.subspace),
    _ipq_scored AS (
      SELECT t.query_id, x.vec_id AS neighbor_id,
             CAST(sum(t.dm) AS BIGINT) AS adc_micro
      FROM _ipq_codes x
      JOIN _ipq_dtab t ON t.centroid_id = x.centroid_id
        AND t.subspace = x.subspace AND t.code = x.code
      WHERE x.vec_id <> t.query_id
      GROUP BY 1, 2)
    SELECT query_id, neighbor_id, adc_micro, CAST(rank AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY adc_micro ASC, neighbor_id ASC) AS rank
          FROM _ipq_scored)
    WHERE rank <= {k}
    """
