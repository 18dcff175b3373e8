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


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def sql_cosine(a: str, b: str, dim: int) -> str:
    return (
        f"({sql_dot(a, b, dim)}) / "
        f"(sqrt({sql_dot(a, a, dim)}) * sqrt({sql_dot(b, b, dim)}))"
    )


def cosine_topk(embeddings: DataFrame, query_ids: list[int], k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force exact cosine top-k: for each query id, the k nearest
    OTHER vectors. The query side (|Q| rows) is broadcast, so the corpus
    scan never shuffles — at 100 TB this is one pass over the corpus plus a
    cheap per-partition top-k via the rank window on (query, score)."""
    q = F.broadcast(
        embeddings.filter(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
        )
    )
    c = embeddings.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("_cv"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            round_portable(cosine(F.col("_qv"), F.col("_cv"))).alias("cosine"),
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
    with_sig = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        lsh_signature(F.col(vec_col), dim, bits).alias("_bucket"),
    )
    q = F.broadcast(
        with_sig.filter(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
            F.col("_bucket").alias("_qb"),
        )
    )
    scored = (
        q.join(with_sig, F.col("_qb") == F.col("_bucket"))
        .filter(F.col("query_id") != F.col(id_col))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            round_portable(cosine(F.col("_qv"), F.col(vec_col))).alias("cosine"),
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


# -- IVF (inverted-file) ANN --------------------------------------------------

IVF_N_CENTROIDS = 32    # CONSTANT centroid count — does not grow with corpus
IVF_NPROBE = 2


def ivf_centroids(embeddings: DataFrame, n_centroids: int = IVF_N_CENTROIDS,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Deterministic first-K "training" sample (vec_id < K) — a stand-in
    for sampled k-means that both engines and every executor reproduce
    without shared state. K is a CONSTANT, so the centroid set stays
    broadcast-sized no matter how large the corpus grows (the round-2
    vec_id % 50 == 0 scheme made centroid count — and the assignment
    cross join — grow linearly with n)."""
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
    cents = F.broadcast(
        ivf_centroids(embeddings, n_centroids, id_col, vec_col))
    scored = embeddings.crossJoin(cents).select(
        id_col, vec_col, "centroid_id",
        round_portable(cosine(F.col(vec_col), F.col("_cvec")))
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
    assigned = ivf_assign(embeddings, dim, n_centroids, id_col, vec_col)
    cents = F.broadcast(
        ivf_centroids(embeddings, n_centroids, id_col, vec_col))
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    probe_scored = q.crossJoin(cents).select(
        "query_id", "_qv", "centroid_id",
        round_portable(cosine(F.col("_qv"), F.col("_cvec"))).alias("_pcos"),
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("_pcos").desc(), F.col("centroid_id").asc())
    probes = (
        probe_scored.withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "_qv", "centroid_id")
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
        round_portable(cosine(F.col("_qv"), F.col(vec_col))).alias("cosine"),
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
