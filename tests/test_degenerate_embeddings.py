"""Degenerate-embeddings cross-engine sweep: every registry entry whose
oracle reads ONLY the embeddings table runs against a pathological
vector corpus — the ZERO VECTOR (undefined cosine: the div-by-zero
candidate under ANSI mode), near-zero vectors, duplicate vectors,
NULL labels — in BOTH engines under the driver's canonicalization.

Contract boundary: vec_id is NOT NULL/unique; embedding is NOT NULL
with the declared dimension (a ragged or NULL vector is an ingest
reject — the loaders declare fixed-width float arrays); label is
nullable. dim here is 64 to match the entries' _EMB_DIM.
"""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pytest

from mktd6_flink_spark.plans import driver_queries as dq

DIM = 64


def _vec(seed):
    # deterministic pseudo-vectors without RNG state
    return [math.sin(0.1 * seed * (i + 1)) for i in range(DIM)]


ROWS = (
    [(0, [0.0] * DIM, 0)]                      # the zero vector
    + [(1, [1e-30] * DIM, 1)]                  # denormal-adjacent
    + [(i, _vec(i), i % 3) for i in range(2, 18)]
    + [(18, _vec(5), None)]                    # duplicate of vec 5, NULL label
    + [(19, [-x for x in _vec(7)], 2)]         # antipode of vec 7
)


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def _embeddings_only_entries():
    names = []
    for name, sql in dq.ORACLES.items():
        low = sql.lower()
        if "embeddings" not in low:
            continue
        if any(t in low for t in (
                "documents", "events", "lineitem", "orders", "customer",
                "supplier", "nation", "region")):
            continue
        if name.startswith("streaming_"):
            continue
        names.append(name)
    return names


@pytest.fixture(scope="module")
def degenerate_emb_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("degen_emb")
    table = pa.table({
        "vec_id": pa.array([r[0] for r in ROWS], pa.int64()),
        "embedding": pa.array([r[1] for r in ROWS],
                              pa.list_(pa.float32())),
        "label": pa.array([r[2] for r in ROWS], pa.int32()),
    })
    pq.write_table(table, str(d / "embeddings.parquet"))
    return str(d)


@pytest.mark.parametrize("name", _embeddings_only_entries())
def test_degenerate_embeddings_cross_engine(spark, degenerate_emb_dir,
                                            name):
    got_df = dq.QUERIES[name](spark, degenerate_emb_dir)
    got = _canon([tuple(r) for r in got_df.collect()], got_df.columns)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"'{os.path.join(degenerate_emb_dir, 'embeddings.parquet')}'")
    cur = con.execute(dq.ORACLES[name])
    cols = [c[0] for c in cur.description]
    want = _canon(cur.fetchall(), cols)
    assert got_df.columns and sorted(got_df.columns) == sorted(cols), (
        name, got_df.columns, cols)
    assert got == want, (name, got[:4], want[:4])
