"""Input-shape contract tests for the shared events loaders.

The driver's testdata has shipped the ``ts`` column with two different
on-disk parquet encodings across rounds:

* TIMESTAMP(NANOS) — Spark's vectorized reader rejects it, so with
  ``spark.sql.legacy.parquet.nanosAsLong`` it surfaces as raw int64 nanos;
* plain ``timestamp[us]`` — read as TIMESTAMP_NTZ.

Round 5 regressed (23/50 driver queries ERR, 2 silently wrong) because
both ``load()`` and ``_events_stream`` assumed the nanos encoding while
the test suite only ever synthesized its own data.  These tests pin the
contract: BOTH loaders must yield identical session-UTC timestamps from
EITHER encoding, and the enriched event-time span must be physically
plausible (a unit error compresses or inflates it by 1000×, which a span
assert catches in one line).
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest

from mktd6_flink_spark.plans import driver_queries as dq

REAL_SF = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(REAL_SF),
    reason="driver testdata not present on this machine")

# One hour of synthetic events: 120 rows spaced 30 s apart from a fixed
# epoch. Span = 3570 s — far above any 1000×-compressed span (3.57 s)
# and far below any 1000×-inflated one (~41 days).
BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds
ROWS = [(i, BASE_US + i * 30_000_000, i % 7,
         ["click", "view", "signup", "purchase", "error"][i % 5],
         float(i), "{}")
        for i in range(120)]
EXPECTED_SPAN_S = (ROWS[-1][1] - ROWS[0][1]) / 1_000_000


def _write_events(path: str, ts_unit: str) -> None:
    """Write the fixture with ``ts`` as timestamp[us]/timestamp[ns], or as
    a RAW int64 epoch in µs or ns (the not-yet-shipped-but-one-drift-away
    encodings the magnitude guard covers)."""
    if ts_unit in ("us", "ns"):
        ts_arr = pa.array([r[1] * (1000 if ts_unit == "ns" else 1)
                           for r in ROWS],
                          pa.timestamp(ts_unit))
    else:  # "int64_us" | "int64_ns"
        mult = 1000 if ts_unit == "int64_ns" else 1
        ts_arr = pa.array([r[1] * mult for r in ROWS], pa.int64())
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
        "ts": ts_arr,
        "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
        "event_type": pa.array([r[3] for r in ROWS], pa.string()),
        "value": pa.array([r[4] for r in ROWS], pa.float64()),
        "props": pa.array([r[5] for r in ROWS], pa.string()),
    })
    pq.write_table(tbl, path)


def _span_and_first(df):
    row = df.agg(
        (F.max("ts").cast("double") - F.min("ts").cast("double"))
        .alias("span"),
        F.min(F.unix_micros("ts")).alias("first_us")).collect()[0]
    return row["span"], row["first_us"]


@pytest.mark.parametrize("ts_unit", ["us", "ns", "int64_us", "int64_ns"])
def test_batch_load_normalizes_ts(spark, tmp_path, ts_unit):
    _write_events(str(tmp_path / "events.parquet"), ts_unit)
    df = dq.load(spark, str(tmp_path), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    span, first_us = _span_and_first(df)
    assert span == EXPECTED_SPAN_S
    assert first_us == BASE_US  # wall-clock identical to the naive value


@pytest.mark.parametrize("ts_unit", ["us", "ns", "int64_us", "int64_ns"])
def test_events_stream_normalizes_ts(spark, tmp_path, ts_unit):
    _write_events(str(tmp_path / "events.parquet"), ts_unit)
    stream = dq._events_stream(spark, str(tmp_path))
    assert dict(stream.dtypes)["ts"] == "timestamp"
    sunk = dq._run_stream_to_table(spark, stream, "loader_contract")
    assert sunk.count() == len(ROWS)
    span, first_us = _span_and_first(sunk)
    assert span == EXPECTED_SPAN_S
    assert first_us == BASE_US


@needs_testdata
def test_real_testdata_span_plausible(spark):
    """Against the REAL driver testdata: the enriched span must exceed an
    hour (the synthetic clock covers weeks) — the assert that would have
    caught both round-5 failure modes before the driver did."""
    span, _ = _span_and_first(dq.events_enriched(spark, REAL_SF))
    assert span > 3600, f"events ts span {span}s — unit error in loader?"


def test_events_stream_reprobes_on_regenerated_file(spark, tmp_path):
    """If the parquet at the SAME path is regenerated with a different ts
    encoding under a live session, the stream-schema memo must invalidate
    (keyed on mtime) rather than read raw values through a stale schema."""
    path = str(tmp_path / "events.parquet")
    _write_events(path, "ns")
    first = dq._run_stream_to_table(
        spark, dq._events_stream(spark, str(tmp_path)), "reprobe_a")
    assert _span_and_first(first) == (EXPECTED_SPAN_S, BASE_US)

    os.remove(path)
    _write_events(path, "us")
    # the memo key is (st_mtime_ns, st_size): a sub-second rewrite is
    # detected without help; nudge by 1 ms only for filesystems with
    # whole-second timestamps (the old float-seconds key needed +5 s)
    ns = os.stat(path).st_mtime_ns + 1_000_000
    os.utime(path, ns=(ns, ns))
    second = dq._run_stream_to_table(
        spark, dq._events_stream(spark, str(tmp_path)), "reprobe_b")
    assert _span_and_first(second) == (EXPECTED_SPAN_S, BASE_US)


def test_int64_ts_mixed_magnitudes_raise(spark, tmp_path):
    """A raw-int64 ts file whose values straddle the 1e17 ns/µs threshold
    has no single epoch unit; the loader must refuse (ValueError) rather
    than interpret different rows with different units (ADVICE r7: the
    old per-row magnitude guard did exactly that, silently)."""
    path = str(tmp_path / "events.parquet")
    tbl = pa.table({
        "event_id": pa.array([0, 1], pa.int64()),
        # row 0 plausible-µs (2024), row 1 plausible-ns (2024)
        "ts": pa.array([BASE_US, BASE_US * 1000], pa.int64()),
        "user_id": pa.array([0, 1], pa.int64()),
        "event_type": pa.array(["click", "view"]),
        "value": pa.array([0.0, 1.0], pa.float64()),
        "props": pa.array(["{}", "{}"]),
    })
    pq.write_table(tbl, path)
    with pytest.raises(ValueError, match="straddle"):
        dq.load(spark, str(tmp_path), "events")


def test_int64_ts_unit_decided_per_file_not_per_row(spark, tmp_path):
    """Pre-1973 within an all-ns file is out of scope (documented floor),
    but the complement must hold: an all-µs int64 file with POST-5138
    garbage would be ns — what matters is that each file gets exactly one
    interpretation, derived from footer stats, not row values."""
    path = str(tmp_path / "events.parquet")
    _write_events(path, "int64_us")
    assert dq._probe_int64_ts_unit(path) == "us"
    os.remove(path)
    _write_events(path, "int64_ns")
    assert dq._probe_int64_ts_unit(path) == "ns"


# ---------------------------------------------------------------------------
# Schema contracts for every driver-regenerated table (round-6 verdict #3:
# the events table was the only one pinned; documents/embeddings/TPC-H
# would hit the same silent-drift class). A column the engine consumes
# disappearing or changing to an incompatible type must fail pytest, not
# the driver gate.
# ---------------------------------------------------------------------------

# column -> acceptable Spark dtypes (the types our queries' expressions
# are written against; wider-but-compatible ints are accepted)
_INT = {"int", "bigint", "smallint"}
_FLOAT = {"double", "float"}
_TS = {"timestamp", "timestamp_ntz", "date"}
TABLE_CONTRACTS = {
    "region": {"r_regionkey": _INT, "r_name": {"string"}},
    "nation": {"n_nationkey": _INT, "n_name": {"string"},
               "n_regionkey": _INT},
    "customer": {"c_custkey": _INT, "c_name": {"string"},
                 "c_nationkey": _INT, "c_acctbal": _FLOAT,
                 "c_mktsegment": {"string"}},
    "supplier": {"s_suppkey": _INT, "s_name": {"string"},
                 "s_nationkey": _INT, "s_acctbal": _FLOAT},
    "part": {"p_partkey": _INT, "p_name": {"string"}, "p_brand": {"string"},
             "p_type": {"string"}, "p_size": _INT,
             "p_retailprice": _FLOAT},
    "orders": {"o_orderkey": _INT, "o_custkey": _INT,
               "o_orderstatus": {"string"}, "o_totalprice": _FLOAT,
               "o_orderdate": _TS, "o_orderpriority": {"string"}},
    "lineitem": {"l_orderkey": _INT, "l_partkey": _INT, "l_suppkey": _INT,
                 "l_linenumber": _INT, "l_quantity": _FLOAT,
                 "l_extendedprice": _FLOAT, "l_discount": _FLOAT,
                 "l_tax": _FLOAT, "l_returnflag": {"string"},
                 "l_linestatus": {"string"}, "l_shipdate": _TS},
    "events": {"event_id": _INT, "ts": {"timestamp"}, "user_id": _INT,
               "event_type": {"string"}, "value": _FLOAT,
               "props": {"string"}},
    "documents": {"doc_id": _INT, "text": {"string"}, "lang": {"string"},
                  "source": {"string"}, "n_chars": _INT},
    "embeddings": {"vec_id": _INT, "embedding": {"array<float>",
                                                 "array<double>"},
                   "label": _INT},
}


@needs_testdata
@pytest.mark.parametrize("table", sorted(TABLE_CONTRACTS))
def test_real_testdata_schema_contract(spark, table):
    df = dq.load(spark, REAL_SF, table)
    dtypes = dict(df.dtypes)
    for col, accepted in TABLE_CONTRACTS[table].items():
        assert col in dtypes, f"{table}.{col} missing — testdata drift"
        assert dtypes[col] in accepted, (
            f"{table}.{col} is {dtypes[col]}, engine expects one of "
            f"{sorted(accepted)} — adapt the loader before the gate runs")


@needs_testdata
def test_real_documents_embeddings_shape_plausible(spark):
    """Value-level sanity for the two LLM-pipeline tables: n_chars must
    agree with the text length it claims to describe (text oracles key on
    it), and embeddings must be fixed-dimension non-null vectors (every
    ANN operator assumes a rectangular embedding matrix)."""
    docs = dq.load(spark, REAL_SF, "documents")
    bad = docs.filter(
        F.col("text").isNull()
        | (F.col("n_chars") != F.length("text"))).count()
    assert bad == 0, f"{bad} documents rows with n_chars != length(text)"

    emb = dq.load(spark, REAL_SF, "embeddings")
    row = emb.agg(
        F.min(F.size("embedding")).alias("dmin"),
        F.max(F.size("embedding")).alias("dmax"),
        F.sum(F.col("embedding").isNull().cast("int")).alias("nulls"),
    ).collect()[0]
    assert row.nulls == 0
    assert row.dmin == row.dmax > 0, (
        f"ragged embedding dims [{row.dmin}, {row.dmax}]")
