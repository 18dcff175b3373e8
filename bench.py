#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query materializes fully via the no-op sink (format("noop")) so we
measure scan → compute → shuffle without driver-collect overhead.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headliners: the scan/agg/join TPC-H set, the reference's core stateful
# fold, window + running-sum operators, and the LLM-pipeline big hitters.
HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q6",
    "tpch_q5ish",
    "st6_trader_ledger",
    "asof_join_price",
    "st1_ema",
    "w2_tumbling_sum",
    "w3_running_sum",
    "dataflow_hype_influence",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "sim_cosine_topk",
    "sim_ivf_ann",
    "text_quality",
    "text_fingerprint",
    "pipeline_curation",
    "streaming_st1_ema",
    "tpch_q18ish",
    # per-event engine regression sentinels: the applyInPandas batch fold
    # and its live applyInPandasWithState twin over the same ledger
    "st6_per_event_ledger",
    "streaming_st6_ledger",
    # round-3 heads: the composed settlement DAG and the global-prefix-sum
    # packing (both ride the two-phase range-partition plans)
    "dataflow_market_ledger",
    "pipeline_sequence_packing",
]


def sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.removeprefix("sf"))
    except ValueError:
        return -1.0


def main() -> int:
    from mktd6_flink_spark.plans import driver_queries as dq
    from mktd6_flink_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM with a real scan -> filter -> agg -> shuffle -> noop
    # pipeline so JIT/codegen/shuffle-machinery warmup stays out of the
    # first timed query (a bare count() only touches footers/stats).
    from pyspark.sql import functions as F
    (spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
     .filter(F.col("l_quantity") > 0)
     .groupBy("l_returnflag").agg(F.sum("l_quantity"))
     .write.format("noop").mode("overwrite").save())
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = dq.QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_from_dir(SF_DIR),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
