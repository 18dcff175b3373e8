#!/usr/bin/env python
"""Isolated per-query timing + plan capture (optimization rounds).

Times each named query with the noop sink (guide §1.4) using the same
methodology as bench.py (fn(spark, sf_dir) -> noop write, then the
bench's deterministic cleanup), and optionally dumps the
``explain("formatted")`` output to a plans directory.

Usage:
    python tools/measure.py QUERY [QUERY ...] [--reps N] \
        [--plan-dir plans/r17] [--suffix _before]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Prints one JSON line per query: {"query": name, "reps": [...], "min": m}.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--suffix", default="")
    args = ap.parse_args()

    from mktd6_flink_spark.operators import cache
    from mktd6_flink_spark.plans import driver_queries as dq
    from mktd6_flink_spark.session import get_spark

    import bench

    spark = get_spark("measure")
    spark.sparkContext.setLogLevel("ERROR")

    # identical warmup to bench.py so first-rep numbers are comparable
    from pyspark.sql import functions as F
    (spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
     .filter(F.col("l_quantity") > 0)
     .groupBy("l_returnflag").agg(F.sum("l_quantity"))
     .write.format("noop").mode("overwrite").save())
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    bench.streaming_floor(spark, SF_DIR).count()
    for tbl in spark.catalog.listTables():
        if tbl.isTemporary:
            spark.catalog.dropTempView(tbl.name)
    spark.streams.resetTerminated()

    def _cleanup():
        cache.release_twophase_caches()
        for tbl in spark.catalog.listTables():
            if tbl.isTemporary:
                spark.catalog.dropTempView(tbl.name)
        spark.streams.resetTerminated()

    for name in args.queries:
        fn = (bench.streaming_floor if name == "streaming_floor"
              else dq.QUERIES[name])
        spark.sparkContext.setJobDescription(f"measure:{name}")
        reps = []
        for i in range(args.reps):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            reps.append(round(time.perf_counter() - t0, 3))
            if args.plan_dir and i == 0:
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                os.makedirs(args.plan_dir, exist_ok=True)
                out = os.path.join(args.plan_dir,
                                   f"{name}{args.suffix}.txt")
                with open(out, "w") as fh:
                    fh.write(buf.getvalue())
            _cleanup()
        print(json.dumps({"query": name, "reps": reps,
                          "min": min(reps)}), flush=True)
        spark.sparkContext.setJobDescription(None)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
