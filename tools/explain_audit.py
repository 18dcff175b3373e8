#!/usr/bin/env python
"""Plan audit: print physical-plan health for every registered query —
pushed filters reaching the parquet scan, broadcast vs sort-merge joins,
whole-stage-codegen spans, and single-partition exchanges (the 100 TB
red flag). Usage: python tools/explain_audit.py [query ...]"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main(selected):
    from mktd6_flink_spark.plans import driver_queries as dq
    from mktd6_flink_spark.session import get_spark

    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    names = selected or list(dq.QUERIES)
    for name in names:
        import contextlib, io
        df = dq.QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
        bhj = plan.count("BroadcastHashJoin")
        smj = plan.count("SortMergeJoin")
        wsc = len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan)))
        single = plan.count("SinglePartition")
        rowudf = plan.count("BatchEvalPython")
        arrow = plan.count("ArrowEvalPython") + plan.count("FlatMapGroupsInPandas") + plan.count("MapInPandas")
        flags = []
        if rowudf:
            flags.append("ROW-UDF!")
        if single:
            flags.append(f"single-part x{single}")
        if smj and not bhj:
            flags.append("SMJ-only")
        print(f"{name:28s} pushed={pushed} bhj={bhj} smj={smj} "
              f"codegen={wsc} arrow={arrow} {' '.join(flags)}")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
