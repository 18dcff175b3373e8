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
    # The audit reads the STATIC physical plan; under AQE every explain
    # is wrapped in AdaptiveSparkPlan, which carries NO WholeStageCodegen
    # annotations until runtime — the codegen counter silently read 0 for
    # every entry. Join/exchange/pushdown decisions in the initial plan
    # are identical either way (AQE only upgrades them at runtime), so
    # the audit disables AQE to make codegen spans visible again.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
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
        wsc = len(set(re.findall(r"\[codegen id : (\d+)\]", plan)))
        single = plan.count("SinglePartition")
        rowudf = plan.count("BatchEvalPython")
        arrow = plan.count("ArrowEvalPython") + plan.count("FlatMapGroupsInPandas") + plan.count("MapInPandas")
        # hashpartitioning where EVERY partition expression is a literal
        # (or a column the plan defines as a literal projection) is an
        # EFFECTIVE single partition the SinglePartition counter can't
        # see — every row hashes to the same value: the constant-key
        # "FOO" trap. Mixed keys like (_k, _pid) spread fine and are
        # not flagged. The token right before AS must be the WHOLE
        # expression: "CASE WHEN ... END AS src#1L" previously matched
        # with group(1)="END" (no '#'), misclassifying every
        # CASE-projection alias as a literal and false-flagging
        # genuinely keyed exchanges (caught on graph_triangles'
        # degree-orientation CASE keys, round 10).
        lit_ids = {
            m.group(2)
            for m in re.finditer(r"(?<![\w#.(])([\w.\"]+) AS (\w+#\d+L?)",
                                 plan)
            if "#" not in m.group(1) and m.group(1) != "END"
        }

        def _split_top(s):
            parts, depth, cur = [], 0, []
            for ch in s:
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                if ch == "," and depth == 0:
                    parts.append("".join(cur).strip())
                    cur = []
                else:
                    cur.append(ch)
            if cur:
                parts.append("".join(cur).strip())
            return parts

        def _paren_span(s, start):
            """s[start] == '('; contents up to the BALANCED close — a
            greedy regex would run to the last ')' on the line and
            swallow trailing text like ', ENSURE_REQUIREMENTS,
            [plan_id=123]' as extra (all-literal-looking) args."""
            depth = 0
            for i in range(start, len(s)):
                if s[i] == "(":
                    depth += 1
                elif s[i] == ")":
                    depth -= 1
                    if depth == 0:
                        return s[start + 1:i]
            return s[start + 1:]

        const_hash = 0
        for m in re.finditer(r"hashpartitioning\(", plan):
            args = _split_top(_paren_span(plan, m.end() - 1))
            if args and re.fullmatch(r"\d+", args[-1]):
                args = args[:-1]   # trailing numPartitions
            if args and all(
                    "#" not in a or a in lit_ids or
                    all(ref in lit_ids
                        for ref in re.findall(r"\w+#\d+L?", a))
                    for a in args):
                const_hash += 1
        flags = []
        if rowudf:
            flags.append("ROW-UDF!")
        if single:
            flags.append(f"single-part x{single}")
        if const_hash:
            flags.append(f"CONST-KEY-HASH x{const_hash}")
        if smj and not bhj:
            flags.append("SMJ-only")
        print(f"{name:28s} pushed={pushed} bhj={bhj} smj={smj} "
              f"codegen={wsc} arrow={arrow} {' '.join(flags)}")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
