#!/usr/bin/env python
"""Persist/reuse audit: flag entries whose OPTIMIZED plan contains the
same non-trivial subtree N+ times with no persist boundary — the
"recomputed subframe" class found by hand on graph_adamic_adar in
round 11 (its edge set fed four consumers and was re-derived from
lineitem each time). Catalyst does not de-duplicate logical subtrees;
each consumer re-executes the whole ancestry, so a repeated
join/aggregate subtree multiplies real work at 100 TB.

Method: walk the optimized LogicalPlan; fingerprint every subtree by
its CANONICALIZED hashCode (alias/exprId-insensitive, the engine's own
sameResult basis); do not descend into InMemoryRelation (a persisted
subtree is computed once — repeats below it are free). A fingerprint
seen >= FLAG_REPEATS times with subtree size >= FLAG_SIZE nodes is
flagged.

This is a REVIEW signal, not a hard gate: some repeats are intended —
self-joins (adjacency x adjacency, gram x gram) repeat their input by
construction and are cheap to recompute when the input is a pruned
scan; the audit prints size*count so a reviewer can rank. Entries
whose repeated subtree already sits under InMemoryRelation (the
maybe_persist'ed ones) come out clean, which is the point.

Usage: python tools/persist_audit.py [entry ...]    (default: all
batch entries; streaming_* are skipped — invoking them executes the
stream, and their returned frame is a memory-sink scan, not the
interesting plan).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
FLAG_REPEATS = 3
FLAG_SIZE = 5


def _audit_plan(root) -> list[tuple[int, int, str]]:
    """Walk a LogicalPlan (py4j handle); return flagged
    (count, size, class_name) tuples, largest first."""
    seen: dict[int, list] = {}

    def walk(node) -> int:
        cls = node.getClass().getSimpleName()
        if cls == "InMemoryRelation":
            return 1  # persisted boundary: computed once, stop here
        size = 1
        ch = node.children()
        for i in range(ch.size()):
            size += walk(ch.apply(i))
        if size >= FLAG_SIZE:
            h = node.canonicalized().hashCode()
            rec = seen.setdefault(h, [0, size, cls])
            rec[0] += 1
        return size

    walk(root)
    flags = [(n, size, cls) for n, size, cls in seen.values()
             if n >= FLAG_REPEATS]
    # a repeated subtree's own children repeat too, so rank by size:
    # the first entry is the maximal recomputed frame
    flags.sort(key=lambda t: (-t[1], -t[0]))
    return flags


def main(selected: list[str]) -> int:
    from mktd6_flink_spark.plans import driver_queries as dq
    from mktd6_flink_spark.session import get_spark

    spark = get_spark("persist-audit")
    spark.sparkContext.setLogLevel("ERROR")
    # Force every maybe_persist site ON: at audit SF the size gate
    # leaves small frames unpersisted (correct for runtime, invisible
    # here), which would flag exactly the sites that are already
    # instrumented. With the threshold forced, an entry that flags is
    # one with NO persist boundary on a 3x-consumed subtree — the
    # actionable set.
    spark.conf.set("spark.mktd6.twophase.persistThreshold", "always")
    names = selected or [n for n in dq.QUERIES
                         if not n.startswith("streaming_")]
    n_flagged = 0
    for name in names:
        try:
            df = dq.QUERIES[name](spark, SF_DIR)
            flags = _audit_plan(df._jdf.queryExecution().optimizedPlan())
        except Exception as e:  # noqa: BLE001 - audit must not die mid-sweep
            print(f"{name}: ERR {type(e).__name__}: {e}")
            continue
        if flags:
            n_flagged += 1
            top = ", ".join(f"{cls} size={size} x{n}"
                            for n, size, cls in flags[:3])
            print(f"{name}: REPEATED {top}")
        else:
            print(f"{name}: ok")
    print(f"\n{n_flagged} of {len(names)} entries carry a repeated "
          f"subtree (size>={FLAG_SIZE}, repeats>={FLAG_REPEATS})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
