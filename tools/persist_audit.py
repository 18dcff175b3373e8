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

TWO PASSES per entry (both must come out clean):

1. threshold=always — every maybe_persist site forced ON, so a flag
   means NO persist call exists on a >=3x-consumed subtree (the
   actionable instrument-this set; size-gated sites audit clean).
2. DEFAULT threshold — the plan as the driver actually runs it, but
   flagging only PYTHON-STAGE subtrees (MapInPandas /
   FlatMapGroupsInPandas) repeated >= 2. This catches the round-12
   "silent no-op persist" class: Catalyst's sizeInBytes for a Python
   stage is inherited from the child, so a size-gated maybe_persist
   on a decode/fingerprint output no-ops and every consumer re-runs
   the Python stage — invisible to pass 1 by construction. Fix:
   maybe_persist(..., force=True).

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
PY_REPEATS = 2
PY_CLASSES = ("MapInPandas", "FlatMapGroupsInPandas",
              "FlatMapGroupsInPandasWithState", "MapInArrow")

THRESHOLD_CONF = "spark.mktd6.twophase.persistThreshold"


def _audit_plan(root, py_only: bool = False) -> list[tuple[int, int, str]]:
    """Walk a LogicalPlan (py4j handle); return flagged
    (count, size, class_name) tuples, largest first. ``py_only``
    restricts to subtrees containing a Python stage and lowers the
    repeat bar to PY_REPEATS (a x2 of a decode is already the entry's
    dominant cost)."""
    seen: dict[int, list] = {}

    def walk(node) -> tuple[int, bool]:
        cls = node.getClass().getSimpleName()
        if cls == "InMemoryRelation":
            return 1, False  # persisted boundary: computed once
        size, has_py = 1, cls in PY_CLASSES
        ch = node.children()
        for i in range(ch.size()):
            csize, cpy = walk(ch.apply(i))
            size += csize
            has_py = has_py or cpy
        if size >= FLAG_SIZE and (has_py or not py_only):
            h = node.canonicalized().hashCode()
            rec = seen.setdefault(h, [0, size, cls, has_py])
            rec[0] += 1
        return size, has_py

    walk(root)
    min_n = PY_REPEATS if py_only else FLAG_REPEATS
    flags = [(n, size, cls) for n, size, cls, hp in seen.values()
             if n >= min_n and (hp or not py_only)]
    # a repeated subtree's own children repeat too, so rank by size:
    # the first entry is the maximal recomputed frame
    flags.sort(key=lambda t: (-t[1], -t[0]))
    return flags


def main(selected: list[str]) -> int:
    from mktd6_flink_spark.plans import driver_queries as dq
    from mktd6_flink_spark.session import get_spark

    spark = get_spark("persist-audit")
    spark.sparkContext.setLogLevel("ERROR")
    names = selected or [n for n in dq.QUERIES
                         if not n.startswith("streaming_")]
    n_flagged = 0
    for name in names:
        parts = []
        try:
            # pass 1: every persist site forced ON — a flag means NO
            # maybe_persist call exists on the repeated subtree
            spark.conf.set(THRESHOLD_CONF, "always")
            df = dq.QUERIES[name](spark, SF_DIR)
            flags = _audit_plan(df._jdf.queryExecution().optimizedPlan())
            if flags:
                top = ", ".join(f"{cls} size={size} x{n}"
                                for n, size, cls in flags[:3])
                parts.append(f"REPEATED {top}")
            # pass 2: the driver's real threshold — flag Python-stage
            # repeats (the silent no-op persist class; fix: force=True)
            spark.conf.unset(THRESHOLD_CONF)
            df = dq.QUERIES[name](spark, SF_DIR)
            pyflags = _audit_plan(
                df._jdf.queryExecution().optimizedPlan(), py_only=True)
            if pyflags:
                top = ", ".join(f"{cls} size={size} x{n}"
                                for n, size, cls in pyflags[:3])
                parts.append(f"PY-RECOMPUTE {top}")
        except Exception as e:  # noqa: BLE001 - audit must not die mid-sweep
            print(f"{name}: ERR {type(e).__name__}: {e}")
            continue
        finally:
            spark.conf.unset(THRESHOLD_CONF)
        if parts:
            n_flagged += 1
            print(f"{name}: " + "; ".join(parts))
        else:
            print(f"{name}: ok")
    print(f"\n{n_flagged} of {len(names)} entries carry a repeated "
          f"subtree (size>={FLAG_SIZE}, repeats>={FLAG_REPEATS}; "
          f"python-stage repeats>={PY_REPEATS} at default threshold)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
