"""Conditional persist for the two-phase range-partition plans.

The scalable as-of join (``asof.asof_join(scalable=True)``) and prefix sum
(``windows.running_sum_scalable``) block-partition their input once and
consume it from 2-3 subplans. The block id is a deterministic function of
the row (operators/blocks.py), so correctness never depends on this cache —
persisting just pays the blocking shuffle once. But the persist is
only a win when re-computing the input costs MORE than writing + reading the
cache: at bench scale (sf0.1, tens of MB) the unconditional persist added
+0.3-1.1 s per query; at cluster scale (GBs-TBs per task's ancestry) it
saves N-1 full re-shuffles.

``maybe_persist`` makes the trade size-aware: persist only when Catalyst's
optimized-plan size estimate exceeds a threshold (default 1 GiB, tunable via
``spark.mktd6.twophase.persistThreshold``; force with ``always``/``never``).
Unknown sizes (stats unavailable) persist — the scale-safe default.

Cache lifetime: a persisted frame can only be unpersisted AFTER its
consumers materialize, which the operator never sees. Persisted frames are
therefore tracked in a registry and released at ENTRY boundaries: every
registered query's wrapper calls ``release_twophase_caches()`` when it is
invoked (unpersist is always safe — lineage recomputes), bounding live
two-phase caches to one entry's worth instead of leaking for the session
lifetime. ``maybe_persist`` itself never releases — one entry may hold
several live frames at once (its own + a shared helper's), and a
mid-build release would silently evict sibling caches (the round-12
curation_v2 clobber). Harnesses that materialize results (bench, the
oracle checker) additionally call ``release_twophase_caches()`` per
result for deterministic cleanup. Direct library callers that bypass the
registry (tests, notebooks) are covered by a soft bound: beyond
``MAX_LIVE_CACHES`` live frames the oldest are evicted — far above any
single entry's footprint, so it only fires on session-lifetime leaks.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

THRESHOLD_CONF = "spark.mktd6.twophase.persistThreshold"
DEFAULT_THRESHOLD_BYTES = 1 << 30  # 1 GiB

_LIVE: list[DataFrame] = []

# Leak backstop for callers OUTSIDE the registered-entry wrappers (tests,
# notebooks, long-lived drivers calling library helpers directly): entry
# wrappers release at invocation, but a direct caller never does, so the
# registry would grow for the session lifetime. The bound must exceed the
# largest single entry's live footprint — today's worst holders are the
# composed curation funnels and iterative graph loops at well under a
# dozen frames (the 30-merge BPE trainer briefly held ~31 before it moved
# driver-side) — so 64 only ever evicts frames from long-finished work.
#
# CONTRACT (r13-ADVICE review): the FIFO eviction cannot distinguish a
# leaked frame from a sibling of an in-flight >64-frame build — every
# live frame was registered since the last release_twophase_caches()
# call, so there is no observable "older build" boundary to protect
# (an epoch guard keyed on release calls is provably dead code: release
# empties the registry). A direct caller that holds more than
# MAX_LIVE_CACHES simultaneously-live frames in one build must manage
# persistence itself; inside the registry the bound is unreachable by
# ~5x. Eviction is recompute-cost-only, never a correctness hazard
# (block ids are pure row functions — see module docstring).
MAX_LIVE_CACHES = 64


def _estimated_bytes(df: DataFrame) -> int | None:
    """Catalyst's optimized-plan size estimate, or None if unavailable."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        return int(str(stats.sizeInBytes()))
    except Exception:
        return None


def _threshold(df: DataFrame) -> int | str:
    raw = df.sparkSession.conf.get(
        THRESHOLD_CONF, str(DEFAULT_THRESHOLD_BYTES))
    if raw in ("always", "never"):
        return raw
    try:
        return int(raw)
    except ValueError:
        return DEFAULT_THRESHOLD_BYTES


def maybe_persist(df: DataFrame,
                  release_previous: bool = False,
                  force: bool = False) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK — keeps lineage, spills, survives
    executor loss by recomputation unlike localCheckpoint) when its
    estimated size warrants paying the cache once instead of re-computing
    it per consumer. Below the threshold the frame is returned
    un-persisted: the consumers re-scan, which at that size is cheaper
    than the cache round-trip.

    Lifetime: this function never releases other caches — one query may
    hold several persisted frames at once (its own + a shared helper's;
    a mid-build release here silently unpersisted sibling frames and
    re-inlined their whole ancestry, the round-12 curation_v2 clobber).
    Release happens at ENTRY boundaries instead: every registered
    query's wrapper calls ``release_twophase_caches()`` on invocation,
    so live caches stay bounded to one entry's worth; bench/checker
    harnesses additionally release after materializing each result.
    ``release_previous=True`` restores the old eager behavior for
    callers outside the registry that want it.

    ``force=True`` bypasses the size gate (the ``never`` override
    still wins, so harness experiments can disable all caching): use
    it where Catalyst's estimate is KNOWN-garbage and the recompute is
    the entry's dominant cost — mapInPandas outputs inherit a bogus
    child-based sizeInBytes, so a size-gated persist on a decode
    silently no-ops while every consumer re-runs the decode."""
    threshold = _threshold(df)
    if threshold == "never":
        return df
    if not force and threshold != "always":
        est = _estimated_bytes(df)
        if est is not None and est < threshold:
            return df
    if release_previous:
        release_twophase_caches()
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _LIVE.append(df)
    while len(_LIVE) > MAX_LIVE_CACHES:  # direct-caller leak backstop
        try:
            _LIVE.pop(0).unpersist(blocking=False)
        except Exception:
            pass
    return df


def release_twophase_caches() -> int:
    """Unpersist every live two-phase cache; returns how many were
    released. Always safe — un-materialized consumers recompute from
    lineage."""
    n = 0
    while _LIVE:
        try:
            _LIVE.pop().unpersist(blocking=False)
            n += 1
        except Exception:
            pass
    return n
