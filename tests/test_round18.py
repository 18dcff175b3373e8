"""Round-18 optimization equivalence tests.

Every r18 change is a PLAN/BOUNDARY optimization that must not change
what any declared query computes; these tests pin the equivalence
arguments the optimizations rest on:

- the fused attrition kernel builds byte-identical payloads to the
  DataFrame builders it replaces (and the fused report equals the
  unfused reference end to end);
- the single-lifecycle streaming k-hop entry equals its batch twin
  (the shared-oracle invariant, checked engine-to-engine here without
  DuckDB).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def test_attrition_payloads_match_dataframe_builders(spark):
    """_attrition_payloads (the fused kernel's builder) must produce
    byte-identical corrupted payloads to the unfused
    attrition_media_from_documents pipeline for every (modality,
    media_id) of the sf0.001 corpus."""
    from mktd6_flink_spark.functions import multimodal as mm
    from mktd6_flink_spark.plans.driver_queries import load

    docs = load(spark, SF, "documents")
    ref = {(r["modality"], r["media_id"]): bytes(r["payload"])
           for r in mm.attrition_media_from_documents(docs).collect()}
    rows = docs.select("doc_id", "text").collect()
    assert len(ref) == 3 * len(rows)
    for r in rows:
        did = int(r["doc_id"])
        for modality, payload in mm._attrition_payloads(did, r["text"]):
            fused = mm._corrupt_for_report(payload, did % 5, modality)
            assert fused == ref[(modality, did)], (modality, did)


def test_fused_attrition_report_equals_unfused(spark):
    """End-to-end: the fused one-scan report frame equals the unfused
    builder>>corruptor>>classifier composition."""
    from mktd6_flink_spark.functions import multimodal as mm
    from mktd6_flink_spark.plans.driver_queries import load

    docs = load(spark, SF, "documents")
    fused = {(r["modality"], r["reason"]): r["n"]
             for r in mm.attrition_report_from_documents(docs).collect()}
    ref = {(r["modality"], r["reason"]): r["n"]
           for r in mm.decode_attrition_report(
               mm.attrition_media_from_documents(docs)).collect()}
    assert fused == ref


def test_streaming_khop_single_lifecycle_equals_batch_twin(spark):
    """The r18 single-lifecycle foreachBatch k-hop must produce the
    batch twin's exact per-(seed, hop) counts, and must start exactly
    ONE streaming query (the optimization's whole claim — the r15
    form started one per hop)."""
    import time

    from pyspark.sql.streaming import StreamingQueryListener

    from mktd6_flink_spark.plans import driver_queries as dq

    class _Count(StreamingQueryListener):
        def __init__(self):
            self.started = []

        def onQueryStarted(self, event):
            self.started.append(str(event.id))

        def onQueryProgress(self, event):
            pass

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    batch = {(r["seed"], r["hop"]): r["n_new"]
             for r in dq.QUERIES["graph_khop_reach"](spark, SF).collect()}
    listener = _Count()
    spark.streams.addListener(listener)
    try:
        stream = {(r["seed"], r["hop"]): r["n_new"]
                  for r in dq.QUERIES["streaming_khop_reach"](
                      spark, SF).collect()}
        # listener events are delivered async; give the bus a moment
        deadline = time.time() + 20
        while not listener.started and time.time() < deadline:
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(listener)
    assert stream == batch and len(batch) > 0
    assert len(listener.started) == 1, listener.started
