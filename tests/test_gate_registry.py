"""Gate-window invariants: the driver grades the FIRST 50 registered
queries, so registry ordering is part of the product contract."""

from __future__ import annotations

from mktd6_flink_spark.plans import driver_queries as dq


def test_gate_window_is_exactly_the_priority_list():
    names = list(dq.QUERIES)
    assert len(dq._GATE_PRIORITY) == 50
    assert names[:50] == dq._GATE_PRIORITY
    assert len(set(names)) == len(names)


def test_every_query_has_an_oracle_or_is_documented():
    """Every registered query should carry a DuckDB oracle twin — a
    missing oracle silently downgrades the driver's check to rows-only.
    (Exceptions would need an explicit allowlist here.)"""
    missing = [n for n in dq.QUERIES if n not in dq.ORACLES]
    assert missing == [], missing


def test_oracle_sql_uses_portable_rounding():
    """No oracle may call bare round() — Spark HALF_UPs the shortest
    decimal repr while DuckDB rounds the binary value; ROUND6 (floor
    form) is the portable spelling and expand_round6 should have
    resolved it everywhere."""
    offenders = [n for n, sql in dq.ORACLES.items()
                 if "ROUND6(" in sql]
    assert offenders == [], offenders


def test_gate_window_tool_fingerprints_cover_registry():
    """tools/gate_window.py is load-bearing (it GENERATES the gate
    window), so its fingerprint map must cover every registered entry,
    be deterministic across calls, and actually reflect helper source
    (the transitive-expansion contract that caught pq_codes' consumers
    in round 9)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "gate_window", os.path.join(os.path.dirname(__file__),
                                    "..", "tools", "gate_window.py"))
    gw = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gw)
    fps = gw._entry_fingerprints()
    assert set(fps) == set(dq.QUERIES)
    assert all(len(h) == 64 for h in fps.values())
    assert fps == gw._entry_fingerprints()  # deterministic


def test_audit_covers_registry():
    """The committed plan-audit snapshot (AUDIT_r*.txt, highest round)
    must carry a row for EVERY registered entry. Round 9's audit was
    snapshotted mid-round, so the 9 entries registered afterwards had
    no audit row — and one of them (graph_pagerank_trading) hid the
    round's only genuine plan defect, a single-partition global sort
    the audit's detector would have flagged. The audit gates the final
    commit now; this test is the structural enforcement."""
    import glob
    import os
    import re

    root = os.path.join(os.path.dirname(__file__), "..")
    audits = sorted(glob.glob(os.path.join(root, "AUDIT_r*.txt")))
    assert audits, "no AUDIT_r*.txt snapshot committed"
    latest = audits[-1]
    # rows look like: "name   pushed=N bhj=N smj=N codegen=N arrow=N ..."
    # (search, not match: live progress bars sometimes prefix a row
    # with carriage-return junk in the captured snapshot)
    rows = set()
    with open(latest) as f:
        for line in f:
            m = re.search(r"([A-Za-z_]\w*)\s+pushed=\d+", line)
            if m:
                rows.add(m.group(1))
    missing = sorted(set(dq.QUERIES) - rows)
    assert missing == [], (
        f"{os.path.basename(latest)} lacks audit rows for {missing}; "
        "re-run tools/explain_audit.py and commit the snapshot")


def test_state_audit_covers_streaming_entries():
    """The committed state-schema audit snapshot (STATE_AUDIT_r*.txt,
    highest round) must carry a verdict row for EVERY streaming_*
    entry and report zero violations — the structural wiring of
    tools/state_schema_audit.py into the round close (the pickled
    state path is lenient, so a declared-int-holding-a-timestamp bug
    is invisible without this check)."""
    import glob
    import os
    import re

    root = os.path.join(os.path.dirname(__file__), "..")
    audits = sorted(glob.glob(os.path.join(root, "STATE_AUDIT_r*.txt")))
    assert audits, "no STATE_AUDIT_r*.txt snapshot committed"
    latest = audits[-1]
    rows, violations = set(), []
    with open(latest) as f:
        for line in f:
            m = re.search(r"[✓✗] (\w+)", line)
            if m:
                rows.add(m.group(1))
            if "✗" in line or "VIOLATION" in line:
                violations.append(line.strip())
    streaming = {n for n in dq.QUERIES if n.startswith("streaming_")}
    missing = sorted(streaming - rows)
    assert violations == [], violations
    assert missing == [], (
        f"{os.path.basename(latest)} lacks rows for {missing}; "
        "re-run tools/state_schema_audit.py and commit the snapshot")
