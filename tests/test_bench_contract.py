"""bench.py stdout contract: the driver captures only a bounded tail
(~2000 chars) of the bench process's output and parses the LAST JSON
line.  Rounds 10 and 15 were both recorded as ``parsed: null`` because
the final line carried per-head data proportional to panel size.  These
tests pin the structural fix: the line is O(1) in panel size and stays
far inside the capture window no matter how the panel grows."""

from __future__ import annotations

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _subtotals(n_rounds: int) -> dict:
    # worst-case-width values: hundreds of seconds with 3 decimals
    return {f"r{r}_comparable_{40 + r}": 999.999
            for r in range(6, 6 + n_rounds)}


def test_compact_line_parses_and_carries_contract_fields():
    line = bench.render_compact_line(145.123, 0.1, 2.067, _subtotals(10))
    d = json.loads(line)
    assert d["metric"] == "headline_total_wall"
    assert d["unit"] == "sec"
    assert d["value"] == 145.123
    assert d["sf"] == 0.1
    assert d["floor_sec"] == 2.067
    assert len(d["subtotals_min"]) == bench._COMPACT_SUBTOTAL_KEEP


def test_compact_line_keeps_latest_rounds_numerically():
    """r15 must beat r6 even though "r15" < "r6" lexically."""
    line = bench.render_compact_line(1.0, 0.1, 1.0, _subtotals(10))
    keys = list(json.loads(line)["subtotals_min"])
    rounds = sorted(int(k.split("_")[0][1:]) for k in keys)
    assert rounds == [12, 13, 14, 15]


def test_compact_line_bounded_regardless_of_panel_growth():
    """Even with 40 rounds of subtotals accumulated, the rendered line
    must stay comfortably inside the driver's ~2000-char tail — the
    driver also prefixes log lines, so demand a wide margin."""
    for n_rounds in (1, 4, 10, 40):
        line = bench.render_compact_line(
            99999.999, 0.1, 9.999, _subtotals(n_rounds))
        assert len(line) < 1200, (n_rounds, len(line))
        json.loads(line)  # must stay valid JSON


def test_compact_line_never_embeds_per_query_timings():
    """The r15 regression: 76 per-head timings rode the final line.
    The contract line must not contain a "queries" key at all."""
    line = bench.render_compact_line(1.0, 0.1, 1.0, _subtotals(10))
    assert "queries" not in json.loads(line)


def test_main_prints_full_line_then_compact_line_last():
    """The compact line must be printed LAST (the driver parses the
    last JSON line out of a ~2000-char tail; r10/r15 overflowed it),
    with the full queries-bearing line immediately before it for any
    parser that reads complete stdout."""
    import inspect
    src = inspect.getsource(bench.main)
    assert "render_compact_line(" in src
    assert "render_full_line(" in src
    assert src.index("render_full_line(") < src.index(
        "render_compact_line(")
    # no inline json.dumps of timings on stdout outside the renderers
    assert '"queries": timings' not in src


def test_full_line_carries_queries_and_contract_fields():
    queries = {f"head_{i:02d}_with_a_long_name": 12.345 for i in range(80)}
    line = bench.render_full_line(145.123, 0.1, 2.067, queries)
    d = json.loads(line)
    assert d["metric"] == "headline_total_wall"
    assert d["unit"] == "sec"
    assert d["value"] == 145.123
    assert d["sf"] == 0.1
    assert d["queries"] == queries
    assert "\n" not in line  # ONE line
