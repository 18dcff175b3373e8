"""Operator layer: stateless row ops (P1-P19), routing (R1-R3),
windows/aggregations (W1-W5), batch folds (ST1/ST2/ST6 twins), as-of
join."""

from . import asof, folds, routing, stateless, windows

__all__ = ["asof", "folds", "routing", "stateless", "windows"]
