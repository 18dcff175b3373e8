"""Operator layer: stateless row ops (SURVEY §2.3), routing (§2.4),
windows/aggregations (§2.5), and batch fold equivalents of the reference's
keyed-state operators (§2.6)."""
