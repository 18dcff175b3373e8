"""Structured Streaming layer: sources/sinks (SURVEY.md §2.1-2.2) and the
stateful operators ST1-ST10 (§2.6) as ``applyInPandasWithState``."""
