"""State-schema range audit for every ``applyInPandasWithState`` user.

The pickled-value state path is LENIENT: a state field declared ``int``
(32-bit) happily holds a micros timestamp today, because the tuple is
pickled rather than cast through the declared schema — exactly how the
round-11 CEP automaton shipped ``s_last int`` over int64 values. Any
schema-enforcing path (transformWithState migration, Arrow state
encoding) would then corrupt or crash silently. This audit makes the
contract structural: it patches ``stateful.apply_per_event_stream`` so
every ``pack``-ed state tuple is validated against the DECLARED state
schema — field count, python type, and integer RANGE — while the
registry's streaming entries run end to end at a small SF.

Usage:
    python tools/state_schema_audit.py                # all streaming_*
    python tools/state_schema_audit.py streaming_cep_pattern ...

Exit code 1 on any violation. The two timer entries
(``delayed_return_stream`` / ``delayed_return_event_time_stream``)
declare ``trader string, amount double`` and update with a literal
``(str(...), float(...))`` tuple — statically range-safe; they are
covered by the same wrapper only if routed through
``apply_per_event_stream``, and noted as static-pass otherwise.
"""

from __future__ import annotations

import numbers
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_INT_BOUNDS = {
    "byte": (-(1 << 7), (1 << 7) - 1),
    "tinyint": (-(1 << 7), (1 << 7) - 1),
    "short": (-(1 << 15), (1 << 15) - 1),
    "smallint": (-(1 << 15), (1 << 15) - 1),
    "int": (-(1 << 31), (1 << 31) - 1),
    "integer": (-(1 << 31), (1 << 31) - 1),
    "long": (-(1 << 63), (1 << 63) - 1),
    "bigint": (-(1 << 63), (1 << 63) - 1),
}


def _field_specs(spark, state_schema):
    """Driver-side: reduce the schema to plain-python (name, kind,
    nullable, element_kind) tuples so the validating pack closure ships
    to executor workers without any JVM reference."""
    from pyspark.sql.types import (ArrayType, StructType,
                                   _parse_datatype_string)

    st = (state_schema if isinstance(state_schema, StructType)
          else _parse_datatype_string(state_schema))
    specs = []
    for f in st.fields:
        if isinstance(f.dataType, ArrayType):
            specs.append((f.name, "array", f.nullable,
                          f.dataType.elementType.simpleString()))
        else:
            specs.append((f.name, f.dataType.simpleString(),
                          f.nullable, None))
    return specs


def _check_scalar(name: str, kind: str, v) -> str | None:
    """None = ok, else the violation message."""
    if kind in _INT_BOUNDS:
        if isinstance(v, bool) or not isinstance(v, numbers.Integral):
            return (f"field {name!r} declared {kind} holds "
                    f"{type(v).__name__} {v!r}")
        lo, hi = _INT_BOUNDS[kind]
        if not (lo <= int(v) <= hi):
            return (f"field {name!r} declared {kind} holds out-of-range "
                    f"value {int(v)} (bounds [{lo}, {hi}])")
    elif kind in ("double", "float"):
        if isinstance(v, bool) or not isinstance(v, numbers.Real):
            return (f"field {name!r} declared {kind} holds "
                    f"{type(v).__name__} {v!r}")
    elif kind == "string":
        if not isinstance(v, str):
            return (f"field {name!r} declared string holds "
                    f"{type(v).__name__} {v!r}")
    elif kind == "boolean":
        if not isinstance(v, bool):
            return (f"field {name!r} declared boolean holds "
                    f"{type(v).__name__} {v!r}")
    return None


def validate_state_tuple(specs, state: tuple) -> list[str]:
    """Validate one packed state tuple against the reduced specs;
    returns violation messages (empty = clean)."""
    errs = []
    if len(state) != len(specs):
        return [f"state arity {len(state)} != declared {len(specs)}"]
    for (name, kind, nullable, elem_kind), v in zip(specs, state):
        if v is None:
            if not nullable:
                errs.append(f"field {name!r} non-nullable but holds None")
            continue
        if kind == "array":
            if not isinstance(v, (list, tuple)):
                errs.append(f"field {name!r} declared array holds "
                            f"{type(v).__name__}")
                continue
            for i, e in enumerate(v):
                if e is None:
                    continue
                m = _check_scalar(f"{name}[{i}]", elem_kind, e)
                if m:
                    errs.append(m)
                    break  # one element message per field is enough
        else:
            m = _check_scalar(name, kind, v)
            if m:
                errs.append(m)
    return errs


def make_validating_pack(pack, specs, entry: str):
    def vpack(state):
        packed = pack(state)
        errs = validate_state_tuple(specs, tuple(packed))
        if errs:
            raise ValueError(
                f"STATE-SCHEMA VIOLATION in {entry}: " + "; ".join(errs))
        return packed
    return vpack


def main(argv: list[str]) -> int:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from mktd6_flink_spark.session import get_spark

    spark = get_spark("state-schema-audit", extra_conf={
        "spark.sql.shuffle.partitions": "8"})
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from mktd6_flink_spark.streaming import stateful

    qs = entry_mod.queries()
    names = argv or sorted(n for n in qs if n.startswith("streaming_"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.001")

    current = {"name": None, "stateful": False}
    orig = stateful.apply_per_event_stream

    def patched(df, key_cols, order_cols, step_factory, out_schema,
                state_schema, pack, unpack, timeout="NoTimeout"):
        current["stateful"] = True
        specs = _field_specs(spark, state_schema)
        return orig(df, key_cols, order_cols, step_factory, out_schema,
                    state_schema,
                    make_validating_pack(pack, specs, current["name"]),
                    unpack, timeout)

    stateful.apply_per_event_stream = patched
    failures, clean, no_state = [], [], []
    try:
        for name in names:
            current["name"], current["stateful"] = name, False
            try:
                qs[name](spark, sf_dir).count()
            except Exception as ex:  # noqa: BLE001 - report and continue
                failures.append((name, str(ex)[:400]))
                print(f"  ✗ {name}: {str(ex)[:200]}")
                continue
            (clean if current["stateful"] else no_state).append(name)
            tag = "state-validated" if current["stateful"] else "no-state"
            print(f"  ✓ {name} ({tag})")
    finally:
        stateful.apply_per_event_stream = orig
    print(f"\n{len(clean)} state-validated, {len(no_state)} without "
          f"apply_per_event_stream state, {len(failures)} violations/errors")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
