"""Portable deterministic hashing.

Everything here computes IDENTICALLY in Spark (Column expressions — JVM-side,
whole-stage-codegen friendly) and in ANSI-ish SQL that DuckDB runs, so that
MinHash / SimHash / fingerprint operators are oracle-checkable bit-for-bit.

The base primitive is md5 (available and identical in both engines); we take
the first 15 hex chars (60 bits — fits a signed 64-bit int) as a uniform
integer, then derive families of universal hashes h_j(x) = (a_j*x + b_j) mod p
with p = 2^31 - 1 (Mersenne prime).  a_j*(x mod p) ≤ (2^31)^2 < 2^63: no
overflow in 64-bit signed arithmetic in either engine.

Spark's builtin xxhash64/hash are NOT portable to DuckDB — never use them in
an oracle-checked path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = 2_147_483_647  # 2^31 - 1
_KNUTH = 2_654_435_761  # Knuth multiplicative constant


def hash_params(n: int) -> list[tuple[int, int]]:
    """Deterministic (a_j, b_j) pairs for a family of n universal hashes."""
    return [
        (((j * 2 + 1) * _KNUTH) % MERSENNE_P or 1, (j * 40503 + 17) % MERSENNE_P)
        for j in range(n)
    ]


# -- Spark side --------------------------------------------------------------

def md5_long(col: Column) -> Column:
    """60-bit non-negative integer from md5 — portable across engines."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def universal_hash(x: Column, a: int, b: int) -> Column:
    """(a * (x mod p) + b) mod p over a non-negative 60-bit input."""
    return (F.lit(a) * (x % F.lit(MERSENNE_P)) + F.lit(b)) % F.lit(MERSENNE_P)


# -- DuckDB / oracle side ----------------------------------------------------

def sql_md5_long(expr: str) -> str:
    # '||' not concat(): DuckDB's concat() treats NULL as '' (giving
    # CAST('0x' AS BIGINT) = an error-prone token), while Spark's
    # md5/conv pipeline propagates NULL — '||' matches that.
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def sql_universal_hash(expr: str, a: int, b: int) -> str:
    return f"(({a} * (({expr}) % {MERSENNE_P}) + {b}) % {MERSENNE_P})"


# -- portable rounding --------------------------------------------------------
# Spark's round() goes through the shortest-decimal representation
# (BigDecimal.valueOf) with HALF_UP, DuckDB rounds the true binary value:
# round(1.005, 2) = 1.01 in Spark but 1.0 in DuckDB. floor(x*10^d + 0.5)/10^d
# is pure IEEE arithmetic and therefore bit-identical in both engines
# (verified: 1.005, 2.675, -1.0045, ... all agree).

def round_portable(col: Column, digits: int = 6) -> Column:
    # Spark's floor(double) returns BIGINT and SATURATES at 2^63 — a
    # huge accumulator (st2's multiplicative product reaches 1e43 at
    # sf0.1) would silently clamp to 9223372036854.775807 while
    # DuckDB's double-domain floor sails past. x - pmod(x, 1) IS
    # double-domain floor (identical for every finite value: below
    # 2^53 it equals floor exactly, above 2^53 doubles are already
    # integers so pmod is 0), keeping both engines bit-identical at
    # any magnitude.
    scale = float(10 ** digits)
    x = col * F.lit(scale) + F.lit(0.5)
    return (x - F.pmod(x, F.lit(1.0))) / F.lit(scale)


def sql_round_portable(expr: str, digits: int = 6) -> str:
    scale = float(10 ** digits)
    return f"(floor(({expr}) * {scale} + 0.5) / {scale})"


def expand_round6(sql: str) -> str:
    """Expand the authoring macro ``ROUND6(expr)`` into the portable
    floor-based rounding form (balanced-paren aware)."""
    out = []
    i = 0
    token = "ROUND6("
    while True:
        j = sql.find(token, i)
        if j < 0:
            out.append(sql[i:])
            return "".join(out)
        out.append(sql[i:j])
        depth = 1
        k = j + len(token)
        while depth > 0:
            if k >= len(sql):
                raise ValueError("unbalanced ROUND6(...) in SQL")
            if sql[k] == "(":
                depth += 1
            elif sql[k] == ")":
                depth -= 1
            k += 1
        inner = sql[j + len(token):k - 1]
        out.append(sql_round_portable(inner))
        i = k
