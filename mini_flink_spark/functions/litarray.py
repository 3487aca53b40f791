"""Single-parse literal arrays.

Building a literal array through the Column API costs one py4j round-trip per
element (`F.array(*[F.lit(x) ...])` → k·d JVM calls): a k=8 × d=64 centroid
literal is ~500 round-trips, and the LSH/PQ/decontam paths build several per
query — measured seconds of pure DRIVER latency per query construction, and
the first thing to blow up when the machine is loaded (py4j RTT inflates).
Rendering the whole array as ONE SQL string parsed by ONE `F.expr` call yields
the identical Catalyst literal tree for milliseconds. Same trick as
`similarity.multi_table_buckets_expr`; this module makes it reusable.

Bit-exactness: `repr(float)` emits the shortest decimal that round-trips to
the same IEEE-754 double in Python, and Spark's `Double.parseDouble` is also
correctly rounded, so the parsed literal is bit-identical to `F.lit(x)`.
Non-finite values (possible in degenerate centroids) go through explicit
casts. Pinned by tests/test_round5_fixes.py.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(x: float) -> str:
    x = float(x)
    if math.isnan(x):
        return "CAST('NaN' AS DOUBLE)"
    if math.isinf(x):
        return f"CAST('{'-' if x < 0 else ''}Infinity' AS DOUBLE)"
    return repr(x).upper() + "D"


def double_array_lit(xs) -> Column:
    """array<double> literal from one expression parse."""
    xs = list(xs)
    if not xs:
        return F.expr("CAST(array() AS ARRAY<DOUBLE>)")
    return F.expr("array(" + ",".join(_d(x) for x in xs) + ")")


def double_matrix_lit(rows) -> Column:
    """array<array<double>> literal from one expression parse."""
    rows = [list(r) for r in rows]
    if not rows:
        return F.expr("CAST(array() AS ARRAY<ARRAY<DOUBLE>>)")
    return F.expr(
        "array("
        + ",".join("array(" + ",".join(_d(x) for x in r) + ")" for r in rows)
        + ")"
    )


def rounded_double_array_lit(xs, scale: int) -> Column:
    """array<double> literal where each element is rounded ENGINE-side
    (`round(xD, scale)` in the parsed expression — JVM BigDecimal HALF_UP,
    which oracle-parity paths depend on; Python's round would be banker's)."""
    xs = list(xs)
    if not xs:
        return F.expr("CAST(array() AS ARRAY<DOUBLE>)")
    return F.expr(
        "array(" + ",".join(f"round({_d(x)},{int(scale)})" for x in xs) + ")"
    )


def bigint_array_lit(xs) -> Column:
    """array<bigint> literal from one expression parse."""
    xs = [int(x) for x in xs]
    if not xs:
        return F.expr("CAST(array() AS ARRAY<BIGINT>)")
    return F.expr("array(" + ",".join(f"{x}L" for x in xs) + ")")
