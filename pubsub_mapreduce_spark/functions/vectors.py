"""Vector math over ``array<float/double>`` embedding columns.

All pure built-in HOFs (``zip_with`` / ``aggregate``) — JVM-side, no
Python boundary — so cosine similarity over billions of pairs stays in
whole-stage codegen. A Pandas-UDF path exists in ``operators.similarity``
for the matrix-multiply formulation, which wins when k*dim is large.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Elementwise dot product of two equal-length array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    """L2 norm."""
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; null-safe-zero when either norm is 0."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


def normalize(a: Column) -> Column:
    """Scale to unit L2 norm (pre-normalizing once turns cosine into a
    plain dot product — do this before any pairwise stage)."""
    n = norm(a)
    return F.when(n > 0, F.transform(a, lambda v: v / n)).otherwise(a)


# --- SQL-text builders for plan-side constant tables ------------------
#
# Composing a large literal table (LSH hyperplanes, IVF centroids) from
# per-element F.lit/F.array Columns costs one py4j round trip PER NODE:
# the 4096-leaf LSH plane table measured 2.8-4s of pure driver-side plan
# construction before any task ran (execution itself was ~1.5s). Rendering
# the same tree as ONE SQL expression string costs a single parse JVM-side
# and produces the identical resolved plan (parity-tested).


def sql_array_lit(v) -> str:
    """Render a (nested) Python list of numbers as a Spark SQL array
    literal. Floats use repr (shortest round-trip form) with a D suffix
    so they parse as DOUBLE, not DECIMAL; ints get L for BIGINT."""
    if isinstance(v, (list, tuple)):
        return "array(" + ",".join(sql_array_lit(x) for x in v) + ")"
    if isinstance(v, bool):
        raise TypeError("bool has no SQL literal form here")
    if isinstance(v, int):
        return f"{v}L"
    return repr(float(v)) + "D"


def sql_dot(a: str, b: str) -> str:
    """SQL text of ``dot`` over two array-typed sub-expressions."""
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"


def sql_norm(a: str) -> str:
    """SQL text of ``norm``."""
    return f"sqrt(aggregate({a}, 0.0D, (acc, v) -> acc + v * v))"


def sql_cosine(a: str, b: str) -> str:
    """SQL text of ``cosine`` — same zero-norm guard as the Column form."""
    na, nb = sql_norm(a), sql_norm(b)
    return (
        f"(CASE WHEN {na} > 0 AND {nb} > 0 "
        f"THEN {sql_dot(a, b)} / ({na} * {nb}) ELSE 0.0D END)"
    )
