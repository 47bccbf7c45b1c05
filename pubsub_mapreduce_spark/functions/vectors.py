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
