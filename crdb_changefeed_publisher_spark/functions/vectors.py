"""Vector column expressions over array<float>/array<double> embeddings.

All pure built-in higher-order functions (JVM-side, codegen): `zip_with` +
`aggregate` fold left-to-right, so the summation order is deterministic and
matches any sequential oracle implementation bit-for-bit in double precision.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; inputs should already be double arrays."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
