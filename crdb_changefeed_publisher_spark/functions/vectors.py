"""Vector column expressions over array<float>/array<double> embeddings.

Two tiers:

- `dot`/`l2_norm`/`cosine`: built-in higher-order functions. JVM-side but
  INTERPRETED (HOF lambdas are not codegen'd) and sequential-fold, so the
  summation order matches a sequential oracle bit-for-bit. Use for small
  inputs and as the spec for equivalence tests.
- `cosine_arrow`: Arrow-batched numpy, rounded to 6 decimals — the
  production rerank path (~10x the HOF form). Rounding to 6 decimals makes
  the value agree with the sequential fold (float64 pairwise-vs-sequential
  summation differs only in the last ulps), which is what lets GEMM-based
  operators stay oracle-verified.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


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


# DataType object, not a DDL string: strings are parsed via the active
# SparkContext at decoration time and this module must import session-free.
@pandas_udf(DoubleType())
def cosine_arrow(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized cosine similarity rounded to 6 decimals (see module doc)."""
    A = np.array(list(a), dtype=np.float64)
    B = np.array(list(b), dtype=np.float64)
    s = (A * B).sum(axis=1) / (
        np.sqrt((A * A).sum(axis=1)) * np.sqrt((B * B).sum(axis=1))
    )
    return pd.Series(np.round(s, 6))
