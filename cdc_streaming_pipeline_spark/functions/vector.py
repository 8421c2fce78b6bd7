"""Vector math over ``array<float/double>`` embedding columns.

Two tiers:
- expression forms (zip_with / aggregate): deterministic left-to-right
  fold, exactly replicable in the DuckDB oracle — used where oracle parity
  matters (norms, small verifies).
- ``cosine_pd``: Arrow-batched pandas UDF doing the whole batch in one
  vectorized numpy pass — used on high-volume candidate verification where
  the per-row interpreted fold would dominate the operator's runtime.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns (double precision)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


@F.pandas_udf(DoubleType())  # type instance: usable without an active session
def cosine_pd(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized cosine over two array columns, rounded to 4 decimals
    (matches the numpy GEMM paths in operators/similarity.py)."""
    mat_a = np.array(a.tolist(), dtype=np.float64)
    mat_b = np.array(b.tolist(), dtype=np.float64)
    num = np.einsum("ij,ij->i", mat_a, mat_b)
    na = np.linalg.norm(mat_a, axis=1)
    nb = np.linalg.norm(mat_b, axis=1)
    na[na == 0.0] = 1.0
    nb[nb == 0.0] = 1.0
    return pd.Series(np.round(num / (na * nb), 4))
