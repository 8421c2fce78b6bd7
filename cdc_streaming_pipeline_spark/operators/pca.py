"""Distributed PCA over an embedding column — explained-variance spectrum
and principal axes, the dimensionality-reduction / whitening pre-pass of an
embedding-heavy training-data pipeline (and the IVF/quantization tuning
diagnostic: how many dims carry signal).

Algorithm (classic two-phase moment aggregation):

1. One Arrow-batched scan (`mapInPandas`) emits per-partition moment
   partials: row count n, feature sum s (d), and flattened Gram sum
   Σ xᵀx (d²). Each partition's output is ONE row of ~d² doubles.
2. Partials are summed and the d×d covariance assembled on the driver:
   cov = (G - n·μμᵀ) / (n-1), then `numpy.linalg.eigh` (d×d, d ≤ a few
   thousand — microseconds). This is the treeAggregate pattern: the driver
   sees n_partitions × (d²+d+1) doubles, never the data.

Bounded-collect contract: d=64 → each partial is ~33 KB; even d=4096 with
2000 partitions is ~270 GB of partials — at that point insert one
intermediate Spark-side reduce (groupBy pmod(partition_id, k)); noted, not
needed for any realistic embedding width.

Determinism: float summation order varies with partition order, so
eigenvalues can wobble in the last bits — outputs are rounded and the
parity test (tests/test_pca.py) compares against a numpy-exact oracle at
rtol 1e-6. Non-SQL-expressible (eigendecomposition) → rows-only in the
driver gate, accuracy-gated in pytest.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.ArrayType(T.DoubleType())),
        T.StructField("g", T.ArrayType(T.DoubleType())),
    ]
)


def _moment_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    n = 0
    s = None
    g = None
    for pdf in batches:
        if pdf.empty:
            continue
        x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        n += x.shape[0]
        s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
        gram = x.T @ x
        g = gram if g is None else g + gram
    if n == 0:
        return
    yield pd.DataFrame({"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]})


def covariance_matrix(df: DataFrame, vec_col: str = "embedding") -> tuple[np.ndarray, int]:
    """(covariance d×d, n_rows) via one distributed scan."""
    partials = (
        df.select(df[vec_col].alias("embedding"))
        .mapInPandas(_moment_partials, schema=_PARTIAL_SCHEMA)
        .collect()
    )
    if not partials:
        raise ValueError("covariance_matrix: empty input")
    n = sum(r["n"] for r in partials)
    s = np.sum([np.asarray(r["s"]) for r in partials], axis=0)
    d = s.shape[0]
    g = np.sum([np.asarray(r["g"]).reshape(d, d) for r in partials], axis=0)
    mu = s / n
    cov = (g - n * np.outer(mu, mu)) / max(n - 1, 1)
    return cov, n


def pca_explained_variance(
    spark: SparkSession, df: DataFrame, vec_col: str = "embedding", k: int = 10
) -> DataFrame:
    """Top-k eigenvalues of the covariance with explained-variance ratios.

    Output: (component, eigenvalue, explained_frac, cum_frac), component
    0-based in descending-eigenvalue order.
    """
    cov, _ = covariance_matrix(df, vec_col)
    eigvals = np.linalg.eigh(cov)[0][::-1]  # descending
    total = float(eigvals.sum())
    top = eigvals[:k]
    cum = np.cumsum(top) / total
    rows = [
        (int(i), round(float(v), 6), round(float(v / total), 6), round(float(c), 6))
        for i, (v, c) in enumerate(zip(top, cum))
    ]
    return spark.createDataFrame(
        rows, schema="component int, eigenvalue double, explained_frac double, cum_frac double"
    )


def pca_project(
    df: DataFrame, vec_col: str = "embedding", k: int = 8, id_col: str = "vec_id"
) -> DataFrame:
    """Project embeddings onto the top-k principal axes (whitening-free).

    Two scans: one for the covariance (above), one Arrow-batched GEMM
    projecting each batch by the broadcast d×k component matrix — same
    corpus-never-shuffles shape as brute-force top-k. Output:
    (id_col, pca array<double> length k).
    """
    cov, _ = covariance_matrix(df, vec_col)
    # projection is around the mean; a tiny Spark-side aggregate (d doubles)
    from pyspark.sql import functions as F

    mean_row = (
        df.select(F.posexplode(df[vec_col]).alias("i", "x"))
        .groupBy("i")
        .agg(F.avg(F.col("x").cast("double")).alias("m"))
        .orderBy("i")
        .collect()
    )
    mu = np.array([r["m"] for r in mean_row])
    comps = np.linalg.eigh(cov)[1][:, ::-1][:, :k]  # d×k, descending eigvalue

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("pca", T.ArrayType(T.DoubleType())),
        ]
    )

    def _project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64) - mu
            proj = x @ comps
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "pca": list(proj)})

    return df.select(df[id_col], df[vec_col].alias("embedding")).mapInPandas(
        _project, schema=out_schema
    )
