"""skyline (operators/skyline.py): the three-phase distributed plan must
EQUAL the brute-force O(n^2) dominance definition row-for-row on random
data across dimensions/directions, keep tied (identical-vector) rows,
and enforce the merge-phase candidate contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.operators.skyline import skyline, _skyline_mask


def _brute(vals: np.ndarray) -> set[int]:
    out = set()
    for i, p in enumerate(vals):
        dominated = any(
            np.all(q <= p) and np.any(q < p) for j, q in enumerate(vals) if j != i
        )
        if not dominated:
            out.add(i)
    return out


@pytest.mark.parametrize("d", [1, 2, 3, 4])
def test_matches_bruteforce_random(spark, d):
    rng = np.random.default_rng(7 + d)
    vals = rng.integers(0, 25, size=(300, d)).astype(float)
    want = _brute(vals)
    rows = [(int(i), *map(float, v)) for i, v in enumerate(vals)]
    cols = [f"x{j}" for j in range(d)]
    df = spark.createDataFrame(
        rows, "id bigint, " + ", ".join(f"{c} double" for c in cols)
    ).repartition(7)
    got = {r["id"] for r in skyline(df, cols).collect()}
    assert got == want, d


def test_maximize_direction(spark):
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 30, size=(200, 2)).astype(float)
    # maximize x0, minimize x1  ==  brute force on (-x0, x1)
    want = _brute(np.column_stack([-vals[:, 0], vals[:, 1]]))
    df = spark.createDataFrame(
        [(int(i), float(a), float(b)) for i, (a, b) in enumerate(vals)],
        "id bigint, x0 double, x1 double",
    ).repartition(5)
    got = {r["id"] for r in skyline(df, ["x0", "x1"], maximize=["x0"]).collect()}
    assert got == want


def test_ties_and_nulls(spark):
    df = spark.createDataFrame(
        [
            (1, 1.0, 5.0),
            (2, 1.0, 5.0),  # identical vector: neither strictly dominates
            (3, 1.0, 6.0),  # dominated by 1/2
            (4, 0.0, 9.0),
            (5, None, 0.0),  # null dim rows are excluded
        ],
        "id bigint, a double, b double",
    )
    got = {r["id"] for r in skyline(df, ["a", "b"]).collect()}
    assert got == {1, 2, 4}
    assert skyline(df.limit(0), ["a", "b"]).count() == 0


def test_kernel_sum_order_exactness():
    # the anti-correlated worst case: every point on the frontier
    vals = np.array([[float(i), float(100 - i)] for i in range(100)])
    assert _skyline_mask(vals).all()
    # and a chain where each dominates the next
    chain = np.array([[float(i), float(i)] for i in range(50)])
    m = _skyline_mask(chain)
    assert m.sum() == 1 and m[0]


def test_candidate_contract_refuses(spark):
    # perfectly anti-correlated => all rows are candidates => must raise
    df = spark.range(5000).select(
        "id",
        F.col("id").cast("double").alias("a"),
        (-F.col("id")).cast("double").alias("b"),
    )
    with pytest.raises(ValueError, match="candidates"):
        skyline(df, ["a", "b"], max_candidates=1000).collect()
