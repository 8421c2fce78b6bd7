"""population_stability (operators/validate.py): closed-form PSI values,
zero-drift identity, and the single-cohort-bucket smoothing guarantee."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.operators.validate import population_stability


def _df(spark, rows):
    return spark.createDataFrame(rows, "split string, v string")


def _psi(df):
    out = population_stability(df, "split", "a", "b", [("v", F.col("v"))])
    return {r["feature"]: r for r in out.collect()}


def test_identical_distributions_zero(spark):
    rows = [("a", x) for x in "xxyy"] + [("b", x) for x in "xxyy"]
    r = _psi(_df(spark, rows))["v"]
    assert r["psi"] == 0.0 and r["n_buckets"] == 2


def test_closed_form_symmetric_shift(spark):
    # a: {x:3, y:1}, b: {x:1, y:3}; smoothed p=(c+1)/(n+2) -> psi = (2/3)ln2
    rows = [("a", "x")] * 3 + [("a", "y")] + [("b", "x")] + [("b", "y")] * 3
    r = _psi(_df(spark, rows))["v"]
    assert abs(r["psi"] - round(2.0 / 3.0 * math.log(2.0), 4)) < 1e-12


def test_single_cohort_bucket_is_finite(spark):
    # bucket z appears ONLY in cohort a: add-one smoothing keeps ln finite
    rows = [("a", "x"), ("a", "z"), ("b", "x"), ("b", "x")]
    r = _psi(_df(spark, rows))["v"]
    assert r["psi"] is not None and math.isfinite(r["psi"])
    assert r["n_buckets"] == 2


def test_multiple_features_independent(spark):
    df = spark.createDataFrame(
        [("a", "x", "p"), ("a", "y", "p"), ("b", "x", "p"), ("b", "y", "p")],
        "split string, v string, w string",
    )
    out = population_stability(
        df, "split", "a", "b", [("v", F.col("v")), ("w", F.col("w"))]
    ).collect()
    got = {r["feature"]: r["psi"] for r in out}
    assert got == {"v": 0.0, "w": 0.0}
