"""fuzzy_join (operators/fuzzyjoin.py): the blocked+verified result must
EQUAL the brute-force cross-join ground truth pair-for-pair (the filter
is claimed complete, the verify exact — so any difference is a bug),
short strings route through the exact fallback, and the plan stays
JVM-only."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.operators.fuzzyjoin import fuzzy_join


def _truth(spark, left, right, d):
    rows = (
        left.crossJoin(
            right.withColumnRenamed("id", "rid").withColumnRenamed("v", "rv")
        )
        .withColumn("ed", F.levenshtein("v", "rv"))
        .filter(F.col("ed") <= d)
        .collect()
    )
    return {(r["id"], r["rid"], r["ed"]) for r in rows}


def _got(left, right, d, q=3):
    rows = fuzzy_join(left, right, "id", "v", "id", "v", max_distance=d, q=q).collect()
    return {(r["l_id"], r["r_id"], r["edit_dist"]) for r in rows}


def test_equals_bruteforce_on_realistic_names(spark):
    names = [
        "johnathan smith", "jonathan smith", "jonathan smyth",
        "maria garcia-lopez", "maria garcia lopez", "mario garcia lopez",
        "acme corporation ltd", "acme corporation inc", "acme corp ltd",
        "zhang wei", "zhang wai", "wang wei",
        "completely unrelated entity", "another different record",
    ]
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "id bigint, v string"
    )
    for d in (1, 2):
        assert _got(df, df, d) == _truth(spark, df, df, d), d


def test_short_strings_exact_via_fallback(spark):
    """Strings with fewer than q*d+1 distinct grams would defeat the
    rarest-gram signature ('ab' vs 'cd' share nothing yet ed=2) — the
    fallback must keep the result exact anyway."""
    vals = ["ab", "cd", "abc", "abd", "xyz", "a", "", "zhang wei"]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id bigint, v string"
    )
    assert _got(df, df, 2) == _truth(spark, df, df, 2)


def test_asymmetric_sides_and_no_python_in_plan(spark):
    left = spark.createDataFrame(
        [(1, "spark streaming engine"), (2, "sprak streaming engine")],
        "id bigint, v string",
    )
    right = spark.createDataFrame(
        [(10, "spark streaming engine"), (11, "flink streaming engine")],
        "id bigint, v string",
    )
    out = fuzzy_join(left, right, "id", "v", "id", "v", max_distance=2)
    got = {(r["l_id"], r["r_id"], r["edit_dist"]) for r in out.collect()}
    assert got == {(1, 10, 0), (2, 10, 2)}
    assert "Python" not in out._jdf.queryExecution().executedPlan().toString()


def test_degenerate_short_cohort_refuses_not_broadcasts(spark):
    """The exact fallback broadcast is contract-bounded and ENFORCED:
    a data-scaled short cohort must raise, never silently broadcast."""
    big_short = spark.range(150_000).select(
        F.col("id"), F.concat(F.lit("x"), (F.col("id") % 10).cast("string")).alias("v")
    )
    with pytest.raises(ValueError, match="short-string cohort"):
        fuzzy_join(big_short, big_short, "id", "v", "id", "v").collect()
