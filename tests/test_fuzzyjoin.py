"""fuzzy_join (operators/fuzzyjoin.py): the blocked+verified result must
EQUAL the brute-force cross-join ground truth pair-for-pair (both
blocking schemes are claimed complete, the verify exact — so any
difference is a bug), cross-length-regime pairs survive the routing, the
plan stays JVM-only, and the gram-deficient broadcast contract is
enforced."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.operators.fuzzyjoin import (
    _del_variants,
    fuzzy_join,
)


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


def _got(left, right, d, **kw):
    rows = fuzzy_join(left, right, "id", "v", "id", "v", max_distance=d, **kw).collect()
    return {(r["l_id"], r["r_id"], r["edit_dist"]) for r in rows}


def test_del_variants_exact(spark):
    df = spark.createDataFrame([("abc",), ("",), ("a",), ("aa",)], "v string")
    got = {
        r["v"]: set(r["vars"])
        for r in df.select("v", _del_variants(F.col("v"), 2).alias("vars")).collect()
    }
    assert got["abc"] == {"abc", "bc", "ac", "ab", "c", "b", "a"}
    assert got[""] == {""}
    assert got["a"] == {"a", ""}
    assert got["aa"] == {"aa", "a", ""}


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


def test_short_and_degenerate_strings_exact(spark):
    """Sub-gram-bound and repeated-char strings defeated the old
    rarest-gram signature ('ab' vs 'cd' share nothing yet ed=2) — the
    deletion neighborhood covers them exactly."""
    vals = ["ab", "cd", "abc", "abd", "xyz", "a", "", "zhang wei", "aaaa", "aaab"]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id bigint, v string"
    )
    assert _got(df, df, 2) == _truth(spark, df, df, 2)


def test_cross_length_regime_pairs_survive(spark):
    """Pairs straddling symdel_max_len (one side routed symdel, the
    other q-gram) must come out of the quadrant routing intact."""
    a = "x" * 4 + "abcdefgh"  # len 12
    vals = [
        (1, a),            # symdel side at cap=12
        (2, a + "zz"),     # len 14 > cap, within the d=2 window
        (3, a + "z"),      # len 13 > cap, ed 1
        (4, "y" * 20),     # long, unrelated
        (5, "y" * 20 + "k"),  # long pair, ed 1 (q-gram quadrant)
    ]
    df = spark.createDataFrame(vals, "id bigint, v string")
    got = _got(df, df, 2, symdel_max_len=12)
    assert got == _truth(spark, df, df, 2)


def test_long_repeated_char_deficient_path(spark):
    """Long strings with < q*d+1 distinct grams get no prefix-filter
    guarantee — the contract-bounded broadcast must keep them exact."""
    vals = [
        (1, "a" * 50),
        (2, "a" * 49 + "b"),   # ed 1, both gram-deficient
        (3, "a" * 48),         # ed 2 from id 1
        (4, "the quick brown fox jumps over the lazy dog etc"),  # rich
        (5, "the quick brown fox jumps over the lazy dog etx"),  # rich, ed 1
    ]
    df = spark.createDataFrame(vals, "id bigint, v string")
    assert _got(df, df, 2, symdel_max_len=10) == _truth(spark, df, df, 2)
    with pytest.raises(ValueError, match="gram-deficient"):
        fuzzy_join(
            df, df, "id", "v", "id", "v",
            max_distance=2, symdel_max_len=10, max_deficient=2,
        ).collect()


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


def test_rejects_unsupported_distance(spark):
    df = spark.createDataFrame([(1, "abc")], "id bigint, v string")
    with pytest.raises(ValueError, match="max_distance"):
        fuzzy_join(df, df, "id", "v", "id", "v", max_distance=3).collect()
