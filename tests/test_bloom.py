"""Bloom semi-join prefilter (operators/bloom.py): no false negatives,
measured pruning on disjoint keys, exact equality with the plain semi
join, and the bounded-build contract (bit-array words <= m_bits/64)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.operators.bloom import (
    bloom_build,
    bloom_prefilter,
    bloom_semi_join,
)

M = 1 << 14  # small filter so FPs are plausible and the test is fast


def _keys(spark, vals, name="k"):
    return spark.createDataFrame([(v,) for v in vals], f"{name} bigint")


def test_no_false_negatives(spark):
    build = _keys(spark, range(0, 500))
    bits = bloom_build(build, "k", m_bits=M)
    probe = _keys(spark, range(0, 500))
    kept = bloom_prefilter(probe, "k", bits, m_bits=M).count()
    assert kept == 500  # every true member must survive


def test_prunes_disjoint_probe(spark):
    bits = bloom_build(_keys(spark, range(0, 200)), "k", m_bits=M)
    probe = _keys(spark, range(10_000, 12_000))  # fully disjoint
    kept = bloom_prefilter(probe, "k", bits, m_bits=M).count()
    # 2000 disjoint keys vs a 16 Kbit filter with 200 keys: FP rate is
    # well under 1% per key at these parameters; allow generous slack.
    assert kept < 100


def test_semi_join_exact_vs_plain(spark):
    probe = spark.createDataFrame(
        [(i % 700, i) for i in range(3000)], "k bigint, payload bigint"
    )
    build = _keys(spark, [i * 3 for i in range(150)], name="bk")
    got = bloom_semi_join(probe, build, "k", "bk", m_bits=M, force=True)
    want = probe.join(build, probe["k"] == build["bk"], "left_semi")
    assert sorted(r["payload"] for r in got.collect()) == sorted(
        r["payload"] for r in want.collect()
    )
    assert got.columns == probe.columns


def test_decision_contract_and_fall_through(spark):
    """bloom_semi_join engages the filter ONLY in its declared winning
    regime (low selectivity AND non-broadcastable build, or force);
    everywhere else it must plan the plain semi join — no Python
    prefilter stage in the physical plan."""
    from cdc_streaming_pipeline_spark.operators.bloom import bloom_regime_wins

    # the regime table
    assert not bloom_regime_wins(None, True)            # nothing declared
    assert not bloom_regime_wins(0.9, False)            # matches too common
    assert not bloom_regime_wins(0.1, True)             # broadcastable: AQE wins
    assert bloom_regime_wins(0.1, False)                # the winning regime
    assert bloom_regime_wins(None, True, force=True)    # explicit override

    probe = spark.createDataFrame(
        [(i % 700, i) for i in range(3000)], "k bigint, payload bigint"
    )
    build = _keys(spark, [i * 3 for i in range(150)], name="bk")

    def has_python_stage(df):
        return "Python" in df._jdf.queryExecution().executedPlan().toString()

    fell_through = bloom_semi_join(probe, build, "k", "bk", m_bits=M)
    engaged = bloom_semi_join(
        probe, build, "k", "bk", m_bits=M,
        expected_selectivity=0.1, broadcastable_build=False,
    )
    assert not has_python_stage(fell_through)
    assert has_python_stage(engaged)
    # identical answers either way — the contract is about cost only
    assert sorted(r["payload"] for r in fell_through.collect()) == sorted(
        r["payload"] for r in engaged.collect()
    )


def test_build_is_bounded_by_config(spark):
    bits = bloom_build(_keys(spark, range(5000)), "k", m_bits=M)
    assert bits.shape == (M // 64,)  # config-sized, not data-sized
