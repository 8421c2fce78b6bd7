"""Exact distributed rank/cumsum/ntile (operators/rank.py): parity with
the single-task global window it replaces, NTILE formula equivalence,
and the plan-level guarantee that no data-sized frame meets an
unpartitioned window in the queries built on it."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.operators.rank import exact_ntile, with_global_rank
from tests.conftest import SF_DIR


def _frame(spark, n=500, seed=7):
    rng = random.Random(seed)
    # duplicate-heavy values force boundary ties across percentile cuts
    rows = [(i, float(rng.randint(0, 40)), rng.randint(1, 5)) for i in range(n)]
    return spark.createDataFrame(rows, "id bigint, v double, w bigint")


@pytest.mark.parametrize("ascending", [True, False])
def test_rank_and_cumsum_match_global_window(spark, ascending):
    df = _frame(spark)
    order = [
        F.col("v").asc() if ascending else F.col("v").desc(),
        F.col("id").asc(),
    ]
    w = Window.orderBy(*order)
    truth = df.select(
        "id",
        F.row_number().over(w).alias("rank_t"),
        F.sum("w").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum_t"),
    )
    got = with_global_rank(
        df, key="v", tiebreak="id", ascending=ascending, value_col="w", n_buckets=7
    ).select("id", "_g_rank", "_g_cum", "_g_n", "_g_total")
    j = got.join(truth, "id").collect()
    assert len(j) == 500
    for r in j:
        assert r["_g_rank"] == r["rank_t"], r
        assert r["_g_cum"] == r["cum_t"], r
        assert r["_g_n"] == 500
    total = df.agg(F.sum("w")).collect()[0][0]
    assert all(r["_g_total"] == total for r in j)


def test_rank_degenerate_frames(spark):
    # fewer rows than buckets, and an all-equal key (single bucket)
    tiny = spark.createDataFrame([(1, 5.0), (2, 3.0), (3, 9.0)], "id bigint, v double")
    got = {
        r["id"]: r["_g_rank"]
        for r in with_global_rank(
            tiny, key="v", tiebreak="id", ascending=True, n_buckets=64
        ).collect()
    }
    assert got == {2: 1, 1: 2, 3: 3}
    flat = spark.createDataFrame([(i, 1.0) for i in range(20)], "id bigint, v double")
    ranks = sorted(
        r["_g_rank"]
        for r in with_global_rank(
            flat, key="v", tiebreak="id", ascending=False, n_buckets=8
        ).collect()
    )
    assert ranks == list(range(1, 21))


@pytest.mark.parametrize("n,k", [(10, 3), (5, 3), (100, 10), (7, 4), (4, 4), (3, 4)])
def test_exact_ntile_matches_builtin(spark, n, k):
    df = spark.range(n).select((F.col("id") + 1).alias("r"), F.lit(n).alias("n"))
    w = Window.orderBy("r")
    out = df.select(
        exact_ntile("r", "n", k).alias("mine"), F.ntile(k).over(w).alias("builtin")
    ).collect()
    assert all(r["mine"] == r["builtin"] for r in out)


def _window_nodes(df):
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return [l for l in plan.splitlines() if l.strip().startswith(("Window", "+- Window", ":- Window")) or "Window [" in l]


def test_trio_plans_have_no_unpartitioned_window(spark):
    """The round-7 scale flaw: deciles/RFM/pareto/zipf ran a global NTILE
    through ONE task. Every Window node in their plans must now carry a
    partition spec (three bracket groups in the logical print — an
    unpartitioned Window prints only two)."""
    from cdc_streaming_pipeline_spark.plans.analytics import (
        corpus_zipf_slope,
        customer_rfm_segments,
        customer_value_deciles,
        lineitem_price_equidepth_bands,
        supplier_pareto_analysis,
    )

    for q in (
        customer_value_deciles,
        supplier_pareto_analysis,
        customer_rfm_segments,
        corpus_zipf_slope,
        lineitem_price_equidepth_bands,
    ):
        df = q(spark, SF_DIR)
        nodes = _window_nodes(df)
        assert nodes, f"{q.__name__}: expected at least one Window node"
        for line in nodes:
            assert line.count("], [") >= 2, (
                f"{q.__name__}: unpartitioned Window survives: {line.strip()}"
            )
        import inspect
        from cdc_streaming_pipeline_spark.plans import analytics

        assert "F.ntile" not in inspect.getsource(q)


def test_rank_property_random_frames(spark):
    """Hypothesis-style randomized parity: many small random frames with
    heavy ties, tiny bucket counts, and both directions must reproduce
    the single-task window's ranks exactly."""
    import random

    from pyspark.sql import Window

    for seed in range(6):
        rng = random.Random(100 + seed)
        n = rng.randint(1, 120)
        n_buckets = rng.choice([2, 3, 5, 16])
        ascending = rng.choice([True, False])
        rows = [(i, float(rng.randint(0, 6))) for i in range(n)]
        df = spark.createDataFrame(rows, "id bigint, v double")
        order = [
            F.col("v").asc() if ascending else F.col("v").desc(),
            F.col("id").asc(),
        ]
        truth = {
            r["id"]: r["t"]
            for r in df.select(
                "id", F.row_number().over(Window.orderBy(*order)).alias("t")
            ).collect()
        }
        got = {
            r["id"]: r["_g_rank"]
            for r in with_global_rank(
                df, key="v", tiebreak="id", ascending=ascending, n_buckets=n_buckets
            ).collect()
        }
        assert got == truth, (seed, n, n_buckets, ascending)
