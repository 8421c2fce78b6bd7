"""DSIR importance weights (operators/selection.py): hashed-n-gram
importance estimation — documents resembling the target slice score
positive, off-domain documents negative; selection keeps the target-like
ones; the plan broadcasts the bounded feature table and plans the
selection as a distributed top-n, not a global-window sort."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.operators.selection import (
    dsir_importance_weights,
    dsir_select,
)


def _corpus(spark):
    target_like = [
        (i, "merge join scan filter aggregate shuffle partition", "good")
        for i in range(6)
    ]
    off_domain = [
        (10 + i, "llama alpaca vicuna guanaco camelid herd pasture", "raw")
        for i in range(6)
    ]
    mixed = [(20, "merge join llama alpaca scan pasture", "raw")]
    return spark.createDataFrame(
        target_like + off_domain + mixed, "doc_id long, text string, src string"
    )


def test_weights_separate_target_from_off_domain(spark):
    df = _corpus(spark)
    w = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_importance_weights(df, F.col("src") == "good").collect()
    }
    # target-slice vocabulary scores positive, off-domain negative, the
    # mixed doc in between
    assert all(w[i] > 0 for i in range(6)), w
    assert all(w[10 + i] < 0 for i in range(6)), w
    assert max(w[10 + i] for i in range(6)) < w[20] < min(w[i] for i in range(6))


def test_select_keeps_target_like_docs(spark):
    df = _corpus(spark)
    kept = {
        r["doc_id"]
        for r in dsir_select(df, F.col("src") == "good", keep_fraction=0.5).collect()
    }
    assert len(kept) == 7  # ceil(13 * 0.5)
    assert set(range(6)) <= kept and 20 in kept  # top-7 = 6 target + mixed


def test_plan_broadcasts_ratio_and_avoids_global_window(spark):
    df = _corpus(spark)
    w = dsir_importance_weights(df, F.col("src") == "good")
    plan = w._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # ratio table rides a broadcast
    sel = dsir_select(df, F.col("src") == "good", keep_fraction=0.25)
    plan2 = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan2  # distributed top-n
    assert "Window" not in plan2  # never a single-task global window
