"""Inverted-index search (operators/search.py): partition-pruned serve
plan, AND/OR semantics, tf-idf scoring vs a hand computation."""

from __future__ import annotations

import math

import pytest

from cdc_streaming_pipeline_spark.operators.search import (
    search_topk,
    write_inverted_index,
)


@pytest.fixture()
def index(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "merge scan merge"),
            (2, "scan filter"),
            (3, "window sort"),
            (4, "merge filter scan"),
        ],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "idx")
    n = write_inverted_index(docs, path)
    assert n == 4
    return path


def test_or_query_scores_tfidf(spark, index):
    rows = search_topk(spark, index, ["merge", "scan"], k=10).collect()
    got = {r["doc_id"]: (r["n_terms_matched"], r["score"]) for r in rows}
    # df: merge=2, scan=3; N=4
    idf_m, idf_s = math.log(4 / 2), math.log(4 / 3)
    assert got[1] == (2, round(2 * idf_m + 1 * idf_s, 4))
    assert got[2] == (1, round(1 * idf_s, 4))
    assert got[4] == (2, round(1 * idf_m + 1 * idf_s, 4))
    assert 3 not in got


def test_and_mode_requires_every_term(spark, index):
    rows = search_topk(spark, index, ["merge", "scan", "filter"], mode="all").collect()
    assert [r["doc_id"] for r in rows] == [4]


def test_serve_plan_prunes_partitions(spark, index):
    df = search_topk(spark, index, ["merge"], k=5)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan
    # the bucket predicate must reach the partition level, not a post-scan filter
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "bucket" in pf


def test_unknown_terms_empty_and_mode_validation(spark, index):
    assert search_topk(spark, index, ["zzzz"], k=5).count() == 0
    with pytest.raises(ValueError, match="any|all"):
        search_topk(spark, index, ["merge"], mode="phrase")
