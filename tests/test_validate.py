"""Data-quality validation operators (operators/validate.py): constraint
report correctness on frames with KNOWN violations (the parquet corpus is
clean except lang domain, so these tests inject dirty rows), and the
plan-shape claim that FK audits broadcast their parent key sets.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.operators.validate import (
    check_constraints,
    fk_orphan_report,
)


def test_check_constraints_counts_each_violation_kind(spark):
    df = spark.createDataFrame(
        [
            (1, "ok", 2),
            (2, None, 0),       # null text
            (2, "dup id", 6),   # duplicate id
            (None, "x", 1),     # null id
            (5, "neg", -3),     # negative n_chars
        ],
        "doc_id bigint, text string, n_chars bigint",
    )
    out = {r.check_name: r for r in check_constraints(
        df,
        row_checks=[
            ("doc_id_not_null", F.col("doc_id").isNull()),
            ("text_not_null", F.col("text").isNull()),
            ("n_chars_nonneg", F.col("n_chars") < 0),
        ],
        unique_cols=("doc_id",),
    ).collect()}
    assert all(r.n_rows == 5 for r in out.values())
    assert (out["doc_id_not_null"].violations, out["doc_id_not_null"].passed) == (1, False)
    assert (out["text_not_null"].violations, out["text_not_null"].passed) == (1, False)
    assert (out["n_chars_nonneg"].violations, out["n_chars_nonneg"].passed) == (1, False)
    # 4 non-null ids, 3 distinct -> 1 duplicate
    assert (out["unique_doc_id"].violations, out["unique_doc_id"].passed) == (1, False)


def test_check_constraints_clean_frame_all_pass(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id bigint, text string")
    out = check_constraints(
        df, row_checks=[("text_not_null", F.col("text").isNull())], unique_cols=("doc_id",)
    ).collect()
    assert all(r.passed and r.violations == 0 for r in out)


def test_fk_orphan_report_finds_orphans_and_ignores_null_keys(spark):
    parent = spark.createDataFrame([(1,), (2,)], "pk bigint")
    child = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 99), (4, None)], "id bigint, fk bigint"
    )
    out = {r.check_name: r for r in fk_orphan_report(
        [("child_fk", child, "fk", parent, "pk")]
    ).collect()}
    # fk=99 is an orphan; the NULL key is not counted
    assert (out["child_fk"].violations, out["child_fk"].passed) == (1, False)


def test_fk_audit_plan_unhinted_parent_keys(spark):
    """The parent key set must NOT carry a manual broadcast hint: a
    dimension parent is tiny and AQE broadcasts it anyway, but a fact
    parent (orders under lineitem) is billions of distinct keys at
    100 TB — a hard hint there exceeds the broadcast limit and fails the
    audit outright. At toy scale Catalyst still picks broadcast from
    statistics, which this test accepts; the contract is only that no
    hint forces it."""
    import inspect

    from cdc_streaming_pipeline_spark.operators import validate as validate_mod
    from cdc_streaming_pipeline_spark.plans.analytics import (
        validate_referential_integrity,
    )
    from tests.conftest import SF_DIR

    src = inspect.getsource(validate_mod.fk_orphan_report)
    assert "F.broadcast" not in src

    df = validate_referential_integrity(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    rows = {r.check_name: r for r in df.collect()}
    assert len(rows) == 7 and all(r.passed for r in rows.values())
