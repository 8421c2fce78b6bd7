"""Unit tests for the corpus-assembly samplers (operators/sampling.py):
mixture resampling and token-budget selection, on tiny in-memory frames.

Both operators promise (a) deterministic engine-portable membership via
the (md5(id), id) order, and (b) exact integer quota/budget arithmetic —
these tests pin the semantics the DuckDB oracles re-state in SQL.
"""

from __future__ import annotations

import hashlib
from collections import Counter

from cdc_streaming_pipeline_spark.operators.sampling import (
    sample_to_mixture,
    take_token_budget,
)


def _md5_order(ids):
    return sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, lang string")


def test_mixture_uniform_downsamples_every_stratum_to_min_count(spark):
    rows = [(i, "en") for i in range(5)] + [(i, "de") for i in range(10, 13)] + [
        (i, "fr") for i in range(20, 29)
    ]
    out = sample_to_mixture(_docs(spark, rows), ["lang"]).collect()
    by_lang = Counter(r.lang for r in out)
    assert by_lang == {"en": 3, "de": 3, "fr": 3}  # min stratum count
    assert all(1 <= r.sample_rank <= 3 for r in out)
    # membership = first quota ids in (md5, id) order, per stratum
    want_en = set(_md5_order(range(5))[:3])
    assert {r.doc_id for r in out if r.lang == "en"} == want_en
    # deterministic across re-builds
    again = sample_to_mixture(_docs(spark, rows), ["lang"]).collect()
    assert {(r.doc_id, r.sample_rank) for r in again} == {
        (r.doc_id, r.sample_rank) for r in out
    }


def test_mixture_integer_weights_hit_exact_proportions(spark):
    rows = [(i, "en") for i in range(5)] + [(i, "de") for i in range(10, 13)] + [
        (i, "fr") for i in range(20, 29)
    ]
    # W=3; T = min(5*3 div 2, 3*3 div 1) = 7; quotas: en 2*7 div 3 = 4, de 7 div 3 = 2
    out = sample_to_mixture(_docs(spark, rows), ["lang"], weights={"en": 2, "de": 1})
    by_lang = Counter(r.lang for r in out.collect())
    assert by_lang == {"en": 4, "de": 2}  # fr unweighted -> dropped


def test_token_budget_keeps_best_quality_first_exact_boundary(spark):
    rows = [
        (1, "en", 0.9, 10),
        (2, "en", 0.9, 10),
        (3, "de", 0.5, 4),
        (4, "de", 0.5, 4),
        (5, "fr", 0.1, 22),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, lang string, quality_score double, n_tokens int"
    )
    # budget = floor(0.5 * 50) = 25: both 0.9 docs (cum 20), then the
    # md5-first 0.5 doc fits (cum 24) but the second does not (cum 28) --
    # the keep rule is cum <= budget, same as the oracle SQL
    kept = take_token_budget(df, budget_frac=0.5).collect()
    assert len(kept) == 3
    assert {r.doc_id for r in kept if r.quality_score == 0.9} == {1, 2}
    boundary = [r.doc_id for r in kept if r.quality_score == 0.5]
    assert boundary == [_md5_order([3, 4])[0]]  # md5-first of the tied bucket
    assert not [r for r in kept if r.quality_score == 0.1]


def test_token_budget_full_fraction_keeps_everything(spark):
    df = spark.createDataFrame(
        [(1, 0.9, 7), (2, 0.1, 5)], "doc_id bigint, quality_score double, n_tokens int"
    )
    assert take_token_budget(df, budget_frac=1.0).count() == 2
    assert take_token_budget(df, budget_frac=0.0).count() == 0


def test_funnel_survivors_monotone(spark):
    """Cumulative funnel stages can only lose documents, and stage 0 is
    the corpus size."""
    from cdc_streaming_pipeline_spark.plans.docs import corpus_filter_funnel
    from tests.conftest import SF_DIR

    rows = {r.stage_no: r.survivors for r in corpus_filter_funnel(spark, SF_DIR).collect()}
    assert sorted(rows) == [0, 1, 2, 3, 4, 5]
    for i in range(1, 6):
        assert rows[i] <= rows[i - 1], f"stage {i} gained documents"
    from cdc_streaming_pipeline_spark.sources.tables import load_table

    assert rows[0] == load_table(spark, SF_DIR, "documents").count()


def test_novelty_bounds_and_unique_doc(spark):
    """novelty ∈ [0,1]; a doc sharing no shingles with anything scores 1,
    exact duplicates score 0."""
    from cdc_streaming_pipeline_spark.operators.text import novelty_scores

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "one two three four five six seven"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in novelty_scores(df).collect()}
    assert rows[1].novelty == 0.0 and rows[2].novelty == 0.0  # exact dup pair
    assert rows[3].novelty == 1.0  # nothing shared
    assert rows[3].n_novel == rows[3].n_shingles


def test_duplicate_span_removal_semantics(spark):
    from cdc_streaming_pipeline_spark.operators.dedup import duplicate_span_removal
    import hashlib

    shared = "a b c d e f g h"  # exactly one 8-token span
    rows = [
        (1, f"{shared} unique1 tail1"),           # owner (min doc_id): untouched
        (2, f"lead2 {shared} unique2"),           # non-owner: span removed
        (3, "totally different words here only"), # <8 tokens: no grams, untouched
        (4, f"{shared}"),                         # non-owner, fully covered -> empty
    ]
    df = spark.createDataFrame(rows, schema="doc_id bigint, text string")
    out = {r["doc_id"]: r for r in duplicate_span_removal(df, span_tokens=8).collect()}

    assert out[1]["n_removed"] == 0
    assert out[1]["cleaned_fp"] == hashlib.md5(f"{shared} unique1 tail1".encode()).hexdigest()
    assert out[2]["n_removed"] == 8
    assert out[2]["cleaned_fp"] == hashlib.md5(b"lead2 unique2").hexdigest()
    assert out[3]["n_removed"] == 0
    assert out[4]["n_removed"] == 8 and out[4]["n_tokens"] == 8
    assert out[4]["cleaned_fp"] == hashlib.md5(b"").hexdigest()
    assert abs(out[2]["frac_removed"] - 8 / 10) < 1e-9
