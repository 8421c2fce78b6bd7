"""Incremental (batch-vs-corpus) dedup parity — exact and fuzzy."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.operators import dedup as dd
from cdc_streaming_pipeline_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_minhash_incremental_equals_full_pairs_restricted_to_cross(spark):
    """The batch-vs-corpus generator must find exactly the full
    generator's pairs that CROSS the batch/corpus boundary: same banding,
    same signatures, same verify — only the candidate join is restricted,
    so the outputs must agree pair-for-pair (ids are unordered in the
    full generator; normalize to the batch-side orientation)."""
    docs = load_table(spark, SF_DIR, "documents")
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)

    inc = {
        (r.batch_id, r.corpus_id): r.jaccard
        for r in dd.minhash_lsh_incremental(batch, corpus).collect()
    }
    full = {}
    for r in dd.minhash_lsh_pairs(docs).collect():
        a_in_batch = r.id_a % 5 == 0
        b_in_batch = r.id_b % 5 == 0
        if a_in_batch == b_in_batch:
            continue  # within-batch or within-corpus: out of scope
        key = (r.id_a, r.id_b) if a_in_batch else (r.id_b, r.id_a)
        full[key] = r.jaccard
    assert inc == full
    assert inc, "fixture must produce at least one cross pair"


def test_minhash_incremental_plan_never_self_joins_corpus(spark):
    """The corpus side may appear once per verify join but must never
    band-join against itself — candidate cost tracks the BATCH."""
    docs = load_table(spark, SF_DIR, "documents")
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    df = dd.minhash_lsh_incremental(batch, corpus)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert all(r.batch_id % 5 == 0 and r.corpus_id % 5 != 0 for r in rows)
