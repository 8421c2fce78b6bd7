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


# ---------------------------------------------------------------- chunking --

def test_chunk_documents_covers_every_token_and_pins_tail(spark):
    from cdc_streaming_pipeline_spark.operators.text import chunk_documents

    # 150 tokens: strided starts 1, 49, 97 (last full-window start is
    # 150-64+1 = 87, so the pinned tail chunk starts there)
    text = " ".join(f"tok{i}" for i in range(1, 151))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = sorted(
        chunk_documents(df, chunk_tokens=64, stride=48).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert [r.start_token for r in out] == [1, 49, 87]
    assert [r.chunk_idx for r in out] == [0, 1, 2]
    assert all(r.n_chunk_tokens == 64 for r in out)
    covered = set()
    for r in out:
        covered.update(range(r.start_token, r.start_token + r.n_chunk_tokens))
    assert covered == set(range(1, 151))


def test_chunk_documents_short_doc_single_chunk_and_md5(spark):
    import hashlib

    from cdc_streaming_pipeline_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(7, "Alpha  Beta\tGamma"), (8, "   ")], "doc_id long, text string"
    )
    out = chunk_documents(df, chunk_tokens=64, stride=48).collect()
    assert len(out) == 1  # blank doc emits no chunks
    (r,) = out
    assert (r.doc_id, r.chunk_idx, r.start_token, r.n_chunk_tokens) == (7, 0, 1, 3)
    assert r.chunk_md5 == hashlib.md5(b"alpha beta gamma").hexdigest()


def test_chunk_documents_aligned_tail_not_duplicated(spark):
    from cdc_streaming_pipeline_spark.operators.text import chunk_documents

    # n=112: last = 112-64+1 = 49 which IS on the stride grid (1, 49) —
    # the pinned tail must dedup against the strided start
    text = " ".join(f"t{i}" for i in range(112))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=64, stride=48).collect()
    assert sorted(r.start_token for r in out) == [1, 49]


# ------------------------------------------------------ incremental dedup --

def test_incremental_dedup_drops_known_and_collapses_batch_dups(spark):
    from cdc_streaming_pipeline_spark.operators.dedup import incremental_exact_dedup

    existing = spark.createDataFrame(
        [(1, "already landed doc"), (2, "another old doc")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "Already   landed DOC"),  # dup of corpus (normalized) -> dropped
            (11, "fresh doc"),
            (12, "fresh doc"),  # within-batch dup -> collapsed to id 11
            (13, "unique newcomer"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.n_copies for r in incremental_exact_dedup(batch, existing).collect()}
    assert out == {11: 2, 13: 1}


# ------------------------------------------------------- shard assignment --

def test_shard_assignment_dense_positions_and_md5_order(spark):
    import hashlib

    from cdc_streaming_pipeline_spark.operators.sampling import shard_assignment

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    out = shard_assignment(df, n_shards=4).collect()
    assert len(out) == 200 and len({r.doc_id for r in out}) == 200
    by_shard: dict[int, list] = {}
    for r in out:
        h = hashlib.md5(str(r.doc_id).encode()).hexdigest()
        assert r.shard_id == int(h[:8], 16) % 4
        by_shard.setdefault(r.shard_id, []).append((r.shard_pos, h, r.doc_id))
    for rows in by_shard.values():
        rows.sort()
        # dense 0..n-1 positions, ordered by (md5, id)
        assert [p for p, _, _ in rows] == list(range(len(rows)))
        assert [h for _, h, _ in rows] == sorted(h for _, h, _ in rows)


# ----------------------------------------------------------- quality logit --

def test_quality_logit_matches_python_reference(spark):
    import math
    import re

    from cdc_streaming_pipeline_spark.operators.text import (
        QUALITY_LOGIT_BIAS,
        QUALITY_LOGIT_WEIGHTS,
        with_quality_logit,
    )

    text = "The cat and the dog, with 42 bones (shared)."
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    (r,) = with_quality_logit(df).collect()

    toks = re.split(r"\s+", text.strip())
    n_tok = float(len(toks))
    diversity = len(set(toks)) / max(n_tok, 1)
    stop_hits = len(
        re.findall(r"\b(?:the|and|of|to|in|is|that|for|with|was)\b", text.lower())
    )
    punct = sum(ch in ".,!?;:'\"()[]-" for ch in text) / len(text)
    digit = sum(ch.isdigit() for ch in text) / len(text)
    w = QUALITY_LOGIT_WEIGHTS
    z = (
        QUALITY_LOGIT_BIAS
        + w[0] * math.log1p(n_tok)
        + w[1] * diversity
        + w[2] * (stop_hits / max(n_tok, 1.0))
        + w[3] * punct
        + w[4] * digit
    )
    assert abs(r.logit - round(z, 4)) < 1e-9
    assert abs(r.p_keep - round(1 / (1 + math.exp(-z)), 4)) < 1e-9
    assert r.keep == (1 / (1 + math.exp(-z)) >= 0.5)


# ---------------------------------------------------------------- cleaning --

def test_clean_text_rules_on_dirty_input(spark):
    import hashlib

    from cdc_streaming_pipeline_spark.operators.text import clean_text

    dirty = "  a\x00b\x07c  \t d  \n\n\n\n line2\t\x7f end  "
    # strip control chars -> "  abc  \t d  \n\n\n\n line2\t end  "
    # collapse space/tab runs -> " abc d \n\n\n\n line2 end "
    # trim line edges -> "abc d\n\n\n\nline2 end"
    # cap blank runs -> "abc d\n\nline2 end"
    want = "abc d\n\nline2 end"
    df = spark.createDataFrame([(1, dirty)], "doc_id long, text string")
    (r,) = clean_text(df).collect()
    assert r.clean_md5 == hashlib.md5(want.encode()).hexdigest()
    assert r.n_chars_raw == len(dirty)
    assert r.n_chars_clean == len(want)
    assert r.n_removed == len(dirty) - len(want)


def test_compression_ratio_matches_zlib_and_ranks_repetition(spark):
    import zlib

    from cdc_streaming_pipeline_spark.operators.text import compression_ratio_scores

    rows = [(1, "the quick brown fox jumps over the lazy dog and keeps going"),
            (2, "spam " * 200),
            (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in compression_ratio_scores(df).collect()}
    for i, t in rows:
        b = t.encode()
        assert out[i].n_bytes == len(b)
        assert out[i].n_compressed == len(zlib.compress(b, 6))
        want = round(len(zlib.compress(b, 6)) / len(b), 4) if b else 0.0
        assert abs(out[i].compression_ratio - want) < 1e-12
    # repetitive text compresses far better than prose
    assert out[2].compression_ratio < out[1].compression_ratio / 2


def test_leakage_safe_split_groups_never_straddle(spark):
    """The group-keyed split's whole point: every doc sharing a
    bag-of-words fingerprint lands in the SAME split, so cross-split
    exact/bow contamination is structurally zero."""
    from pyspark.sql import functions as F

    from cdc_streaming_pipeline_spark.operators import sampling as sp
    from cdc_streaming_pipeline_spark.operators import text as tx
    from cdc_streaming_pipeline_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    fps = tx.with_fingerprint(docs)
    b = sp.md5_bucket(F.col("fp_bow"), 100)
    split = (
        F.when(b < 80, F.lit("train"))
        .when(b < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    per_group = (
        fps.withColumn("split", split)
        .groupBy("fp_bow")
        .agg(F.count_distinct("split").alias("n_splits"))
    )
    assert per_group.filter(F.col("n_splits") > 1).count() == 0


def test_bigram_nll_detects_word_salad(spark):
    """The bigram LM's reason to exist: the same tokens in a repeated
    natural order score LOW (seen transitions), while a doc cycling
    through rare cross-words scores HIGH — and a two-token doc with the
    corpus's dominant transition sits below one with a never-repeated
    transition."""
    from cdc_streaming_pipeline_spark.operators.text import bigram_lm_scores

    rows = [
        (1, " ".join(["the quick fox"] * 30)),          # repeated natural phrase
        (2, " ".join(f"w{i % 17} z{i % 13}" for i in range(30))),  # churn
        (3, "the quick"),                               # dominant transition
        (4, "fox z9"),                                  # rare transition
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.bigram_nll for r in bigram_lm_scores(df).collect()}
    assert got[1] < got[2]
    assert got[3] < got[4]
