"""Data selection for LLM pretraining: hashed n-gram importance weights.

Implements the DSIR estimator (Data Selection via Importance Resampling,
Xie et al. 2023, public method): score every raw document by how much
more likely its hashed n-gram features are under a TARGET distribution
(a trusted high-quality slice) than under the RAW corpus distribution —
log w(x) = Σ_f n_f(x) · [log p_target(f) − log p_raw(f)] with
unit-mass Laplace smoothing over a fixed feature-hash space (see
``dsir_importance_weights``). Documents are then kept by
weighted sampling (or a threshold) to shift the corpus toward the
target domain without training a classifier.

Spark-first shape (reference has no counterpart; this is the
training-data-pipeline surface the brief asks for):
- features are unigrams + bigrams hashed with xxhash64 into a FIXED
  number of buckets — the feature table is bounded by ``n_buckets``
  regardless of corpus size, which is what makes the whole estimator
  one broadcast join at 100 TB;
- one explode + groupBy builds (doc, feature, count) with map-side
  combine; ONE aggregation over it yields the per-feature target/raw
  counts; the log-ratio table (≤ n_buckets rows) broadcasts back onto
  the per-doc features; one final groupBy sums the weights.
  Three shuffles total, each on bounded or pre-reduced keys; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.functions.textfn import normalize_ws, tokens


def _hashed_ngram_counts(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target_col: Column,
    n_buckets: int,
) -> DataFrame:
    """(_id, _is_target, f, n): per-document hashed uni+bigram counts.
    The tokenize→gram→hash chain is staged across projection
    boundaries (the HOF re-eval trap — see dedup._shingle_hash_frame)."""
    toks = tokens(normalize_ws(F.col(text_col)))
    staged = df.select(
        F.col(id_col).alias("_id"),
        target_col.cast("boolean").alias("_is_target"),
        toks.alias("_toks"),
    )
    # bigrams only when >= 2 tokens: sequence(0, greatest(size-2, 0))
    # always yields one index, so a 1-token doc would emit its unigram
    # TWICE (degenerate bigram) and an empty doc an empty-string feature
    # — deviations from the DSIR uni+bigram definition (r11 ADVICE)
    bi_idx = F.sequence(F.lit(0), F.size("_toks") - 2)
    bigrams = F.when(
        F.size("_toks") >= 2,
        F.transform(
            bi_idx, lambda i: F.array_join(F.slice(F.col("_toks"), i + 1, 2), " ")
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = staged.select(
        "_id",
        "_is_target",
        F.concat(F.col("_toks"), bigrams).alias("_grams"),
    )
    feats = grams.select(
        "_id",
        "_is_target",
        F.explode(
            F.transform(
                "_grams", lambda g: F.pmod(F.xxhash64(g), F.lit(n_buckets))
            )
        ).alias("f"),
    )
    return feats.groupBy("_id", "_is_target", "f").agg(F.count("*").alias("n"))


def dsir_importance_weights(
    df: DataFrame,
    target_col: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """Per-document DSIR log-importance weight against the target slice.

    Returns (id_col, n_features, log_weight) where ``n_features`` is the
    document's total feature count (Σ n_f — unigrams + bigrams) and
    ``log_weight`` = Σ_f n_f · [log(t_f+α)/(T+1) − log(r_f+α)/(R+1)]
    with α = 1/n_buckets, rounded to 4 decimals (t/r = target/raw
    feature counts, T/R their totals). Laplace smoothing with UNIT
    total pseudo-mass (α·B = 1), not add-1: add-1 injects B
    pseudo-counts, which swamps the estimated distributions whenever
    the corpus is small relative to the hash space and — because the
    target is a subset of raw, so r_f ≥ t_f — drags every weight
    negative. α = 1/B keeps the smoothing mass fixed at one
    pseudo-document regardless of B, so the estimator is invariant to
    the bucket-count knob. Positive ⇒ the document looks more like the
    target slice than the average raw document."""
    feats = _hashed_ngram_counts(df, text_col, id_col, target_col, n_buckets)
    per_f = feats.groupBy("f").agg(
        F.sum("n").alias("r_f"),
        F.sum(F.when(F.col("_is_target"), F.col("n")).otherwise(F.lit(0))).alias("t_f"),
    )
    # two corpus scalars — ONE bounded collect (a single row), never the data
    tot = per_f.agg(
        F.sum("r_f").alias("R"), F.sum("t_f").alias("T")
    ).collect()[0]
    alpha = 1.0 / n_buckets
    ratio = per_f.select(
        "f",
        (
            F.log((F.col("t_f") + F.lit(alpha)) / F.lit(float(tot["T"] + 1)))
            - F.log((F.col("r_f") + F.lit(alpha)) / F.lit(float(tot["R"] + 1)))
        ).alias("_lr"),
    )
    return (
        feats.join(F.broadcast(ratio), "f")
        .groupBy("_id")
        .agg(
            F.sum("n").alias("n_features"),
            F.round(F.sum(F.col("n") * F.col("_lr")), 4).alias("log_weight"),
        )
        .select(F.col("_id").alias(id_col), "n_features", "log_weight")
    )


def dsir_select(
    df: DataFrame,
    target_col: Column,
    keep_fraction: float = 0.25,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """Top-``keep_fraction`` selection by DSIR weight (deterministic
    threshold selection — the resampling variant adds Gumbel noise;
    thresholding keeps the oracle exact), ties broken by lowest id.

    Scale note: ``orderBy(...).limit(n)`` plans as
    TakeOrderedAndProject — a distributed per-partition top-n followed
    by a bounded merge, NOT a global sort; a global-window row_number
    (one task holding the corpus) is exactly what this avoids."""
    w = dsir_importance_weights(df, target_col, text_col, id_col, n_buckets)
    n_keep = int(-(-w.count() * keep_fraction // 1))  # ceil, bounded action
    return (
        w.orderBy(F.col("log_weight").desc(), F.col(id_col).asc())
        .limit(n_keep)
        .select(id_col, "n_features", "log_weight")
    )
