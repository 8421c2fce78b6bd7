"""Persisted inverted index + partition-pruned keyword search.

The retrieval-side counterpart of the dedup/ANN family: build once —
tokenize the corpus, aggregate per-(token, doc) term frequencies, and
write the postings PARTITIONED BY TOKEN HASH-BUCKET with the document
frequencies alongside — then serve many: a query for a handful of terms
reads ONLY those terms' bucket partitions (partition pruning on the
bucket column), so at 100 TB the serving scan is n_query_buckets /
n_buckets of the postings, not the corpus and not even the full index.
Scoring is classic tf-idf (``tf · ln(N/df)``), fully SQL-replicable so
the whole serve path is oracle-certifiable.

Build cost: one corpus scan + one shuffle to (doc, token) counts + one
to per-token document frequencies — the same shape as doc_tfidf. The
postings write is append-friendly: a new corpus batch unions its
per-batch postings into the same bucket layout (df re-aggregation is a
bucket-local merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.functions.textfn import normalize_ws, tokens


def build_postings(
    docs: DataFrame,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(token, bucket, doc_id, tf, df) — df denormalized onto each
    posting so serving needs no second lookup; the duplication is
    bounded by the posting count itself."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(normalize_ws(F.col(text_col)))).alias("pos", "token"),
    ).filter(F.col("token") != "")
    # positions make the index POSITIONAL (phrase queries); the
    # collect_list is bounded per (doc, token) by the document's own
    # length — a per-doc bound, never a corpus-scaled one.
    tf = toks.groupBy("doc_id", "token").agg(
        F.count("*").alias("tf"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
    )
    # df (and doc length) via groupBy+join, NOT a per-token window: a
    # stop-word's window partition is df rows in ONE task (10^9 for
    # "the" at corpus scale); the aggregates are map-side combinable
    # and AQE splits a skewed join.
    df_tbl = tf.groupBy("token").agg(F.count("*").alias("df"))
    len_tbl = tf.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    return (
        tf.join(df_tbl, "token")
        .join(len_tbl, "doc_id")
        .select(
            "token",
            F.pmod(F.xxhash64("token"), F.lit(n_buckets)).cast("int").alias("bucket"),
            "doc_id",
            "tf",
            "df",
            "doc_len",
            "positions",
        )
    )


def write_inverted_index(
    docs: DataFrame,
    path: str,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """Write the bucket-partitioned postings plus the corpus size (the
    one scalar tf-idf needs). Returns the corpus document count."""
    spark = docs.sparkSession
    postings = build_postings(docs, n_buckets, id_col, text_col)
    postings.write.mode("overwrite").partitionBy("bucket").parquet(path)
    n_docs = docs.select(id_col).distinct().count()
    avgdl = (
        spark.read.parquet(path)
        .select("doc_id", "doc_len")
        .distinct()
        .agg(F.avg("doc_len"))
        .collect()[0][0]
    )
    spark.createDataFrame(
        [(n_docs, float(avgdl))], "n_docs long, avgdl double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path.rstrip('/')}._stats")
    return n_docs


def search_topk(
    spark: SparkSession,
    path: str,
    terms: list[str],
    k: int = 10,
    mode: str = "any",
    ranking: str = "tfidf",
    n_buckets: int = 64,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for ``terms``, reading only the query terms'
    bucket partitions. ``mode='all'`` keeps only documents matching
    EVERY term (AND semantics); ``'any'`` is the OR query.
    ``ranking='tfidf'`` sums ``tf·ln(N/df)``; ``'bm25'`` is
    Okapi BM25 (idf ``ln(1+(N-df+0.5)/(df+0.5))``, tf saturation k1,
    length normalization b against the corpus avgdl stored in the
    index). Ties break on doc_id for a fully deterministic ranking."""
    if mode not in ("any", "all"):
        raise ValueError(f"mode must be any|all, got {mode!r}")
    if ranking not in ("tfidf", "bm25"):
        raise ValueError(f"ranking must be tfidf|bm25, got {ranking!r}")
    stats = spark.read.parquet(f"{path.rstrip('/')}._stats").collect()[0]
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    # bucket ids for the query terms: same hash expression as the build,
    # evaluated over the bounded term list
    term_rows = spark.createDataFrame([(t,) for t in terms], "token string").select(
        "token", F.pmod(F.xxhash64("token"), F.lit(n_buckets)).cast("int").alias("bucket")
    ).collect()
    buckets = sorted({r["bucket"] for r in term_rows})
    postings = (
        spark.read.parquet(path)
        .filter(F.col("bucket").isin(buckets))  # -> PartitionFilters
        .filter(F.col("token").isin(terms))
    )
    tf, df = F.col("tf").cast("double"), F.col("df").cast("double")
    if ranking == "tfidf":
        contrib = tf * F.log(F.lit(float(n_docs)) / df)
    else:
        idf = F.log(1.0 + (F.lit(float(n_docs)) - df + 0.5) / (df + 0.5))
        norm = tf + k1 * (1.0 - b + b * F.col("doc_len").cast("double") / avgdl)
        contrib = idf * (tf * (k1 + 1.0)) / norm
    scored = postings.groupBy("doc_id").agg(
        F.count("*").alias("n_terms_matched"),
        F.round(F.sum(contrib), 4).alias("score"),
    )
    if mode == "all":
        scored = scored.filter(F.col("n_terms_matched") == len(set(terms)))
    return (
        scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "n_terms_matched", "score")
    )


def phrase_search(
    spark: SparkSession,
    path: str,
    phrase: list[str],
    k: int = 10,
    n_buckets: int = 64,
) -> DataFrame:
    """Exact phrase matching from the positional postings: a document
    contains the phrase at position p iff term_i appears at p+i for
    every i, so the occurrence set is the intersection of each term's
    position list shifted left by its phrase offset. One pruned read of
    the phrase terms' buckets, then |phrase| bounded joins on doc_id
    with JVM ``array_intersect`` folds — the candidate set shrinks
    monotonically (docs must contain EVERY term), and position payloads
    are per-doc bounded. Returns (doc_id, n_occurrences), top-k by
    occurrence count with deterministic tie-break."""
    if not phrase:
        raise ValueError("phrase must be non-empty")
    term_rows = spark.createDataFrame(
        [(t,) for t in set(phrase)], "token string"
    ).select(
        "token",
        F.pmod(F.xxhash64("token"), F.lit(n_buckets)).cast("int").alias("bucket"),
    ).collect()
    buckets = sorted({r["bucket"] for r in term_rows})
    postings = (
        spark.read.parquet(path)
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("token").isin(list(set(phrase))))
        .select("token", "doc_id", "positions")
    )
    acc = None
    for i, term in enumerate(phrase):
        shifted = postings.filter(F.col("token") == term).select(
            "doc_id",
            F.transform("positions", lambda x: x - i).alias(f"_p{i}"),
        )
        if acc is None:
            acc = shifted.withColumnRenamed("_p0", "_hits")
        else:
            acc = acc.join(shifted, "doc_id").select(
                "doc_id",
                F.array_intersect("_hits", f"_p{i}").alias("_hits"),
            )
    matched = acc.select("doc_id", F.size("_hits").alias("n_occurrences")).filter(
        F.col("n_occurrences") > 0
    )
    return matched.orderBy(
        F.col("n_occurrences").desc(), F.col("doc_id").asc()
    ).limit(k)
