"""Similarity search over embedding columns (array<float>).

Two paths:
- brute-force cosine top-k: exact baseline. Queries broadcast (small side),
  corpus scanned once, per-query top-k via window. Scales linearly in
  corpus size × queries — right answer for small query sets at any corpus
  scale because the corpus never shuffles.
- LSH-bucketed ANN (random hyperplanes): sign-bit bucket key per table;
  candidates = bucket collisions across L tables; exact cosine re-rank.
  Approximate — recall measured against the brute-force baseline in tests.

Vector math is JVM-side (zip_with/aggregate in double precision).
Hyperplanes are generated from a fixed numpy seed → fully deterministic.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_streaming_pipeline_spark.functions.vector import cosine_similarity


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    `queries` is broadcast — the corpus-side scan is shuffle-free; the only
    shuffle is the per-query top-k window over (n_queries × k·ish) rows
    after similarity filtering... (window input is n_queries × corpus; at
    100 TB use the LSH path or pre-aggregate with a partial top-k, below).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    pairs = c.crossJoin(F.broadcast(q))
    if exclude_self:
        pairs = pairs.filter(F.col("neighbor_id") != F.col("query_id"))
    sim = pairs.withColumn(
        "cosine", F.round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), 4)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def cosine_near_dup_exact(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding near-dup pairs (cosine ≥ threshold, id_a < id_b).
    O(n²) — the correctness baseline the LSH variant is measured against."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine_similarity(F.col("va"), F.col("vb")), 4))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _hyperplanes(dim: int, n_bits: int, n_tables: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, dim))


def _bucket_key(vec: Column, planes: np.ndarray) -> Column:
    """Sign-bit bucket key for one hyperplane table: bit i = (vec·plane_i)>0."""
    key = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(x)) for x in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        key = key.bitwiseXOR(F.shiftleft(F.when(dot > 0, F.lit(1)).otherwise(F.lit(0)).cast("long"), i))
    return key


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    n_bits: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH candidate generation +
    exact cosine re-rank.

    Corpus is hashed once per table (L×n rows), joined to query buckets on
    (table, key) — candidate count ≈ collisions, not |corpus|×|queries|.
    This is the 100 TB path: the corpus-side work is a linear scan +
    equi-join on a 64-bit key.

    ``dim`` defaults to the corpus's actual vector length (one-row probe).
    A wrong dim would make zip_with pad with nulls → NULL hyperplane dots →
    every bucket key collapsing to 0 (LSH degenerating to a cross join), so
    a mismatch fails loudly instead.
    """
    if dim is None:
        first = corpus.select(vec_col).first()
        if first is None:
            return brute_force_topk(corpus, queries, k, id_col, vec_col, exclude_self)
        dim = len(first[0])
    planes = _hyperplanes(dim, n_bits, n_tables, seed)

    def bucketize(df: DataFrame, ident: str, vec_alias: str) -> DataFrame:
        keyed = df.select(
            F.col(id_col).alias(ident),
            F.col(vec_col).alias(vec_alias),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("tbl"),
                            _bucket_key(F.col(vec_col), planes[t]).alias("key"),
                        )
                        for t in range(n_tables)
                    ]
                )
            ).alias("tk"),
        )
        return keyed.select(ident, vec_alias, F.col("tk.tbl").alias("tbl"), F.col("tk.key").alias("key"))

    cb = bucketize(corpus, "neighbor_id", "c_vec")
    qb = bucketize(queries, "query_id", "q_vec")
    cand = cb.join(F.broadcast(qb), ["tbl", "key"]).dropDuplicates(
        ["query_id", "neighbor_id"]
    )
    if exclude_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    sim = cand.withColumn(
        "cosine", F.round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), 4)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )
