"""Similarity search over embedding columns (array<float>).

Three paths:

- brute-force cosine top-k (exact): the query set — small by contract —
  is collected and broadcast as a normalized numpy matrix; the corpus is
  scanned once with ``mapInPandas`` doing an Arrow-batched GEMM
  (batch × queries) and emitting per-batch top-k candidates; a tiny global
  window pass finishes the ranking. The corpus never shuffles and never
  reaches the driver — linear in corpus size at any scale.
- exact cosine near-dup pairs: the correctness BASELINE. One side is
  collected/broadcast, so it is bounded to corpora that fit a broadcast
  (~1e6 × small dim); the registered scale path is the LSH variant below.
- LSH (random hyperplanes): sign-bit bucket keys per table; candidates =
  bucket collisions; exact cosine re-rank/verify. Fully distributed —
  the 100 TB path for both top-k and near-dup.

Recall math for hyperplane LSH (used to pick defaults): a pair at angle
θ collides in one table with p = (1 - θ/π)^n_bits; recall after L tables
is 1 - (1-p)^L. With n_bits=4, L=16: cosine 0.95 → recall ≈ 1-5e-8;
cosine 0.4 → ≈ 0.94. Raise n_bits (sparser buckets, cheaper join) when
only high-similarity pairs matter. Recall is measured against the exact
baselines in tests/test_similarity_recall.py.

Hyperplanes come from a fixed numpy seed → fully deterministic.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_streaming_pipeline_spark.functions.vector import cosine_pd


def _normalized_matrix(rows: list, dtype=np.float64) -> tuple[np.ndarray, np.ndarray]:
    """(ids, row-normalized matrix) from collected (id, vector) rows."""
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([list(r[1]) for r in rows], dtype=dtype)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0.0] = 1.0
    return ids, mat / norms[:, None]


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    The query matrix is broadcast; each Arrow batch of the corpus computes
    its similarities in one numpy GEMM and yields only its local top-k per
    query (selection order (cosine desc, id asc) is total, so the global
    top-k is contained in the union of per-batch top-k). The final window
    ranks n_queries × k × n_batches rows — negligible.
    """
    spark = corpus.sparkSession
    q_ids, q_mat = _normalized_matrix(queries.select(id_col, vec_col).collect())
    bc = spark.sparkContext.broadcast((q_ids, q_mat))
    take = k + (1 if exclude_self else 0)

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_q, mat_q = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            ids_c = pdf[id_col].to_numpy(dtype=np.int64)
            mat_c = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(mat_c, axis=1)
            norms[norms == 0.0] = 1.0
            sims = np.round((mat_c / norms[:, None]) @ mat_q.T, 4)  # (batch, nq)
            out_q, out_n, out_s = [], [], []
            for j, qid in enumerate(ids_q):
                col = sims[:, j]
                order = np.lexsort((ids_c, -col))[:take]
                out_q.extend([qid] * len(order))
                out_n.extend(ids_c[order])
                out_s.extend(col[order])
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "cosine": out_s})

    cand = corpus.select(id_col, vec_col).mapInPandas(
        per_batch, "query_id long, neighbor_id long, cosine double"
    )
    if exclude_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
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

    The correctness baseline the LSH variant is measured against: the full
    (normalized) matrix is broadcast and each Arrow batch GEMMs against it.
    All pairs are examined — use only where one broadcast side fits memory;
    ``cosine_near_dup_lsh`` is the registered scale path.
    """
    spark = df.sparkSession
    ids_all, mat_all = _normalized_matrix(df.select(id_col, vec_col).collect())
    bc = spark.sparkContext.broadcast((ids_all, mat_all))

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_r, mat_r = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            ids_l = pdf[id_col].to_numpy(dtype=np.int64)
            mat_l = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(mat_l, axis=1)
            norms[norms == 0.0] = 1.0
            sims = np.round((mat_l / norms[:, None]) @ mat_r.T, 4)
            li, ri = np.nonzero((sims >= threshold) & (ids_l[:, None] < ids_r[None, :]))
            yield pd.DataFrame(
                {"id_a": ids_l[li], "id_b": ids_r[ri], "cosine": sims[li, ri]}
            )

    return df.select(id_col, vec_col).mapInPandas(
        per_batch, "id_a long, id_b long, cosine double"
    )


def _hyperplanes(dim: int, n_bits: int, n_tables: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, dim))


def _probe_dim(df: DataFrame, vec_col: str) -> int | None:
    first = df.select(vec_col).first()
    return None if first is None else len(first[0])


def _bucketize(df: DataFrame, id_col: str, vec_col: str, id_alias: str, planes: np.ndarray) -> DataFrame:
    """(id, table, sign-bit bucket key) per hyperplane table.

    All L×n_bits hyperplane dots for an Arrow batch are ONE numpy GEMM
    (batch × planes), then sign bits pack into per-table integer keys.
    Output carries ids + keys only — 3 longs/row through the bucket join,
    never the vectors (they are re-attached after the candidate distinct).
    """
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(planes)
    n_tables, n_bits, _ = planes.shape

    def keys(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        plane_mat = bc.value.reshape(n_tables * n_bits, -1)  # (L*B, D)
        weights = (1 << np.arange(n_bits, dtype=np.int64))
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            bits = (mat @ plane_mat.T) > 0  # (n, L*B)
            per_table = bits.reshape(len(ids), n_tables, n_bits) @ weights  # (n, L)
            yield pd.DataFrame(
                {
                    id_alias: np.repeat(ids, n_tables),
                    "tbl": np.tile(np.arange(n_tables, dtype=np.int32), len(ids)),
                    "key": per_table.reshape(-1),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(keys, f"{id_alias} long, tbl int, key long")


def _attach_vectors(
    cand: DataFrame, df: DataFrame, id_col: str, vec_col: str, mapping: dict[str, str]
) -> DataFrame:
    """Join the vectors back onto deduped candidate ids: {cand_id_col: vec_alias}."""
    for cand_id, vec_alias in mapping.items():
        side = df.select(F.col(id_col).alias(cand_id), F.col(vec_col).alias(vec_alias))
        cand = cand.join(side, cand_id)
    return cand


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    n_bits: int = 4,
    n_tables: int = 24,
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH candidate generation +
    exact cosine re-rank.

    Corpus is hashed once per table (L×n rows), joined to query buckets on
    (table, key) — candidate count ≈ collisions, not |corpus|×|queries|.
    This is the 100 TB path: the corpus-side work is a linear scan +
    equi-join on a 64-bit key.

    Defaults are tuned for the hard regime where top-k neighbors sit at
    cosine ~0.25-0.5 (near-orthogonal corpora like the driver testdata):
    measured recall@5 = 0.94 (n=500) / 1.00 (n=500, sf0.01) vs brute force.
    In that regime candidate volume is necessarily ~O(n) per query — no
    sublinear ANN exists without cluster structure. On realistically
    clustered embeddings (neighbors at cosine ≥0.8) raise n_bits to 8-16:
    buckets sharpen and the candidate set collapses to near-k.

    ``dim`` defaults to the corpus's actual vector length (one-row probe);
    a wrong dim would NULL the hyperplane dots and collapse every bucket
    key to 0, degenerating LSH into a cross join.
    """
    if dim is None:
        dim = _probe_dim(corpus, vec_col)
        if dim is None:
            return brute_force_topk(corpus, queries, k, id_col, vec_col, exclude_self)
    planes = _hyperplanes(dim, n_bits, n_tables, seed)
    cb = _bucketize(corpus, id_col, vec_col, "neighbor_id", planes)
    qb = _bucketize(queries, id_col, vec_col, "query_id", planes)
    cand = (
        cb.join(F.broadcast(qb), ["tbl", "key"])
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    if exclude_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    cand = _attach_vectors(
        cand, corpus, id_col, vec_col, {"neighbor_id": "c_vec"}
    )
    cand = _attach_vectors(
        cand, F.broadcast(queries), id_col, vec_col, {"query_id": "q_vec"}
    )
    sim = cand.withColumn("cosine", cosine_pd(F.col("q_vec"), F.col("c_vec")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def cosine_near_dup_lsh(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    n_bits: int = 4,
    n_tables: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine — the registered scale path.

    Plan shape: hash every vector into L bucket tables (linear scan),
    self-equi-join on (table, bucket key) to generate candidates, distinct
    the pair ids, then verify with the exact cosine — so there are NO false
    positives; recall (vs ``cosine_near_dup_exact``) follows the module
    docstring's formula and is asserted in tests. Shuffles: the bucket join
    and the pair distinct — no all-pairs stage anywhere.

    Default (n_bits=4, n_tables=16) holds recall ≈0.94 down to cosine 0.4;
    for strictly-high thresholds (≥0.9) prefer n_bits=8+ for sparser,
    cheaper buckets.
    """
    if dim is None:
        dim = _probe_dim(df, vec_col)
        if dim is None:
            return cosine_near_dup_exact(df, threshold, id_col, vec_col)
    planes = _hyperplanes(dim, n_bits, n_tables, seed)
    b = _bucketize(df, id_col, vec_col, "_id", planes)
    cand = (
        b.alias("a")
        .join(
            b.alias("b"),
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    cand = _attach_vectors(cand, df, id_col, vec_col, {"id_a": "va", "id_b": "vb"})
    return (
        cand.withColumn("cosine", cosine_pd(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
