"""Deterministic sampling operators for training-data pipelines.

Sampling a 100 TB corpus must be (a) single-pass, (b) reproducible across
reruns and engines, and (c) free of driver-side state. Both operators here
key off md5 of the row id — a portable hash every engine computes
identically (unlike engine-native hash functions), so the SAME sample
falls out of Spark, the DuckDB oracle, or any future backfill job.

- ``hash_bucket_sample``: rate-based sampling — keep rows whose
  hash-bucket (md5 mod 100) falls under the rate. Pure per-row predicate:
  no shuffle, pushes down to a scan filter, trivially composable with
  stratification by just reporting the stratum columns.
- ``topn_per_stratum``: fixed-size per-stratum sample ("deterministic
  reservoir"): rank rows within each stratum by their hash and keep the
  first n. One window shuffle on the stratum key; skewed strata are
  bounded by n on output (the sort itself is the cost — for extreme skew
  pre-filter with ``hash_bucket_sample`` at a safe over-sampling rate
  first, then rank).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def md5_bucket(id_col: Column, buckets: int = 100) -> Column:
    """Deterministic, engine-portable hash bucket in [0, buckets): the
    first 8 hex digits of md5(id-as-string) interpreted as an integer.
    DuckDB twin: CAST(('0x' || substr(md5(x::VARCHAR), 1, 8)) AS UBIGINT) % n.
    """
    first8 = F.substring(F.md5(id_col.cast("string")), 1, 8)
    return F.conv(first8, 16, 10).cast("long") % buckets


def hash_bucket_sample(
    df: DataFrame,
    rate_pct: int = 20,
    id_col: str = "doc_id",
    buckets: int = 100,
) -> DataFrame:
    """Keep rows whose md5 bucket < rate_pct — a reproducible ~rate_pct%
    sample with zero shuffle (the predicate evaluates at the scan)."""
    return df.withColumn("bucket", md5_bucket(F.col(id_col), buckets)).filter(
        F.col("bucket") < rate_pct
    )


PACK_SHARD_STRIDE = 1 << 40  # shard id lives above bit 40 of pack_id


def pack_sequences(
    df: DataFrame,
    capacity: int = 512,
    id_col: str = "doc_id",
    size_col: str = "n_tokens",
    n_shards: int = 1,
) -> DataFrame:
    """Assign documents to fixed-capacity training sequences ("packing").

    Chunked-cumsum packing: documents are taken in id order and a sequence
    boundary falls wherever the running token total crosses a capacity
    multiple — the standard distributed approximation of greedy bin
    packing (exact greedy is inherently sequential; this is one window
    cumsum, deterministic, and within one oversize-doc of greedy's bin
    count). A document contributes at most ``capacity`` to the running
    total and is assigned to the bin of its START offset — so an oversize
    document fills (and may share) that bin rather than getting a private
    one; consumers clip/split it at load time. The id ordering makes packs
    stable across engines and reruns.

    ``n_shards > 1`` is the scale path: rows are sharded by the
    engine-portable md5 bucket of their id and the cumsum window is
    PARTITIONED by shard, so shards pack concurrently (no global sort, no
    single-task window — the plan shows no Exchange SinglePartition).
    pack_id = shard * 2^40 + shard-local bin, keeping ids disjoint without
    any cross-shard coordination; cum_tokens is shard-local. Bin-fill
    invariants are per-shard identical to the global form (asserted in
    tests/test_sampling_pack.py); per-shard bin counts add at most one
    underfull tail bin each, so choose n_shards ≈ cluster parallelism,
    orders of magnitude below the bin count at 100 TB.
    """
    eff = F.least(F.col(size_col), F.lit(capacity))
    shard = (
        md5_bucket(F.col(id_col), n_shards).cast("long")
        if n_shards > 1
        else F.lit(0).cast("long")
    )
    out = df.withColumn("shard", shard)
    w = Window.partitionBy("shard").orderBy(F.col(id_col).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.sum(eff).over(w)
    return out.withColumn(
        "pack_id",
        F.col("shard") * PACK_SHARD_STRIDE + F.floor((cum - eff) / capacity),
    ).withColumn("cum_tokens", cum)


def topn_per_stratum(
    df: DataFrame,
    strata: list[str],
    n: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """First n rows per stratum in md5-hash order (ties broken by id) —
    a fixed-size uniform-without-replacement sample per group whose
    membership is stable across engines and reruns."""
    w = Window.partitionBy(*strata).orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return df.withColumn("sample_rank", F.row_number().over(w)).filter(
        F.col("sample_rank") <= n
    )


def take_token_budget(
    df: DataFrame,
    budget_frac: float = 0.5,
    quality_col: str = "quality_score",
    size_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy best-quality-first corpus selection under a token budget:
    keep documents in (quality DESC, md5(id), id) order while the running
    token sum stays within ``budget_frac`` of the corpus total.

    Scalable shape: the global greedy cumsum is decomposed so NO global
    window ever runs over the documents. A tiny per-quality-value histogram
    (sum of tokens per distinct rounded score — bounded by the score's
    resolution, ≤10⁴ buckets at 4 decimals) carries the cross-bucket prefix
    sums through one driver-free broadcast join; each document then only
    needs its WITHIN-bucket prefix (window partitioned by quality value —
    parallel across buckets). keep ⇔ cum_prev(bucket) + within ≤ budget,
    which equals the global-order rule exactly because the bucket key IS
    the first sort key.

    budget_frac=0.5 by default — exactly representable in binary, so the
    budget scalar is bit-identical on every engine.
    """
    budget = df.agg(
        F.floor(F.lit(budget_frac) * F.sum(size_col)).cast("long").alias("__budget")
    )
    hist = df.groupBy(quality_col).agg(F.sum(size_col).cast("long").alias("__qb_tokens"))
    wq = Window.orderBy(F.col(quality_col).desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum_prev = hist.withColumn(
        "__cum_prev", F.coalesce(F.sum("__qb_tokens").over(wq), F.lit(0))
    ).select(quality_col, "__cum_prev")
    wd = (
        Window.partitionBy(quality_col)
        .orderBy(F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.join(F.broadcast(cum_prev), on=quality_col)
        .crossJoin(F.broadcast(budget))
        .withColumn("__within", F.sum(F.col(size_col).cast("long")).over(wd))
        .filter(F.col("__cum_prev") + F.col("__within") <= F.col("__budget"))
        .drop("__cum_prev", "__within", "__budget")
    )


def sample_to_mixture(
    df: DataFrame,
    strata: list[str],
    weights: dict | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Downsample to a target stratum mixture (domain/language re-balancing
    for a training corpus): pick the LARGEST corpus that satisfies the
    target proportions exactly, deterministically.

    ``weights`` maps stratum value (tuple for multi-column strata) to an
    INTEGER weight; None = uniform across observed strata. All quota
    arithmetic is integer (weight w_s, total W = sum w):

        T       = min_s  (count_s * W) div w_s   -- max feasible total
        quota_s = (w_s * T) div W                -- per-stratum take

    so Spark and any SQL oracle agree bit-for-bit — fractional weights
    would hit engine-specific float division (1/5 is inexact; count/0.2
    can floor to 499 on one engine and 500 on another).

    Membership is the first quota_s rows per stratum in (md5(id), id)
    order — the same portable total order the other samplers use, so the
    mixture sample is reproducible across engines, reruns, and backfills.
    Cost: one tiny counts aggregate (broadcast back), one window shuffle
    on the strata. Strata absent from ``weights`` are dropped (weight 0).
    For approximate quotas at extreme scale, pre-thin each stratum with
    ``hash_bucket_sample`` first and rank the survivors.
    """
    # NB: "__w" / "__wtot", not "__w" / "__W" — Spark's default resolver is
    # case-insensitive, so a column named "__W" silently REPLACES "__w".
    counts = df.groupBy(*strata).agg(F.count("*").alias("__cnt"))
    if weights is None:
        n_strata = counts.agg(F.count("*").alias("__wtot"))
        wtd = counts.crossJoin(F.broadcast(n_strata)).withColumn("__w", F.lit(1))
    else:
        rows = [
            ((*k,) if isinstance(k, tuple) else (k,)) + (int(w),)
            for k, w in weights.items()
        ]
        wf = df.sparkSession.createDataFrame(rows, [*strata, "__w"])
        wtd = counts.join(F.broadcast(wf), on=strata).withColumn(
            "__wtot", F.lit(int(sum(weights.values())))
        )
    feasible = wtd.withColumn("__feasible", F.expr("(__cnt * __wtot) div __w"))
    total = feasible.agg(F.min("__feasible").alias("__T"))
    quotas = (
        feasible.crossJoin(F.broadcast(total))
        .withColumn("__quota", F.expr("(__w * __T) div __wtot"))
        .select(*strata, "__quota")
    )
    w = Window.partitionBy(*strata).orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return (
        df.join(F.broadcast(quotas), on=strata)
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= F.col("__quota"))
        .drop("__quota")
    )


def temperature_resample(
    df: DataFrame, strata: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """Temperature-flattened mixture resampling (the count^(1/T) domain
    rebalance used when composing LLM training corpora): big strata are
    downweighted, small strata upweighted relative to natural proportions,
    without going fully uniform.

    Temperature is FIXED at T=2 (weight_s = sqrt(count_s)) because that is
    the one exponent computable exactly in integer arithmetic on any
    engine: w = isqrt(cnt) via floor(sqrt) plus a ±1 guard, so a last-ulp
    sqrt difference between engines can never flip a weight. Arbitrary
    alpha needs float pow, whose final-digit rounding is NOT portable —
    for other temperatures, precompute integer weights and use
    ``sample_to_mixture``.

    Quota arithmetic then follows sample_to_mixture's integer scheme
    (T_total = min_s (cnt_s * W) div w_s; quota_s = (w_s * T_total) div W)
    and membership is the first quota_s rows per stratum in the portable
    (md5(id), id) order. Cost: one counts aggregate + two 1-row broadcasts
    + one window shuffle on the strata — independent of corpus width.
    """
    counts = df.groupBy(*strata).agg(F.count("*").alias("__cnt"))
    root = F.floor(F.sqrt(F.col("__cnt"))).cast("long")
    guarded = (
        root
        - (root * root > F.col("__cnt")).cast("long")
        + F.when(
            ((root + 1) * (root + 1)) <= F.col("__cnt"), F.lit(1)
        ).otherwise(F.lit(0))
    )
    wtd = counts.withColumn("__w", guarded).filter(F.col("__w") > 0)
    wtot = wtd.agg(F.sum("__w").alias("__wtot"))
    feasible = wtd.crossJoin(F.broadcast(wtot)).withColumn(
        "__feasible", F.expr("(__cnt * __wtot) div __w")
    )
    total = feasible.agg(F.min("__feasible").alias("__T"))
    quotas = (
        feasible.crossJoin(F.broadcast(total))
        .withColumn("__quota", F.expr("(__w * __T) div __wtot"))
        .select(*strata, "__quota")
    )
    w = Window.partitionBy(*strata).orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return (
        df.join(F.broadcast(quotas), on=strata)
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= F.col("__quota"))
        .drop("__quota")
    )


def shard_assignment(
    df: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global shuffle + shard assignment for training order.

    Every row gets a shard (md5-bucket of its id — engine-portable, stable
    across runs and engines) and a dense 0-based position within that shard,
    ordered by the full md5 hex (a pseudo-random but reproducible total
    order), tying on id. This is the "shuffle the corpus, split into N
    reader shards" step before tokenizer/packing jobs.

    Scale path: the per-shard ``row_number`` here windows on the shard key,
    which means one sort per shard — fine while corpus/n_shards fits a
    partition's spill budget (pick n_shards accordingly: 100 TB / 4096
    shards = 25 GB sorts, spillable). For dense positions WITHOUT any
    per-shard sort, sub-bucket on a PREFIX of the same md5 (prefix ranges
    preserve the hex order), count per sub-bucket, and add broadcast prefix
    offsets — the distributed zipWithIndex pattern; the registered query
    keeps the simpler single-window form because both produce identical
    output.
    """
    h = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy("shard_id").orderBy("_h", id_col)
    return (
        df.select(id_col)
        .withColumn("_h", h)
        .withColumn("shard_id", md5_bucket(F.col(id_col), n_shards))
        .withColumn("shard_pos", F.row_number().over(w) - F.lit(1))
        .select(id_col, "shard_id", "shard_pos")
    )


def shard_manifest(
    shards: DataFrame,
    tokens: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Constant-memory shard manifest: per shard, the doc count, token sum,
    and an md5 over the shard's ids in ``shard_pos`` order.

    The digest certifies membership AND order of the entire deterministic
    shard layout, yet no operator ever materializes a whole shard: rows are
    hash-partitioned by ``shard_id`` (each shard lands wholly in one
    partition), sorted within the partition by (shard_id, shard_pos) — an
    external, spillable sort — and streamed through a chained
    ``hashlib.md5`` in Arrow-batch-sized chunks. Peak state per executor is
    one md5 context + two counters per in-flight shard; peak rows in memory
    is one Arrow batch (``spark.sql.execution.arrow.maxRecordsPerBatch``),
    independent of shard size. The incremental digest of
    ``"id1,id2,...“``-bytes is byte-identical to
    ``md5(array_join(ids, ','))`` / DuckDB ``md5(string_agg(...))``, so the
    certificate value (and its SQL oracle) is unchanged from a
    collect_list formulation — without the per-group unbounded aggregation
    buffer that OOMs when a training shard holds millions of docs.

    ``shards``: (id_col, shard_id, shard_pos) as from shard_assignment;
    ``tokens``: (id_col, _nt) per-doc token counts.
    """
    joined = shards.join(tokens, id_col).select(
        "shard_id", "shard_pos", F.col(id_col).alias("_id"), "_nt"
    )
    srt = joined.repartition(F.col("shard_id")).sortWithinPartitions(
        "shard_id", "shard_pos"
    )

    def digest(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        cur = None  # [shard_id, md5-context, n_docs, n_tokens]

        def flush():
            return pd.DataFrame(
                {
                    "shard_id": [cur[0]],
                    "n_docs": [cur[2]],
                    "n_tokens": [cur[3]],
                    "content_md5": [cur[1].hexdigest()],
                }
            )

        for pdf in batches:
            if not len(pdf):
                continue
            sid = pdf["shard_id"].to_numpy()
            starts = np.flatnonzero(np.r_[True, sid[1:] != sid[:-1]])
            ends = np.r_[starts[1:], len(sid)]
            for a, b in zip(starts, ends):
                s = int(sid[a])
                if cur is not None and s != cur[0]:
                    yield flush()
                    cur = None
                blob = ",".join(map(str, pdf["_id"].iloc[a:b]))
                if cur is None:
                    cur = [s, hashlib.md5(), 0, 0]
                else:
                    cur[1].update(b",")
                cur[1].update(blob.encode())
                cur[2] += int(b - a)
                cur[3] += int(pdf["_nt"].iloc[a:b].sum())
        if cur is not None:
            yield flush()

    return srt.mapInPandas(
        digest, "shard_id bigint, n_docs bigint, n_tokens bigint, content_md5 string"
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement à la Efraimidis–Spirakis:
    every row draws a key -ln(u)/w from a uniform u and the k SMALLEST
    keys win — provably equivalent to sequential weighted draws, yet
    embarrassingly parallel (per-row expression + one distributed top-k,
    no sequential reservoir, no driver state). The uniform comes from
    the row's md5 (first 13 hex digits / 16^13 — past double precision),
    so the SAME sample falls out of any engine, any partitioning, any
    rerun — the engine-portability contract of the md5-bucket samplers,
    extended to weighted draws. Zero-weight rows never win (key = +inf
    behavior via filter). Returns winners with their draw key.

    The uniform is (h+1)/(16^13+1) rather than h/16^13: an all-zero hash
    prefix would give u=0, where Spark's ln(0) yields NULL (which sorts
    FIRST under asc and would silently steal a sample slot) while DuckDB
    errors — the +1 shift keeps u in (0, 1] and both engines finite and
    identical (16^13 = 2^52, so numerator and denominator stay exactly
    representable as doubles and the division is bit-identical)."""
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 13), 16, 10).cast(
            "double"
        )
        + F.lit(1.0)
    ) / F.lit(float(16**13 + 1))
    key = -F.log(u) / F.col(weight_col)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("draw_key", F.round(key, 10))
        .orderBy(F.col("draw_key").asc(), F.col(id_col).asc())
        .limit(k)
    )
