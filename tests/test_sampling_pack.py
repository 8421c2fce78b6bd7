"""Sharded sequence-packing invariants + plan shape.

The chunked-cumsum packer guarantees, PER SHARD (shard 0 == the global
form):
- bin ids are consecutive integers starting at 0 (clamped contributions
  advance the running total by at most `capacity`, so floor(start/capacity)
  steps by at most 1);
- every bin's clamped-token fill is < 2 * capacity (a bin spans one
  capacity window plus at most one straddling document);
- the cumulative fill through every non-final bin m is >= (m+1) * capacity
  (a new bin only opens once the running total crosses the next capacity
  multiple) — i.e. average fill per closed bin >= capacity.

Sharding must change WHERE those invariants apply (per md5 shard), not
whether they hold, and must remove the single-task global window from the
plan.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from tests.conftest import SF_DIR

CAP = 512


def _invariants(rows, capacity=CAP):
    by_shard = defaultdict(list)
    for r in rows:
        by_shard[r.shard].append(r)
    for shard, members in by_shard.items():
        members.sort(key=lambda r: r.doc_id)
        fills = defaultdict(int)
        for r in members:
            local_bin = r.pack_id - shard * (1 << 40)
            fills[local_bin] += min(r.n_tokens, capacity)
        bins = sorted(fills)
        assert bins == list(range(len(bins))), f"shard {shard}: bins not consecutive {bins}"
        cum = 0
        for m in bins:
            assert fills[m] < 2 * capacity, f"shard {shard} bin {m} overfull: {fills[m]}"
            cum += fills[m]
            if m < bins[-1]:
                assert cum >= (m + 1) * capacity, (
                    f"shard {shard} bin {m} closed underfull: cum={cum}"
                )


def test_sharded_pack_invariants_and_id_disjointness(spark):
    from cdc_streaming_pipeline_spark.operators.sampling import pack_sequences

    df = (
        spark.range(1, 400)
        .select(F.col("id").alias("doc_id"))
        .withColumn("n_tokens", (F.col("doc_id") * 37 % 700).cast("long"))
    )
    rows = pack_sequences(df, capacity=CAP, n_shards=8).collect()
    assert len(rows) == 399
    _invariants(rows)
    # shard encoding keeps pack ids disjoint across shards
    assert all(r.pack_id >> 40 == r.shard for r in rows)


def test_single_shard_matches_legacy_global_packing(spark):
    from cdc_streaming_pipeline_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [(1, 100), (2, 700), (3, 300), (4, 250), (5, 10)], "doc_id long, n_tokens long"
    )
    rows = {r.doc_id: (r.shard, r.pack_id, r.cum_tokens) for r in
            pack_sequences(df, capacity=CAP).collect()}
    assert rows == {1: (0, 0, 100), 2: (0, 0, 612), 3: (0, 1, 912),
                    4: (0, 1, 1162), 5: (0, 2, 1172)}
    _invariants(pack_sequences(df, capacity=CAP).collect())


def test_sharded_pack_plan_has_no_global_window(spark):
    """n_shards > 1 must not funnel the whole input through one task: no
    Exchange SinglePartition feeding the window (the n_shards=1 form has
    exactly that — it is the small-input convenience, not the scale path)."""
    from cdc_streaming_pipeline_spark.plans.docs import pack_documents

    plan = pack_documents(spark, SF_DIR)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "SinglePartition" not in plan, "sharded pack still has a global exchange"
    assert "Window" in plan


def test_temperature_resample_sqrt_quotas(spark):
    """T=2 flattening on a skewed two-stratum corpus: weights are exact
    integer square roots (isqrt guard verified at perfect squares and
    off-squares), quotas follow w_s, and membership is the deterministic
    (md5(id), id) prefix per stratum."""
    from cdc_streaming_pipeline_spark.operators.sampling import temperature_resample

    rows = [(i, "big") for i in range(100)] + [(1000 + i, "small") for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_resample(df, ["source"]).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    # w_big = isqrt(100) = 10, w_small = isqrt(9) = 3, W = 13
    # T = min(100*13 div 10, 9*13 div 3) = min(130, 39) = 39
    # quota_big = 10*39 div 13 = 30, quota_small = 3*39 div 13 = 9
    assert len(by_src["big"]) == 30
    assert len(by_src["small"]) == 9
    # big stratum went from 100/109 (92%) of the corpus to 30/39 (77%):
    # flattened toward, but not all the way to, the uniform mix.
    # ranks are a contiguous 1..quota prefix (deterministic order)
    assert sorted(r.sample_rank for r in by_src["big"]) == list(range(1, 31))


def test_temperature_resample_nonsquare_counts(spark):
    """isqrt guard on non-square counts: w = floor(sqrt(cnt)) exactly
    (cnt=2 -> 1, cnt=3 -> 1, cnt=8 -> 2, cnt=15 -> 3, cnt=17 -> 4)."""
    from cdc_streaming_pipeline_spark.operators.sampling import temperature_resample

    rows = []
    for src, n in [("a", 2), ("b", 3), ("c", 8), ("d", 15), ("e", 17)]:
        rows += [(hash(src) % 1000 * 100 + i, src) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_resample(df, ["source"]).collect()
    # W = 1+1+2+3+4 = 11; T = min(2*11//1, 3*11//1, 8*11//2, 15*11//3, 17*11//4)
    #   = min(22, 33, 44, 55, 46) = 22
    # quotas = (w*22)//11 = [2, 2, 4, 6, 8]
    got = {}
    for r in out:
        got[r.source] = got.get(r.source, 0) + 1
    assert got == {"a": 2, "b": 2, "c": 4, "d": 6, "e": 8}


def test_shard_manifest_digest_matches_collect_list_and_survives_tiny_batches(spark):
    """The streamed chained-md5 manifest must equal the unbounded
    collect_list formulation it replaced — including when Arrow batches are
    far smaller than a shard, which forces the digest to chain across many
    batch boundaries. Since per-executor state is one md5 context + one
    Arrow batch, equality under maxRecordsPerBatch=64 IS the
    constant-memory certificate."""
    from cdc_streaming_pipeline_spark.operators.sampling import (
        shard_assignment,
        shard_manifest,
    )
    from cdc_streaming_pipeline_spark.functions.textfn import token_count
    from cdc_streaming_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    shards = shard_assignment(docs, n_shards=4)
    toks = docs.select("doc_id", token_count(F.col("text")).alias("_nt"))

    reference = {
        r.shard_id: (r.n_docs, r.n_tokens, r.content_md5)
        for r in shards.join(toks, "doc_id")
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_nt").alias("n_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("shard_pos", "doc_id"))),
                        lambda x: x["doc_id"].cast("string"),
                    ),
                    ",",
                )
            ).alias("content_md5"),
        )
        .collect()
    }

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
        streamed = {
            r.shard_id: (r.n_docs, r.n_tokens, r.content_md5)
            for r in shard_manifest(shards, toks).collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    assert streamed == reference


def test_training_shard_export_round_trip_matches_manifest(spark, tmp_path):
    """The export path end-to-end: write each shard as a parquet dir in
    shard_pos order, read the files back, recompute each shard's digest
    from the READ-BACK row order — it must equal the manifest computed
    from the logical frame, proving the manifest certifies what actually
    lands on disk."""
    import hashlib

    from cdc_streaming_pipeline_spark.functions.textfn import token_count
    from cdc_streaming_pipeline_spark.operators.sampling import (
        shard_assignment,
        shard_manifest,
    )
    from cdc_streaming_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    shards = shard_assignment(docs, n_shards=4)
    toks = docs.select("doc_id", token_count(F.col("text")).alias("_nt"))
    manifest = {
        r.shard_id: r.content_md5 for r in shard_manifest(shards, toks).collect()
    }

    out = str(tmp_path / "shards")
    (
        shards.repartition(F.col("shard_id"))
        .sortWithinPartitions("shard_id", "shard_pos")
        .write.partitionBy("shard_id")
        .parquet(out)
    )
    for shard_id, want in manifest.items():
        # read back WITHOUT re-sorting: parquet preserves within-file row
        # order, and each shard dir was written by one task
        back = spark.read.parquet(f"{out}/shard_id={shard_id}").collect()
        digest = hashlib.md5(
            ",".join(str(r.doc_id) for r in back).encode()
        ).hexdigest()
        assert digest == want, shard_id


def test_weighted_sample_matches_python_replay_and_favors_weight(spark):
    """The ES-key draw must equal an independent python replay of
    -ln(md5-uniform)/weight (same winners, same order), and across a
    weight sweep the heavy group must win far more slots than the light
    one (w=9 vs w=1 on otherwise-identical ids)."""
    import hashlib
    import math

    from cdc_streaming_pipeline_spark.operators.sampling import weighted_sample

    rows = [(i, 9 if i % 2 == 0 else 1) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = [(r.doc_id, r.draw_key) for r in weighted_sample(df, k=40, weight_col="w").collect()]

    def key(i, w):
        u = int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16) / 16**13
        return round(-math.log(u) / w, 10), i

    want = sorted((key(i, w) for i, w in rows))[:40]
    assert [(i, k) for (k, i) in want] == got

    heavy = sum(1 for i, _ in got if i % 2 == 0)
    assert heavy >= 30  # w=9 group should dominate ~9:1
