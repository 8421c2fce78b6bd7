"""Streaming ANN index ingestion (streaming/ann_sink.py): embeddings
stream into a txlog-backed IVF store — centroids fit once on the
bootstrap batch and frozen, later batches assign against the committed
centroids and MoR-land exactly once.

Pins: stream-then-serve equals the batch ``ivf_topk`` over the full
corpus with the SAME stored centroids (the pruning soundness
argument); a stale-checkpoint replay lands nothing (txn tags); every
landing is MoR; maintenance folds keep the store's buckets bounded and
cell-clustered."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.sources.txlog import BucketedTxLogTable
from cdc_streaming_pipeline_spark.streaming.ann_sink import (
    _stored_centroids,
    ann_stream_sink,
    ivf_topk_stream_store,
)

EMB = "vec_id bigint, embedding array<double>"


def _vectors(spark, n=60, dim=4):
    # four well-separated directions + per-id jitter, deterministic
    rows = []
    for i in range(n):
        base = [0.0] * dim
        base[i % dim] = 1.0
        base[(i + 1) % dim] = 0.2 + (i % 7) * 0.01
        rows.append((i, [v + 0.001 * ((i * 31 + d * 7) % 11) for d, v in enumerate(base)]))
    return spark.createDataFrame(rows, EMB)


def _write_wave(df, spool, name):
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(spool, name))


def _run(spark, spool, ckpt, **kw):
    q = ann_stream_sink(
        spark.readStream.schema(EMB).option("maxFilesPerTrigger", "1").parquet(
            os.path.join(spool, "*")
        ),
        ckpt,
        available_now=True,
        **kw,
    )
    q.awaitTermination(300)


def test_stream_store_serves_identical_to_batch_ivf(spark, tmp_path):
    from cdc_streaming_pipeline_spark.operators.cluster import ivf_topk

    spool = str(tmp_path / "spool")
    ckpt = str(tmp_path / "ckpt")
    cells_path = str(tmp_path / "cells")
    vectors_path = str(tmp_path / "vectors")
    os.makedirs(spool)
    all_vecs = _vectors(spark)
    kw = dict(
        cells_path=cells_path, vectors_path=vectors_path,
        k_cells=4, kmeans_iters=3, n_buckets=4, max_files_per_bucket=2,
    )
    for w in range(3):
        _write_wave(all_vecs.filter(F.col("vec_id") % 3 == w), spool, f"w{w}")
        _run(spark, spool, ckpt, **kw)

    vectors = BucketedTxLogTable(spark, vectors_path)
    assert vectors.read_state().count() == 60

    queries = all_vecs.filter(F.col("vec_id") % 20 == 0)
    got = ivf_topk_stream_store(
        spark, cells_path, vectors_path, queries, k=3, n_probe=2
    ).collect()

    # batch reference: SAME stored centroids over the full corpus
    cent = _stored_centroids(BucketedTxLogTable(spark, cells_path))
    want = ivf_topk(
        all_vecs, queries, k=3, n_clusters=4, n_probe=2, centroids=cent
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    # every landing was MoR and txn-tagged; stale-checkpoint replay no-ops
    landings = [
        e for e in vectors.history()
        if e.get("txn") and str(e.get("mode", "")).startswith("merge")
    ]
    assert landings and all(e["mode"] == "merge_mor" for e in landings)
    v = vectors.latest_version()
    cells_v = BucketedTxLogTable(spark, cells_path).latest_version()
    _run(spark, spool, str(tmp_path / "ckpt2"), **kw)  # fresh ckpt: full replay
    assert vectors.latest_version() == v
    assert BucketedTxLogTable(spark, cells_path).latest_version() == cells_v
    assert vectors.read_state().count() == 60

    # maintenance folded the trickle: bounded per-bucket files
    from cdc_streaming_pipeline_spark.sources.txlog import resolve_snapshot_state

    live, bmap, _ = resolve_snapshot_state(vectors)
    per_bucket: dict[int, int] = {}
    for f in live:
        per_bucket[bmap[f]] = per_bucket.get(bmap[f], 0) + 1
    assert max(per_bucket.values()) <= 3, per_bucket


def test_pretrained_codebook_bootstraps_cells(spark, tmp_path):
    """A pre-trained codebook handed to the sink is what the cells
    table commits — no first-batch fit; serving probes those exact
    centroids."""
    import numpy as np

    spool = str(tmp_path / "spool")
    cells_path = str(tmp_path / "cells")
    vectors_path = str(tmp_path / "vectors")
    os.makedirs(spool)
    codebook = np.eye(4)  # 4 axis-aligned cells
    _write_wave(_vectors(spark, n=30), spool, "w0")
    _run(
        spark, spool, str(tmp_path / "ckpt"),
        cells_path=cells_path, vectors_path=vectors_path,
        n_buckets=2, centroids=codebook,
    )
    stored = _stored_centroids(BucketedTxLogTable(spark, cells_path))
    assert np.allclose(stored, codebook)
    got = ivf_topk_stream_store(
        spark, cells_path, vectors_path,
        _vectors(spark, n=30).filter("vec_id = 0"), k=3, n_probe=1,
    ).collect()
    assert len(got) == 3


def test_probed_read_prunes_after_fold(spark, tmp_path):
    """After the cell-clustered fold, the serving read's cell-IN probe
    must skip files (value-pure files -> dictionary pruning)."""
    spool = str(tmp_path / "spool")
    cells_path = str(tmp_path / "cells")
    vectors_path = str(tmp_path / "vectors")
    os.makedirs(spool)
    all_vecs = _vectors(spark, n=80)
    kw = dict(
        cells_path=cells_path, vectors_path=vectors_path,
        k_cells=4, kmeans_iters=3, n_buckets=2, max_files_per_bucket=1,
    )
    for w in range(3):
        _write_wave(all_vecs.filter(F.col("vec_id") % 3 == w), spool, f"w{w}")
        _run(spark, spool, str(tmp_path / "ckpt"), **kw)
    # force a final fold so files are cell-clustered; explicit
    # cluster_parts because the toy corpus would otherwise fold to one
    # file per bucket (at real scale target_file_bytes sizes this)
    vectors = BucketedTxLogTable(spark, vectors_path, stats_cols=["cell"])
    vectors.compact_buckets(min_files=1, cluster_cols=["cell"], cluster_parts=4)

    df, files_read, files_total = vectors.read_state_where_in("cell", [0])
    assert files_total >= 4
    assert files_read < files_total, (files_read, files_total)
    got = {r["cell"] for r in df.select("cell").distinct().collect()}
    assert got == {0}
