"""Persisted IVF index (operators/cluster.py): write cell-partitioned,
serve with partition pruning, results identical to the in-memory path."""

from __future__ import annotations

import numpy as np

from cdc_streaming_pipeline_spark.operators.cluster import (
    ivf_topk,
    ivf_topk_from_index,
    kmeans_fit,
    load_ivf_centroids,
    write_ivf_index,
)
from cdc_streaming_pipeline_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_persisted_ivf_serves_identically_and_prunes_partitions(spark, tmp_path):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter("vec_id % 50 = 0")
    cent = kmeans_fit(emb, k=8, seed=42)

    path = str(tmp_path / "ivf_index")
    write_ivf_index(emb, path, cent)

    loaded = load_ivf_centroids(spark, path)
    np.testing.assert_array_equal(loaded, cent)

    served = ivf_topk_from_index(spark, path, queries, k=5, n_probe=3)
    direct = ivf_topk(emb, queries, k=5, n_clusters=8, n_probe=3, centroids=cent)
    got = {(r.query_id, r.rank): (r.neighbor_id, r.cosine) for r in served.collect()}
    want = {(r.query_id, r.rank): (r.neighbor_id, r.cosine) for r in direct.collect()}
    assert got == want and got

    # partition pruning: the cell predicate must be a PARTITION filter on
    # the scan, so non-probed cells' files are never opened
    pruned = spark.read.parquet(path).filter("cell IN (0, 1)")
    plan = pruned._jdf.queryExecution().explainString(
        pruned.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    part = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "cell" in part, f"cell not a partition filter: {part}"


def test_persisted_ivf_probe_subset_reads_fewer_cells(spark, tmp_path):
    """With n_probe=1 the union of probed cells is a strict subset for a
    clustered query set — assert the serving scan's cell filter excludes
    at least one cell (i.e. the index actually skips data)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter("vec_id % 97 = 0")
    cent = kmeans_fit(emb, k=8, seed=42)
    path = str(tmp_path / "ivf_small")
    write_ivf_index(emb, path, cent)

    import numpy as np
    from cdc_streaming_pipeline_spark.operators.cluster import (
        _collect_matrix,
        _normalize,
    )

    _, q_mat = _collect_matrix(queries, "vec_id", "embedding")
    probed = np.argsort(-(_normalize(q_mat) @ cent.T), axis=1)[:, :1]
    cells = {int(c) for row in probed for c in row}
    assert len(cells) < 8  # genuinely skips at least one cell
    out = ivf_topk_from_index(spark, path, queries, k=3, n_probe=1)
    assert out.count() > 0


def test_append_then_serve_equals_rebuild(spark, tmp_path):
    """append_to_ivf_index: building on half the corpus and appending
    the other half must serve IDENTICALLY to one index built over the
    full corpus with the SAME centroids — assignment is a pure function
    of the frozen centroids, so append commutes with write. Also pins
    that the append wrote only into existing cell partitions (no new
    top-level layout) and never rewrote old files."""
    import os
    from glob import glob

    from cdc_streaming_pipeline_spark.operators.cluster import append_to_ivf_index

    emb = load_table(spark, SF_DIR, "embeddings")
    cent = kmeans_fit(emb, k=8, seed=42)
    queries = emb.filter("vec_id % 97 = 0")

    full_path = str(tmp_path / "ivf_full")
    write_ivf_index(emb, full_path, cent)

    inc_path = str(tmp_path / "ivf_inc")
    write_ivf_index(emb.filter("vec_id % 2 = 0"), inc_path, cent)
    before = {
        p: os.path.getmtime(p)
        for p in glob(os.path.join(inc_path, "cell=*", "*.parquet"))
    }
    append_to_ivf_index(emb.filter("vec_id % 2 = 1"), inc_path)
    # old files untouched (append = new files only)
    for p, mt in before.items():
        assert os.path.exists(p) and os.path.getmtime(p) == mt

    def res(path):
        rows = ivf_topk_from_index(spark, path, queries, k=5, n_probe=4).collect()
        return {
            (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"]) for r in rows
        }

    assert res(inc_path) == res(full_path)
