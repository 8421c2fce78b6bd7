"""Per-batch landing cost of the streaming ANN sink vs store size
(SCALE10 evidence): bytes written and wall for a singleton trickle
batch on a 100k-vector vs a 1M-vector store — O(batch) means the bytes
rows match across the 10x store. Prints one JSON line per store size."""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.session import get_spark
from cdc_streaming_pipeline_spark.sources.txlog import BucketedTxLogTable
from cdc_streaming_pipeline_spark.streaming.ann_sink import IvfStreamSink

DIM = 32
spark = get_spark("probe-ann-stream")


def _vecs(lo, hi):
    # deterministic pseudo-embeddings, JVM-side: dim values from
    # hashes of (id, d) — no driver materialization of the corpus
    cols = [
        (F.pmod(F.xxhash64(F.col("id"), F.lit(d)), F.lit(1000)) / 500.0 - 1.0)
        for d in range(DIM)
    ]
    return spark.range(lo, hi).select(
        F.col("id").alias("vec_id"), F.array(*cols).alias("embedding")
    )


out = {}
rng = np.random.default_rng(7)
codebook = rng.standard_normal((16, DIM))
for label, n in (("store_100k", 100_000), ("store_1m", 1_000_000)):
    root = tempfile.mkdtemp(prefix=f"annstream-{label}-")
    try:
        sink = IvfStreamSink(
            spark,
            cells_path=os.path.join(root, "cells"),
            vectors_path=os.path.join(root, "vectors"),
            centroids=codebook,
        )
        t0 = time.time()
        sink(_vecs(0, n), 0)
        build_s = time.time() - t0

        def table_bytes():
            tot = 0
            for dirpath, _, files in os.walk(os.path.join(root, "vectors", "data")):
                for f in files:
                    tot += os.path.getsize(os.path.join(dirpath, f))
            return tot

        before = table_bytes()
        t0 = time.time()
        sink(_vecs(n + 7, n + 8), 1)
        trickle_s = time.time() - t0
        t = BucketedTxLogTable(spark, os.path.join(root, "vectors"))
        e = t.history()[-1]
        out[label] = {
            "store_vectors": n,
            "bulk_land_s": round(build_s, 2),
            "trickle_wall_s": round(trickle_s, 2),
            "trickle_bytes_written": table_bytes() - before,
            "trickle_commit_mode": e.get("mode"),
            "trickle_removes": len(e.get("removes", [])),
            "trickle_file_dvs": len(e.get("file_dvs", {})),
        }
        print(json.dumps({label: out[label]}))
    finally:
        shutil.rmtree(root, ignore_errors=True)
spark.stop()
