"""Per-batch landing cost of the streaming dedup sink vs corpus size
(SCALE10 evidence): bytes written and wall for a singleton trickle
batch on a 100k-doc vs a 1M-doc corpus — O(batch) means the bytes rows
match across the 10x corpus. Prints one JSON line per corpus size; raw
capture committed as .benchmarks/dedup_stream_scale_r15.jsonl."""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.session import get_spark
from cdc_streaming_pipeline_spark.sources.txlog import BucketedTxLogTable
from cdc_streaming_pipeline_spark.streaming.dedup_sink import ExactDedupSink

spark = get_spark("probe-dedup-stream")
out = {}
for label, n in (("corpus_100k", 100_000), ("corpus_1m", 1_000_000)):
    root = tempfile.mkdtemp(prefix=f"dstream-{label}-")
    try:
        corpus_path = os.path.join(root, "corpus")
        sink = ExactDedupSink(spark, corpus_path)
        bulk = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("document body number "), F.col("id").cast("string"),
                     F.lit(" with distinctive content")).alias("text"),
        )
        t0 = time.time()
        sink(bulk, 0)
        build_s = time.time() - t0

        def table_bytes():
            tot = 0
            for dirpath, _, files in os.walk(os.path.join(corpus_path, "data")):
                for f in files:
                    tot += os.path.getsize(os.path.join(dirpath, f))
            return tot

        before = table_bytes()
        trickle = spark.createDataFrame(
            [(n + 7, "a single novel trickle document")], "doc_id bigint, text string"
        )
        t0 = time.time()
        sink(trickle, 1)
        trickle_s = time.time() - t0
        t = BucketedTxLogTable(spark, corpus_path)
        e = t.history()[-1]
        out[label] = {
            "corpus_docs": n,
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
