"""cdc_streaming_pipeline_spark — a PySpark-native CDC + analytics engine.

Re-expresses the data-processing capability of the reference CDC pipeline
(Postgres → Debezium → Kafka → HDFS sink → Hive; see /root/reference) as a
single Spark-first engine:

- Structured Streaming replaces Debezium + Kafka-Connect HDFS sink.
- DataFrame / Spark SQL replaces Hive schema-on-read queries.
- Parquet (columnar) is the native landed format; JSON-lines+gzip is kept as
  a byte-compat interchange sink.

Beyond the reference surface the engine ships large-scale training-data
pipeline operators: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search (brute-force + LSH-bucketed ANN),
text analysis (language-ID, quality, tokens, fingerprints) and multimodal
column plumbing.

Everything is built on public PySpark 4.x APIs only.
"""

from cdc_streaming_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
