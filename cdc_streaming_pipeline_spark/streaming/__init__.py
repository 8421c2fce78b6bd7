"""Structured Streaming surface: the reference's Debezium→Kafka→HDFS-sink
composition collapsed into single Spark streaming queries."""
