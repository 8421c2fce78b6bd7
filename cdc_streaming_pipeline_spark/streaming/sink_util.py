"""Shared landing utilities for the engine's stateful streaming sinks
(dedup_sink.py, ann_sink.py): CDC-shaping a micro-batch for a txlog
merge, opening state tables whose recorded layout wins over the sink's
preferred one, O(batch) merge-on-read landing with txn-tagged
exactly-once and lost-race retries, and the post-commit maintenance
cadence (compaction fold + vacuum) that keeps an unbounded stream's
probe plans flat."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def cdc_shape(df: DataFrame, batch_id: int) -> DataFrame:
    """Stamp the CDC bookkeeping columns a txlog merge expects."""
    from cdc_streaming_pipeline_spark.schemas import pad_lsn

    return (
        df.withColumn("_op", F.lit("c"))
        .withColumn("_lsn", pad_lsn(F.lit(int(batch_id))))
        .withColumn("_deleted", F.lit(None).cast("string"))
    )


def open_table(spark: SparkSession, path: str, key_cols: list[str], **kw):
    """Open/create a state table with the sink's preferred key layout;
    an EXISTING table's recorded layout wins (a stream resumed over a
    table created by an older sink version must not die on a key
    reorder — bucketing is a table property)."""
    from cdc_streaming_pipeline_spark.sources.txlog import (
        BucketedTxLogTable,
        LayoutMismatchError,
    )

    try:
        return BucketedTxLogTable(spark, path, key_cols=key_cols, **kw)
    except LayoutMismatchError as exc:
        # r15/r16 ADVICE: retry ONLY the recorded-n_buckets mismatch (the
        # sink opened an existing table with a different default) — any
        # other constructor error (key/order mismatch, missing layout) is
        # real misconfiguration and must propagate, not get silently
        # retried under the table's recorded layout. Typed exception, not
        # message matching: a reworded error must not flip the handling.
        if exc.field != "n_buckets":
            raise
        kw.pop("n_buckets", None)
        return BucketedTxLogTable(spark, path, **kw)


def land_mor(
    table,
    df: DataFrame,
    batch_id: int,
    txn: tuple[str, int],
    conflict_retries: int = 5,
) -> None:
    """Land one table's new rows O(batch): bootstrap on first batch,
    merge-on-read after — appended bucket-pure files, zero bucket
    rewrites, and (keys being novel + leading-key blooms) a stored-image
    scan the sidecars prune to nothing. A commit lost to an EXTERNAL
    writer (a manual compaction window, another maintenance process)
    retries: the merge re-resolves from the new base and the txn tag
    keeps even a retried-after-partial-visibility batch exactly-once —
    the stream must not die on a losable race
    (streaming/pipeline.py's rule)."""
    from cdc_streaming_pipeline_spark.sources.txlog import ConcurrentWriteError

    shaped = cdc_shape(df, batch_id)
    for attempt in range(conflict_retries + 1):
        try:
            if table.latest_version() is None:
                table.init_from_events(shaped, txn=txn)
            else:
                table.merge_cdc_batch_mor(shaped, txn=txn)
            return
        except ConcurrentWriteError:
            if attempt == conflict_retries:
                raise


def maintain(
    table,
    batch_id: int,
    max_files_per_bucket: int | None,
    vacuum_every: int | None,
    vacuum_retain_versions: int = 10,
    vacuum_min_age_seconds: float = 3600.0,
    cluster_cols: list[str] | None = None,
) -> None:
    """Post-commit maintenance (the streaming/pipeline.py cadence): fold
    overgrown buckets so sustained MoR appends never degrade the probe
    plan (``cluster_cols`` additionally range-clusters folded buckets,
    making files value-pure so dictionary/stats pruning bites), and
    reclaim dead files on a batch cadence. Maintenance commits are
    untagged — a replayed batch no-ops its merges via the txn tag and
    re-folding/vacuuming is a logical no-op."""
    from cdc_streaming_pipeline_spark.sources.txlog import (
        ConcurrentWriteError,
        vacuum,
    )

    if max_files_per_bucket is not None:
        try:
            table.compact_buckets(
                min_files=max_files_per_bucket + 1, cluster_cols=cluster_cols
            )
        except ConcurrentWriteError:
            pass  # raced an external commit: the next batch folds
    if vacuum_every and (int(batch_id) + 1) % vacuum_every == 0:
        vacuum(
            table,
            retain_versions=vacuum_retain_versions,
            min_age_seconds=vacuum_min_age_seconds,
        )
