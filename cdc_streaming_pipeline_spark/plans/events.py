"""Event-stream query surface over the `events` table.

These re-express the reference's CDC/event-log semantics on the driver's
`events` table (event_id ≈ LSN: monotone per stream; ts = event time;
user_id ≈ entity key):

- COUNT(*) / ordered LIMIT — the reference's monitor queries
  (reference: scripts/monitor-pipeline.sh:109-113; SURVEY.md Q5/Q6).
- per-type demux — per-table demultiplex (SURVEY.md §2.5).
- latest-state per key — the upsert/latest-row view the CDC metadata
  exists for (reference: cdc_pipeline_dag.py:146; SURVEY.md implied-op #1).
- event-time partition derivation — TimeBasedPartitioner
  (reference: cdc_pipeline_dag.py:193-195).
- tumbling windows / sessionization — the streaming aggregates the engine
  adds as first-class (Structured Streaming shares these expressions).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.operators.cdc import with_time_partitions
from cdc_streaming_pipeline_spark.sources.tables import load_table

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


def count_star_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").agg(F.count("*").alias("n_events"))


def first_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered LIMIT (deterministic version of `SELECT * ... LIMIT 5`)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.orderBy("event_id").limit(5).select(
        "event_id", "user_id", "event_type", F.round("value", 2).alias("value")
    )


def purchase_stats_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demux (filter on the type discriminator) + per-key aggregate."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.count_distinct(F.col("user_id")).alias("n_users"),
    )


def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-state materialization: one row per key, greatest event time
    (tiebreak on event_id = the monotone sequence, like `_lsn`)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", F.round("value", 2).alias("value"))
    )


def time_partition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time partition derivation (year/month/day/hour) + counts —
    the engine's write path partitions on exactly these columns."""
    ev = load_table(spark, sf_dir, "events")
    return with_time_partitions(ev, "ts").groupBy("year", "month", "day", "hour").agg(
        F.count("*").alias("n_events")
    )


def _landed_events_table(spark: SparkSession, sf_dir: str) -> str:
    """Land the events table through the P1 write path (parquet partitioned
    by year/month/day/hour from event time) and declare a catalog external
    table over the directory — the engine twin of the reference's Hive
    external table over the connector's landed files
    (cdc_pipeline_dag.py:358-387). Idempotent per (session, sf_dir): the
    write + DDL run once; every later call reads the catalog table."""
    digest = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    table = f"events_landed_{digest}"
    if spark.catalog.tableExists(table):
        return table
    from cdc_streaming_pipeline_spark.catalog import (
        analyze_table,
        create_external_table,
        recover_partitions,
        refresh_table,
    )
    from cdc_streaming_pipeline_spark.sources.event_log import write_event_log

    path = os.path.join(tempfile.gettempdir(), f"cdc_spark_landed_{digest}")
    ev = load_table(spark, sf_dir, "events")
    # Land one fixed week (the driver events span 2024-01-01..30 at every
    # SF): the demo exercises the full P1 write + DDL + MSCK + pruned-read
    # mechanics; 168 hour dirs instead of 720 keeps the ONE-TIME landing
    # cost bounded (parquet-file creation overhead dominates this write).
    ev = ev.filter((F.col("ts") >= "2024-01-01") & (F.col("ts") < "2024-01-08"))
    ev = with_time_partitions(ev, "ts")
    # route each hour to ONE task before the partitioned write — otherwise
    # every task opens a file in every hour dir (32x the files, and the
    # write is all file-open/commit overhead)
    ev = ev.repartition("year", "month", "day", "hour")
    write_event_log(ev, path, fmt="parquet", ts_col="ts", mode="overwrite")
    create_external_table(spark, table, path, fmt="parquet")
    recover_partitions(spark, table)  # partition dirs -> catalog, else 0 rows
    refresh_table(spark, table)
    # post-landing statistics: rowCount/sizeInBytes into the catalog, the
    # same ANALYZE cycle a warehouse runs after each landing batch
    analyze_table(spark, table)
    return table


def events_landed_partition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7+P1 end-to-end: query the LANDED, time-partitioned event log
    through the catalog (external table over partition directories) with a
    partition predicate — the morning-hours filter prunes half the hour
    partitions AT PLANNING TIME (PartitionFilters, no file read for pruned
    dirs; asserted in tests/test_plan_shapes.py)."""
    t = spark.table(_landed_events_table(spark, sf_dir))
    return (
        t.filter(F.col("hour") < 12)
        .groupBy("year", "month", "day", "hour")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("year").cast("int").alias("year"),
            F.col("month").cast("int").alias("month"),
            F.col("day").cast("int").alias("day"),
            F.col("hour").cast("int").alias("hour"),
            "n_events",
            "sum_value",
        )
    )


def landed_file_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files audit over the landed partitioned sink: per day, how
    many partition dirs, how many physical parquet files, and rows per
    file — the operational query that catches the classic streaming-sink
    failure mode (thousands of KB-sized files per partition strangling
    the NameNode/scan at 100 TB). File identity comes from
    input_file_name() at scan time, so the count reflects the REAL layout.
    The landing write routes each hour to one task (events.py:119), so
    the certified contract is exactly one file per hour partition — the
    oracle states files == distinct hours, and a compaction regression
    breaks the row hash."""
    t = spark.table(_landed_events_table(spark, sf_dir))
    return (
        t.withColumn("_file", F.input_file_name())  # project before agg:
        # Spark bans nondeterministic expressions INSIDE aggregates
        .groupBy("year", "month", "day")
        .agg(
            F.count_distinct("hour").alias("n_hour_partitions"),
            F.count_distinct("_file").alias("n_files"),
            F.count("*").alias("n_rows"),
        )
        .select(
            F.col("year").cast("int").alias("year"),
            F.col("month").cast("int").alias("month"),
            F.col("day").cast("int").alias("day"),
            "n_hour_partitions",
            "n_files",
            "n_rows",
            F.round(F.col("n_rows") / F.col("n_files"), 2).alias("rows_per_file"),
        )
    )


def hourly_type_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event type — the batch
    equivalent of the streaming windowed aggregate (same expressions run
    under readStream + withWatermark in streaming/pipeline.py)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING event-time windows (1 hour long, 15-minute slide) per
    event type — each event contributes to 4 overlapping windows, the
    shape behind rate/SLO dashboards that tumbling windows can't express
    (a spike straddling a tumbling boundary halves). Spark's window()
    explodes each row into its windows BEFORE the shuffle, so the agg
    stays one partial-aggregated shuffle; the oracle replicates the
    explode with a 4-offset unnest."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral transition matrix: for consecutive events of
    each user (ts order, event_id tiebreak), count (from_type, to_type)
    pairs and each pair's share of its from-type's outgoing transitions —
    the Markov-chain summary behind funnel/next-action models. One
    window shuffle on user_id + one pair aggregation."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n_transitions"))
    )
    wt = Window.partitionBy("from_type")
    return pairs.withColumn(
        "share",
        F.round(F.col("n_transitions") / F.sum("n_transitions").over(wt), 4),
    )


def event_disorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time disorder audit — the measurement that DESIGNS the
    watermark: per event type, how often consecutive events of a user
    (arrival order = event_id) regress in event time, and by how much.
    withWatermark's delay should dominate the observed max backstep;
    guessing it instead of measuring it silently drops late data. One
    window shuffle on the user key, one aggregation."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").asc())
    steps = (
        ev.withColumn("_prev_ts", F.lag("ts").over(w))
        .filter(F.col("_prev_ts").isNotNull())
        .withColumn(
            "_backstep_s",
            F.greatest(
                F.lit(0.0),
                (F.unix_micros("_prev_ts") - F.unix_micros("ts")) / 1_000_000.0,
            ),
        )
    )
    return steps.groupBy("event_type").agg(
        F.count("*").alias("n_pairs"),
        F.sum((F.col("_backstep_s") > 0).cast("long")).alias("n_regressions"),
        F.round(
            F.sum((F.col("_backstep_s") > 0).cast("long")) / F.count("*"), 4
        ).alias("regression_frac"),
        F.round(F.max("_backstep_s"), 1).alias("max_backstep_s"),
    )


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: split each user's event sequence on >30-min gaps,
    count sessions and events-per-session stats. Lag + cumulative-sum —
    one shuffle on the session key."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_gap = ev.withColumn(
        "new_session",
        (
            F.coalesce(
                F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w)),
                F.lit(SESSION_GAP_US + 1),
            )
            > SESSION_GAP_US
        ).cast("int"),
    )
    with_sid = with_gap.withColumn(
        "session_id", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return with_sid.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


def insert_key_generation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1: key generation for inserted rows (INSERT ... RETURNING id) —
    deterministic dense keys by the event_id total order (the bounded-batch
    mode of operators.cdc.with_generated_keys; the 100 TB mode is
    monotonically_increasing_id, unit-tested instead since its sparse keys
    are partition-dependent)."""
    from cdc_streaming_pipeline_spark.operators.cdc import with_generated_keys

    ev = load_table(spark, sf_dir, "events").select("event_id")
    return with_generated_keys(ev, key_col="new_id", order_col="event_id", start=1000)


def users_view_no_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: users who viewed but never purchased (EXCEPT)."""
    ev = load_table(spark, sf_dir, "events")
    viewers = ev.filter(F.col("event_type") == "view").select("user_id").distinct()
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return viewers.exceptAll(buyers)


def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read over the JSON `props` payload column — the engine's
    JSON parse surface (T5: from_json with declared schema; the reference
    ships schema-less JSON, cdc_pipeline_dag.py:148-151)."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn("k", F.get_json_object(F.col("props"), "$.k").cast("int"))
    return parsed.groupBy("event_type").agg(
        F.round(F.avg("k"), 4).alias("avg_k"),
        F.max("k").alias("max_k"),
    )


def events_asof_order_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic AS-OF join surface: each event enriched with the customer's
    most recent order (by order date) as of the event time. Right side is
    pre-aggregated to one row per (customer, date) so the point-in-time
    answer is unique; the operator is the union-window composition in
    operators/joins.py (one shuffle, no candidate explosion)."""
    from cdc_streaming_pipeline_spark.operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders")
    latest_per_day = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.max("o_orderkey").alias("o_orderkey"),
        F.round(F.max("o_totalprice"), 2).alias("o_totalprice"),
    )
    out = asof_join(
        ev, latest_per_day,
        left_key="user_id", right_key="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("asof_o_orderkey").alias("asof_orderkey"),
        F.col("asof_o_totalprice").alias("asof_total"),
    )


def events_in_purchase_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-join surface: view events falling within 1 hour after the
    same user's purchase — interval containment turned into an equi-join
    on (user, time-granule) with exact post-filter (operators/joins.py)."""
    from cdc_streaming_pipeline_spark.operators.joins import range_join_buckets

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 1 hour")).alias("win_end"),
    )
    joined = range_join_buckets(
        views, purchases,
        left_ts="ts", start_col="win_start", end_col="win_end",
        on=F.col("user_id") == F.col("p_user"),
        granule="1 hour",
    )
    return joined.groupBy("user_id").agg(
        F.count("*").alias("n_view_purchase_pairs"),
        F.countDistinct("purchase_id").alias("n_purchases_with_views"),
    )


def approx_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-user sketch per event type — the cardinality
    path that replaces COUNT(DISTINCT) at 100 TB (mergeable partial
    sketches, no exact-distinct shuffle of user ids). Sketch values are
    engine-specific → rows-only in the driver; relative error vs the exact
    answer is asserted in tests/test_sketches.py."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users")
    )


def approx_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-mergeable quantile sketch (Greenwald-Khanna) of purchase
    values per event type; accuracy vs exact percentiles tested."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), 10000).alias("q")
    ).select(
        "event_type",
        F.round(F.col("q")[0], 4).alias("p50"),
        F.round(F.col("q")[1], 4).alias("p90"),
        F.round(F.col("q")[2], 4).alias("p99"),
    )


def hll_users_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: per-type HLL sketches UNIONED into the
    overall distinct-user estimate WITHOUT rescanning the data — the
    100 TB cardinality pattern (store sketches per partition/day, merge
    for any slice). Sketch bytes are engine-specific → rows-only in the
    driver; accuracy asserted in tests/test_sketches.py."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    est = per_type.select(
        "event_type", F.hll_sketch_estimate("sk").alias("approx_users")
    )
    overall = per_type.agg(
        F.lit("__all__").alias("event_type"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
    )
    return est.unionByName(overall)


def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session rollup via Spark's NATIVE session_window operator (the
    batch twin of streaming/pipeline.py:session_windows) — one shuffle on
    the session key, windows merged by the engine. Semantics note vs
    user_sessions: session_window merges an event into a session while
    gap < 30min STRICTLY (its window is [ts, ts+gap)), whereas the lag
    formulation there breaks on gap > 30min — the oracle below mirrors
    the strict rule. Session bounds are emitted as epoch microseconds
    (integer, cross-engine-exact)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window(F.col("ts"), "30 minutes"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(28,6)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel: users reaching view -> click -> purchase
    with STRICTLY increasing event times (a later stage only counts if it
    happens after the user's earliest completion of the previous stage —
    the classic product-analytics funnel, the sequential-pattern query
    class MATCH_RECOGNIZE serves elsewhere).

    Plan: one conditional min-aggregate per stage, each keyed on user_id —
    three narrow shuffles on the same key (co-partitioned, the exchanges
    reuse), joins carry one timestamp per user. No collect_list of event
    sequences, no per-user Python — at 100 TB each stage is a filtered
    partial-agg over the events scan."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count("*").alias("n_users")).select(F.lit(1).alias("stage"), F.lit("view").alias("stage_name"), "n_users")
        .unionByName(s2.agg(F.count("*").alias("n_users")).select(F.lit(2).alias("stage"), F.lit("click").alias("stage_name"), "n_users"))
        .unionByName(s3.agg(F.count("*").alias("n_users")).select(F.lit(3).alias("stage"), F.lit("purchase").alias("stage_name"), "n_users"))
    )


def event_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-rate anomaly detection: per (type, hour) counts scored as a
    z-score against the trailing 24 OBSERVED hourly buckets (lag window —
    deterministic in both engines even when hours are missing from the
    grid); buckets with fewer than 12 trailing observations or zero
    variance get a null score. Two shuffles total (hourly rollup + the
    per-type window); at 100 TB the rollup is the reduction — the window
    runs over ~types x hours rows, not events."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(F.count("*").alias("n_events"))
    w = Window.partitionBy("event_type").orderBy("hour").rowsBetween(-24, -1)
    scored = hourly.select(
        "event_type",
        "hour",
        "n_events",
        F.avg("n_events").over(w).alias("_mu"),
        F.stddev_samp("n_events").over(w).alias("_sd"),
        F.count("n_events").over(w).alias("_nprev"),
    )
    z = F.when(
        (F.col("_nprev") >= 12) & (F.col("_sd") > 0),
        (F.col("n_events") - F.col("_mu")) / F.col("_sd"),
    )
    return scored.select(
        "event_type",
        "hour",
        "n_events",
        F.round(z, 4).alias("z_score"),
        F.coalesce(F.abs(z) > 3.0, F.lit(False)).alias("anomaly"),
    )


def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen date, counted on each
    day-offset they return. The canonical product-analytics rollup: one
    groupBy for first-seen, one join back (hash-partitioned on user_id on
    both sides — co-located at any scale), one distinct + count."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_date")
    )
    active = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_date",
            F.datediff(F.to_date("ts"), F.col("cohort_date")).alias("day_offset"),
        )
        .distinct()
    )
    return active.groupBy("cohort_date", "day_offset").agg(
        F.count("*").alias("n_users")
    )


def events_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout demonstrator: Morton-interleave (user bucket, day)
    into one clustering key (operators/layout.py — pure JVM bit
    arithmetic), then report per-z-range-bucket row counts and the min/max
    span of BOTH dimensions. Tight spans on both axes per bucket are
    exactly why a z-ordered write prunes on either filter column at 100 TB
    (parquet min/max stats stay selective for user AND day, not just the
    leading sort column)."""
    from cdc_streaming_pipeline_spark.operators.layout import zorder_value

    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        F.pmod(F.col("user_id"), F.lit(256)).alias("u"),
        F.dayofmonth("ts").alias("d"),
    ).withColumn("zvalue", zorder_value([F.col("u"), F.col("d")], bits=8))
    return (
        q.withColumn("bucket", F.shiftright("zvalue", 10))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.min("u").alias("u_min"),
            F.max("u").alias("u_max"),
            F.min("d").alias("d_min"),
            F.max("d").alias("d_max"),
        )
    )


def theta_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap via Theta sketches: per-type distinct-user
    sketches, then pairwise INTERSECTION / UNION estimates ("users who
    did both A and B") with sketch set-algebra — the 100 TB pattern that
    replaces an exact distinct self-join: sketches are a few KB per
    group, merge/intersect is sketch-side, and the event table is scanned
    ONCE for all 10 pairs. Sketch internals are engine-specific →
    rows-only in the gate; estimate error vs the exact intersection is
    gated in tests/test_sketches.py."""
    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.expr("theta_sketch_agg(user_id)").alias("sk")
    )
    a, b = sk.alias("a"), sk.alias("b")
    return (
        a.join(b, F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.expr("theta_sketch_estimate(theta_intersection(a.sk, b.sk))")
            .cast("long")
            .alias("approx_common_users"),
            F.expr("theta_sketch_estimate(theta_union(a.sk, b.sk))")
            .cast("long")
            .alias("approx_either_users"),
        )
    )


def kll_value_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile rollup on KLL sketches (the successor to GK with
    proven rank error): per-type p50/p90/p99 of purchase value, plus the
    overall row obtained by MERGING the per-type sketches — no rescan,
    same pattern as hll_users_rollup. Rows-only (sketch estimates);
    rank-error accuracy gated in tests/test_sketches.py."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.expr("kll_sketch_agg_double(value)").alias("sk")
    )
    quantiles = [
        F.round(F.expr(f"kll_sketch_get_quantile_double(sk, {q})"), 4).alias(name)
        for q, name in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99"))
    ]
    est = per_type.select("event_type", *quantiles)
    overall = per_type.agg(
        F.expr("kll_merge_agg_double(sk)").alias("sk")
    ).select(F.lit("__all__").alias("event_type"), *quantiles)
    return est.unionByName(overall)


def _sketch_store(spark: SparkSession, sf_dir: str) -> str:
    """Persist per-(batch, type) sketch STATE as binary columns — the
    level-1 half of the cross-batch rollup a 100 TB deployment actually
    runs: each ingest batch stores a few KB of HLL registers / KLL
    compactors per group; every later rollup merges STORED state and
    never rescans events. Batches = event_id % 8 (any partitioning
    works — merge is associative; order-invariance pinned in
    tests/test_sketches.py)."""
    store = os.path.join(
        tempfile.gettempdir(),
        f"sketchstore-{spark.sparkContext.applicationId}-{abs(hash(sf_dir)) % 10**8}",
    )
    if not os.path.exists(store):
        ev = load_table(spark, sf_dir, "events")
        (
            ev.withColumn("_batch", F.pmod(F.col("event_id"), F.lit(8)))
            .groupBy("_batch", "event_type")
            .agg(
                F.hll_sketch_agg("user_id", F.lit(14)).alias("hll"),
                F.expr("kll_sketch_agg_double(value)").alias("kll"),
            )
            .write.mode("ignore")
            .parquet(store)
        )
    return store


def hll_users_rollup_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-LEVEL mergeable cardinality rollup from PERSISTED sketch
    state (r12 verdict item 7): level 1 stored per-(batch, type) HLL
    register blobs (``_sketch_store``); level 2 — this query — reads
    the binary columns back and UNIONS them per type and overall. HLL
    union takes the register-wise max, so the two-level estimate is
    bit-identical to the single-scan rollup whatever the merge order —
    and still lands inside the published 3·rsd bound vs the exact
    DuckDB cardinality (the driver's bounds gate)."""
    stored = spark.read.parquet(_sketch_store(spark, sf_dir))
    per_type = stored.groupBy("event_type").agg(F.hll_union_agg("hll").alias("sk"))
    est = per_type.select(
        "event_type", F.hll_sketch_estimate("sk").alias("approx_users")
    )
    overall = per_type.agg(
        F.lit("__all__").alias("event_type"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
    )
    return est.unionByName(overall)


def kll_value_rollup_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-LEVEL quantile rollup from the same persisted state: merge
    the stored per-batch KLL compactor blobs per type (and overall)
    and read p50/p90/p99 off the MERGED sketch — KLL's merge keeps the
    published rank-error bound (ε=1.65 % at k=200) regardless of how
    many levels the state passed through, which is what makes
    store-and-merge safe at any batch topology."""
    stored = spark.read.parquet(_sketch_store(spark, sf_dir))
    per_type = stored.groupBy("event_type").agg(
        F.expr("kll_merge_agg_double(kll)").alias("sk")
    )
    quantiles = [
        F.round(F.expr(f"kll_sketch_get_quantile_double(sk, {q})"), 4).alias(name)
        for q, name in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99"))
    ]
    est = per_type.select("event_type", *quantiles)
    overall = per_type.agg(
        F.expr("kll_merge_agg_double(sk)").alias("sk")
    ).select(F.lit("__all__").alias("event_type"), *quantiles)
    return est.unionByName(overall)


def incremental_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance: the stored hourly rollup (history =
    event_id % 5 != 0) is MERGED with the new batch's partial rollup
    (event_id % 5 == 0) by re-aggregating partials — counts add, sums add
    — with NO rescan of history rows. The oracle aggregates all events
    directly, certifying merged-partials == full-recompute, i.e. the
    incremental refresh is lossless. Sums accumulate in exact decimal
    (functions/precision.py) so partial-merge order cannot shift the last
    bits — the property that makes incremental refresh safe at any
    cluster topology."""
    ev = load_table(spark, sf_dir, "events")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
        ).agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)")).alias("_sv"),
        )

    old = partial(ev.filter(F.col("event_id") % 5 != 0))
    delta = partial(ev.filter(F.col("event_id") % 5 == 0))
    return (
        old.unionByName(delta)
        .groupBy("hour", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("_sv"), 2).cast("double").alias("sum_value"),
        )
    )


def event_debounce_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once ingestion cleanup: suppress events landing within 60s
    of the previous event of the same (user, type) — the debounce dedup
    every clickstream pipeline runs before sessionization (retransmits
    and double-fires arrive as near-simultaneous repeats). One window
    partitioned by (user_id, event_type) ordered by (ts, event_id) — max
    task is one user-type stream, never the table — then a per-type
    rollup. The suppression predicate compares raw timestamps (ts <
    prev + 60s interval), exact at microsecond precision in both
    engines; no epoch truncation."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    prev = F.lag("ts").over(w)
    suppressed = (
        prev.isNotNull() & (F.col("ts") < prev + F.expr("INTERVAL 60 SECONDS"))
    ).cast("long")
    return (
        ev.withColumn("_sup", suppressed)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(1 - F.col("_sup")).alias("n_kept"),
            F.sum("_sup").alias("n_suppressed"),
            F.round(F.sum("_sup") / F.count("*"), 4).alias("suppressed_frac"),
        )
    )


def event_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type inter-arrival distribution — the traffic-model input for
    capacity planning and anomaly thresholds: gaps between a user's
    consecutive events of the same type (per-entity lag window — the
    bounded shape every per-key window here shares), rolled up per type
    to count, mean, and exact interpolated p50/p90. Gaps stay exact
    long microseconds until the final per-type statistics, so both
    engines interpolate identical integer sequences."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = (
        ev.withColumn(
            "gap_us",
            F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w)),
        )
        .filter(F.col("gap_us").isNotNull())
    )
    return gaps.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        F.round(F.sum("gap_us").cast("double") / F.count("*") / 1e6, 3).alias(
            "mean_gap_s"
        ),
        F.round(F.percentile("gap_us", F.lit(0.5)) / 1e6, 3).alias("p50_gap_s"),
        F.round(F.percentile("gap_us", F.lit(0.9)) / 1e6, 3).alias("p90_gap_s"),
    )


QUERIES = {
    "count_star_events": count_star_events,
    "first_events": first_events,
    "purchase_stats_per_user": purchase_stats_per_user,
    "event_type_stats": event_type_stats,
    "latest_event_per_user": latest_event_per_user,
    "time_partition_counts": time_partition_counts,
    "events_landed_partition_counts": events_landed_partition_counts,
    "landed_file_stats": landed_file_stats,
    "hourly_type_windows": hourly_type_windows,
    "sliding_window_counts": sliding_window_counts,
    "event_transition_matrix": event_transition_matrix,
    "event_disorder_stats": event_disorder_stats,
    "user_sessions": user_sessions,
    "insert_key_generation": insert_key_generation,
    "users_view_no_purchase": users_view_no_purchase,
    "events_json_props": events_json_props,
    "approx_users_per_type": approx_users_per_type,
    "approx_value_quantiles": approx_value_quantiles,
    "events_asof_order_state": events_asof_order_state,
    "events_in_purchase_windows": events_in_purchase_windows,
    "hll_users_rollup": hll_users_rollup,
    "session_window_stats": session_window_stats,
    "event_funnel": event_funnel,
    "event_rate_anomaly": event_rate_anomaly,
    "user_retention_cohorts": user_retention_cohorts,
    "events_zorder_stats": events_zorder_stats,
    "theta_user_overlap": theta_user_overlap,
    "kll_value_rollup": kll_value_rollup,
    "hll_users_rollup_merged": hll_users_rollup_merged,
    "kll_value_rollup_merged": kll_value_rollup_merged,
    "incremental_hourly_rollup": incremental_hourly_rollup,
    "event_debounce_dedup": event_debounce_dedup,
    "event_interarrival_stats": event_interarrival_stats,
}

ORACLE = {
    "count_star_events": "SELECT COUNT(*) AS n_events FROM events",
    "first_events": """
        SELECT event_id, user_id, event_type, ROUND(value, 2) AS value
        FROM events ORDER BY event_id LIMIT 5
    """,
    "purchase_stats_per_user": """
        SELECT user_id, COUNT(*) AS n_purchases, ROUND(SUM(value), 2) AS total_value
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    """,
    "event_type_stats": """
        SELECT event_type, COUNT(*) AS n_events, ROUND(AVG(value), 4) AS avg_value,
               MIN(ts) AS first_ts, MAX(ts) AS last_ts,
               COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type
    """,
    "latest_event_per_user": """
        SELECT user_id, event_id, event_type, ROUND(value, 2) AS value
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                         ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    "time_partition_counts": """
        SELECT EXTRACT(year FROM ts)::INT AS year, EXTRACT(month FROM ts)::INT AS month,
               EXTRACT(day FROM ts)::INT AS day, EXTRACT(hour FROM ts)::INT AS hour,
               COUNT(*) AS n_events
        FROM events GROUP BY 1, 2, 3, 4
    """,
    "events_landed_partition_counts": """
        SELECT EXTRACT(year FROM ts)::INT AS year, EXTRACT(month FROM ts)::INT AS month,
               EXTRACT(day FROM ts)::INT AS day, EXTRACT(hour FROM ts)::INT AS hour,
               COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
          AND EXTRACT(hour FROM ts)::INT < 12
        GROUP BY 1, 2, 3, 4
    """,
    "hourly_type_windows": """
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
               COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "user_sessions": """
        WITH gaps AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN COALESCE(epoch_us(ts) - epoch_us(
                            LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)),
                            1800000001) > 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ), sids AS (
            SELECT user_id,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM gaps
        )
        SELECT user_id, MAX(session_id)::BIGINT AS n_sessions, COUNT(*) AS n_events
        FROM sids GROUP BY user_id
    """,
    "insert_key_generation": """
        SELECT event_id,
               (ROW_NUMBER() OVER (ORDER BY event_id) + 999)::BIGINT AS new_id
        FROM events
    """,
    "users_view_no_purchase": """
        SELECT user_id FROM (
            SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
        )
        EXCEPT ALL
        SELECT user_id FROM (
            SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        )
    """,
    "events_json_props": """
        SELECT event_type,
               ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
               MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        FROM events GROUP BY event_type
    """,
}

# DuckDB has a native ASOF JOIN — the oracle uses it directly, which also
# cross-validates our union-window composition against an independent
# point-in-time implementation.
ORACLE["events_asof_order_state"] = """
    WITH latest_per_day AS (
        SELECT o_custkey, o_orderdate,
               MAX(o_orderkey) AS o_orderkey,
               ROUND(MAX(o_totalprice), 2) AS o_totalprice
        FROM orders GROUP BY 1, 2
    )
    SELECT e.event_id, e.user_id,
           o.o_orderkey AS asof_orderkey,
           o.o_totalprice AS asof_total
    FROM events e
    ASOF LEFT JOIN latest_per_day o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""

ORACLE["events_in_purchase_windows"] = """
    SELECT v.user_id,
           COUNT(*) AS n_view_purchase_pairs,
           COUNT(DISTINCT p.event_id) AS n_purchases_with_views
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') v
    JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND v.ts >= p.ts
     AND v.ts <= p.ts + INTERVAL 1 HOUR
    GROUP BY v.user_id
"""

ORACLE["session_window_stats"] = """
    WITH gaps AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN COALESCE(epoch_us(ts) - epoch_us(
                        LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)),
                        1800000000) >= 1800000000
                    THEN 1 ELSE 0 END AS brk
        FROM events
    ), sids AS (
        -- same (ts, event_id) tiebreak as the brk window: with duplicate
        -- (user_id, ts) at a session boundary an untied cumulative sum can
        -- order a tied row before its brk=1 row — a flaky oracle mismatch.
        SELECT user_id, ts, value,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM gaps
    )
    SELECT user_id,
           epoch_us(MIN(ts)) AS session_start_us,
           epoch_us(MAX(ts)) + 1800000000 AS session_end_us,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE) AS sum_value
    FROM sids GROUP BY user_id, sid
"""

ORACLE["event_funnel"] = """
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        JOIN s1 USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id
    ), s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
        JOIN s2 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
    )
    SELECT 1 AS stage, 'view' AS stage_name, COUNT(*) AS n_users FROM s1
    UNION ALL
    SELECT 2, 'click', COUNT(*) FROM s2
    UNION ALL
    SELECT 3, 'purchase', COUNT(*) FROM s3
"""

ORACLE["event_rate_anomaly"] = """
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n_events
        FROM events GROUP BY 1, 2
    ), scored AS (
        SELECT event_type, hour, n_events,
               AVG(n_events) OVER w AS mu,
               STDDEV_SAMP(n_events) OVER w AS sd,
               COUNT(n_events) OVER w AS nprev
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY hour
                     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, hour, n_events,
           ROUND(CASE WHEN nprev >= 12 AND sd > 0
                      THEN (n_events - mu) / sd END, 4) AS z_score,
           COALESCE(abs(CASE WHEN nprev >= 12 AND sd > 0
                             THEN (n_events - mu) / sd END) > 3.0, false) AS anomaly
    FROM scored
"""

ORACLE["user_retention_cohorts"] = """
    WITH firsts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
        FROM events GROUP BY user_id
    ), active AS (
        SELECT DISTINCT e.user_id, f.cohort_date,
               datediff('day', f.cohort_date, CAST(e.ts AS DATE)) AS day_offset
        FROM events e JOIN firsts f USING (user_id)
    )
    SELECT cohort_date, day_offset, COUNT(*) AS n_users
    FROM active GROUP BY cohort_date, day_offset
"""

# generated by operators/layout.py:zorder_sql(["u","d"], 8) so the Spark
# expression and the oracle stay in lockstep bit-for-bit
ORACLE["events_zorder_stats"] = """
    WITH q AS (
        SELECT user_id % 256 AS u, date_part('day', ts) AS d FROM events
    ), z AS (
        SELECT u, d, ((((u >> 0) & 1) << 0) | (((d >> 0) & 1) << 1) | (((u >> 1) & 1) << 2) | (((d >> 1) & 1) << 3) | (((u >> 2) & 1) << 4) | (((d >> 2) & 1) << 5) | (((u >> 3) & 1) << 6) | (((d >> 3) & 1) << 7) | (((u >> 4) & 1) << 8) | (((d >> 4) & 1) << 9) | (((u >> 5) & 1) << 10) | (((d >> 5) & 1) << 11) | (((u >> 6) & 1) << 12) | (((d >> 6) & 1) << 13) | (((u >> 7) & 1) << 14) | (((d >> 7) & 1) << 15)) AS zvalue FROM q
    )
    SELECT zvalue >> 10 AS bucket, COUNT(*) AS n_events,
           MIN(u) AS u_min, MAX(u) AS u_max,
           MIN(d) AS d_min, MAX(d) AS d_max
    FROM z GROUP BY 1
"""

ORACLE["incremental_hourly_rollup"] = """
    SELECT date_trunc('hour', ts) AS hour, event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
"""

# one file per hour partition is the landing-write contract, so the
# physical file count equals the distinct-hour count per day
ORACLE["landed_file_stats"] = """
    SELECT EXTRACT(year FROM ts)::INT AS year,
           EXTRACT(month FROM ts)::INT AS month,
           EXTRACT(day FROM ts)::INT AS day,
           COUNT(DISTINCT EXTRACT(hour FROM ts)) AS n_hour_partitions,
           COUNT(DISTINCT EXTRACT(hour FROM ts)) AS n_files,
           COUNT(*) AS n_rows,
           ROUND(COUNT(*)::DOUBLE / COUNT(DISTINCT EXTRACT(hour FROM ts)), 2)
               AS rows_per_file
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
    GROUP BY 1, 2, 3
"""

# sliding windows: every event lands in the 4 windows whose start is
# within (ts - 1h, ts], at 15-minute alignment — replicated by unnesting
# the 4 offsets from the event's 15-minute bucket
ORACLE["sliding_window_counts"] = """
    WITH exploded AS (
        SELECT time_bucket(INTERVAL '15 minutes', ts)
                   - (o.i * INTERVAL '15 minutes') AS window_start,
               event_type, value
        FROM events, (SELECT unnest(range(4)) AS i) o
        WHERE time_bucket(INTERVAL '15 minutes', ts)
                   - (o.i * INTERVAL '15 minutes') > ts - INTERVAL '1 hour'
    )
    SELECT window_start, event_type, COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM exploded GROUP BY 1, 2
"""

ORACLE["event_transition_matrix"] = """
    WITH pairs AS (
        SELECT event_type AS from_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
        FROM events
    ), counts AS (
        SELECT from_type, to_type, COUNT(*) AS n_transitions
        FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, n_transitions,
           ROUND(n_transitions / SUM(n_transitions) OVER (PARTITION BY from_type), 4)
               AS share
    FROM counts
"""

ORACLE["event_disorder_stats"] = """
    WITH steps AS (
        SELECT event_type,
               GREATEST(0.0,
                   (epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY event_id))
                    - epoch_us(ts)) / 1000000.0) AS backstep_s
        FROM events
        QUALIFY LAG(ts) OVER (PARTITION BY user_id ORDER BY event_id) IS NOT NULL
    )
    SELECT event_type, COUNT(*) AS n_pairs,
           SUM(CASE WHEN backstep_s > 0 THEN 1 ELSE 0 END) AS n_regressions,
           ROUND(SUM(CASE WHEN backstep_s > 0 THEN 1 ELSE 0 END)::DOUBLE / COUNT(*), 4)
               AS regression_frac,
           ROUND(MAX(backstep_s), 1) AS max_backstep_s
    FROM steps GROUP BY 1
"""
ORACLE["event_debounce_dedup"] = """
    WITH marked AS (
        SELECT event_type,
               CASE WHEN LAG(ts) OVER w IS NOT NULL
                         AND ts < LAG(ts) OVER w + INTERVAL 60 SECOND
                    THEN 1 ELSE 0 END AS sup
        FROM events
        WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
    )
    SELECT event_type, COUNT(*) AS n_events,
           CAST(SUM(1 - sup) AS BIGINT) AS n_kept,
           CAST(SUM(sup) AS BIGINT) AS n_suppressed,
           ROUND(SUM(sup)::DOUBLE / COUNT(*), 4) AS suppressed_frac
    FROM marked GROUP BY 1
"""
ORACLE["event_interarrival_stats"] = """
    WITH g AS (
        SELECT event_type,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id) AS gap_us
        FROM events
    )
    SELECT event_type, COUNT(*) AS n_gaps,
           ROUND(CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) / 1e6, 3) AS mean_gap_s,
           ROUND(quantile_cont(gap_us, 0.5) / 1e6, 3) AS p50_gap_s,
           ROUND(quantile_cont(gap_us, 0.9) / 1e6, 3) AS p90_gap_s
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY event_type
"""


def multi_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution — the marketing-analytics op next
    to first_touch_conversion's single-touch rule: every purchase's
    value is split EQUALLY across the user's view/click touches in the
    preceding 24h; purchases with no preceding touch credit a 'direct'
    channel in full. The per-touch share is rounded to 6dp then
    accumulated in exact DECIMAL (order-insensitive, the dsum
    discipline), so the engine and the oracle agree to the cent.

    Shape: one point-in-interval join purchases⋈touches on user_id (the
    as-of family's range join — at 100 TB pre-bucket both sides by
    (user_id, day) so the range probe stays partition-local), one
    per-purchase count, one channel rollup."""
    from pyspark.sql.types import DecimalType

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id"),
        F.col("ts").alias("pts"),
        F.col("value"),
    )
    t = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id"),
        F.col("event_type").alias("channel"),
        F.col("ts").alias("tts"),
        F.col("event_id").alias("tid"),
    )
    j = p.join(
        t,
        (p["user_id"] == t["user_id"])
        & (t["tts"] < p["pts"])
        & (t["tts"] >= p["pts"] - F.expr("INTERVAL 24 HOURS")),
        "left",
    ).select("pid", "value", "channel", "tid")
    # ONE pass: per-purchase touch count as a window over the join
    # output, direct fallback folded in with CASE — referencing j from
    # separate touched/direct branches re-executed the whole join per
    # branch (3 scans in the physical plan before this shape)
    n_touches = F.count("tid").over(Window.partitionBy("pid"))
    dec6 = DecimalType(28, 6)
    credits = (
        j.withColumn("n_touches", n_touches)
        .filter(F.col("tid").isNotNull() | (F.col("n_touches") == 0))
        .select(
            F.when(F.col("n_touches") == 0, F.lit("direct"))
            .otherwise(F.col("channel"))
            .alias("channel"),
            "pid",
            F.when(F.col("n_touches") == 0, F.col("value"))
            .otherwise(F.round(F.col("value") / F.col("n_touches"), 6))
            .cast(dec6)
            .alias("share"),
        )
    )
    return (
        credits.groupBy("channel")
        .agg(
            F.count_distinct("pid").alias("n_purchases"),
            F.round(F.sum("share"), 2).cast("double").alias("attributed_value"),
        )
        .orderBy("channel")
    )


QUERIES["multi_touch_attribution"] = multi_touch_attribution
ORACLE["multi_touch_attribution"] = """
    WITH p AS (
        SELECT event_id AS pid, user_id, ts AS pts, value
        FROM events WHERE event_type = 'purchase'
    ), t AS (
        SELECT user_id, event_type AS channel, ts AS tts, event_id AS tid
        FROM events WHERE event_type IN ('view', 'click')
    ), j AS (
        SELECT p.pid, p.value, t.channel, t.tid
        FROM p LEFT JOIN t
          ON p.user_id = t.user_id
         AND t.tts < p.pts AND t.tts >= p.pts - INTERVAL 24 HOUR
    ), counts AS (
        SELECT pid, value, COUNT(tid) AS n_touches FROM j GROUP BY 1, 2
    ), credits AS (
        SELECT j.channel, j.pid,
               CAST(ROUND(j.value / c.n_touches, 6) AS DECIMAL(28,6)) AS share
        FROM j JOIN counts c USING (pid)
        WHERE j.tid IS NOT NULL
        UNION ALL
        SELECT 'direct', pid, CAST(value AS DECIMAL(28,6))
        FROM counts WHERE n_touches = 0
    )
    SELECT channel, COUNT(DISTINCT pid) AS n_purchases,
           CAST(ROUND(SUM(share), 2) AS DOUBLE) AS attributed_value
    FROM credits GROUP BY channel ORDER BY channel
"""


def user_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over per-user active DAYS — the retention
    primitive cohort tables can't answer (streaks, not buckets): for
    each user, the count of maximal consecutive-day activity runs, the
    longest run, and total active days. Integer anchor trick
    (day_number − row_number is constant within a run), so everything
    is exact integers: one distinct, one per-user window on days (a
    user's DISTINCT DAYS are bounded — 31 here, ~thousands ever — so
    the per-user sort never concentrates raw events), two aggregates."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("day_num"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day_num")
    runs = (
        days.withColumn("anchor", F.col("day_num") - F.row_number().over(w))
        .groupBy("user_id", "anchor")
        .agg(F.count("*").alias("streak"))
    )
    return (
        runs.groupBy("user_id")
        .agg(
            F.count("*").alias("n_islands"),
            F.max("streak").alias("longest_streak"),
            F.sum("streak").alias("active_days"),
        )
        .orderBy("user_id")
    )


QUERIES["user_activity_islands"] = user_activity_islands
ORACLE["user_activity_islands"] = """
    WITH days AS (
        SELECT DISTINCT user_id,
               DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_num
        FROM events
    ), runs AS (
        SELECT user_id,
               day_num - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day_num)
                   AS anchor,
               COUNT(*) OVER () * 0 AS _z
        FROM days
    ), streaks AS (
        SELECT user_id, anchor, COUNT(*) AS streak
        FROM runs GROUP BY 1, 2
    )
    SELECT user_id, COUNT(*) AS n_islands,
           CAST(MAX(streak) AS BIGINT) AS longest_streak,
           CAST(SUM(streak) AS BIGINT) AS active_days
    FROM streaks GROUP BY user_id ORDER BY user_id
"""


def user_value_time_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of the ``value`` signal per user — the
    TSDB aggregate a plain AVG gets wrong under irregular sampling
    (a value that held for hours must outweigh one overwritten in
    seconds): each observation is weighted by its holding interval
    (microseconds until the user's next event; the last observation has no
    interval and drops out, the standard left-closed TWA). Weighted
    mass accumulates in exact DECIMAL (value × integer seconds), so
    engine and oracle agree exactly. One per-user lead() window, one
    aggregate."""
    from pyspark.sql.types import DecimalType

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = ev.select(
        "user_id",
        "value",
        (
            F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")
        ).alias("hold_us"),
    ).filter(F.col("hold_us").isNotNull())
    mass = (F.col("value") * F.col("hold_us")).cast(DecimalType(28, 6))
    return (
        stepped.groupBy("user_id")
        .agg(
            F.sum("hold_us").alias("observed_us"),
            F.round(
                F.sum(mass).cast("double") / F.sum("hold_us"), 6
            ).alias("twa_value"),
        )
        .orderBy("user_id")
    )


QUERIES["user_value_time_weighted"] = user_value_time_weighted
ORACLE["user_value_time_weighted"] = """
    WITH stepped AS (
        SELECT user_id, value,
               LEAD(EPOCH_US(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   - EPOCH_US(ts) AS hold_us
        FROM events
    )
    SELECT user_id,
           CAST(SUM(hold_us) AS BIGINT) AS observed_us,
           ROUND(CAST(SUM(CAST(value * hold_us AS DECIMAL(28,6))) AS DOUBLE)
                 / SUM(hold_us), 6) AS twa_value
    FROM stepped WHERE hold_us IS NOT NULL
    GROUP BY user_id ORDER BY user_id
"""


def user_balance_clamped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamped running balance per user — purchases credit ``value``,
    errors debit it, and the balance can never go below zero (the
    prepaid-account/inventory semantics): a NON-ASSOCIATIVE per-row
    recurrence ``bal_i = max(0, bal_{i-1} + delta_i)`` that looks like
    it forces a stateful per-key scan. It doesn't: by the max-plus
    identity, ``bal_n = S_n − min(0, min_{k≤n} S_k)`` (the clamp only
    ever 'forgives' the deepest prefix deficit), and a clamp fires
    exactly at the strict new minima of S below zero. So the whole
    operator is two ordered windows over the plain running sum —
    JVM-side, whole-stage-codegen, no Python state, and exactly
    SQL-stateable for the oracle. Per-user event order is pinned by
    (ts, event_id) so both engines accumulate in the identical IEEE
    order."""
    ev = load_table(spark, sf_dir, "events")
    delta = (
        F.when(F.col("event_type") == "purchase", F.col("value"))
        .when(F.col("event_type") == "error", -F.col("value"))
        .otherwise(None)
    )
    flows = ev.select("user_id", "ts", "event_id", delta.alias("delta")).filter(
        F.col("delta").isNotNull()
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    stepped = flows.withColumn("s", F.sum("delta").over(w)).withColumn(
        "prev_min", F.min("s").over(wprev)
    )
    clamped = (F.col("s") < 0) & (
        F.col("prev_min").isNull() | (F.col("s") < F.col("prev_min"))
    )
    # bal_N = S_N − min(0, min_k S_k), and S_N is simply the delta total
    return (
        stepped.groupBy("user_id")
        .agg(
            F.round(
                F.sum("delta") - F.least(F.lit(0.0), F.min("s")), 2
            ).alias("final_balance"),
            F.sum(clamped.cast("int")).alias("n_clamped"),
            F.count("*").alias("n_flows"),
        )
        .orderBy("user_id")
    )


QUERIES["user_balance_clamped"] = user_balance_clamped
ORACLE["user_balance_clamped"] = """
    WITH flows AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'purchase' THEN value
                    WHEN event_type = 'error' THEN -value END AS delta
        FROM events
        WHERE event_type IN ('purchase', 'error')
    ), sums AS (
        SELECT user_id, ts, event_id, delta,
               SUM(delta) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS s
        FROM flows
    ), stepped AS (
        SELECT user_id, delta, s,
               MIN(s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_min
        FROM sums
    )
    SELECT user_id,
           ROUND(SUM(delta) - LEAST(0.0, MIN(s)), 2) AS final_balance,
           CAST(SUM(CASE WHEN s < 0 AND (prev_min IS NULL OR s < prev_min)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped,
           COUNT(*) AS n_flows
    FROM stepped
    GROUP BY user_id ORDER BY user_id
"""


def stream_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization through STRUCTURED STREAMING, certified against
    the batch oracle — the events arrive as three event-time-ordered
    micro-batches (file source, maxFilesPerTrigger=1), sessions build
    in state via the native session_window with a 1-hour watermark, and
    append mode emits each session only when the watermark closes it.
    A far-future sentinel event rides the last wave so the final
    no-data micro-batch advances the watermark past ALL real data and
    flushes every open session — without it, append mode correctly
    holds the tail sessions open forever, which is exactly the
    semantics this query demonstrates. The streamed result must equal
    plans/events.py:session_window_stats batch-for-batch (same oracle),
    proving the streaming state machinery — merge-on-arrival,
    watermark finalization, exactly-once file sink — changes nothing
    about the answer."""
    import os
    import tempfile

    key = (spark.sparkContext.applicationId, sf_dir, "stream_sessions")
    out = _STREAM_SESS_MEMO.get(key)
    if out is None:
        root = os.path.join(
            tempfile.gettempdir(),
            f"ssess-{spark.sparkContext.applicationId}-{abs(hash(sf_dir)) % 10**8}",
        )
        src, out, ckpt = (os.path.join(root, d) for d in ("src", "out", "ckpt"))
        if not os.path.exists(out):
            ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
            day = F.dayofmonth("ts")
            waves = (day <= 10, (day > 10) & (day <= 20), day > 20)
            for i, cond in enumerate(waves):
                ev.filter(cond).coalesce(1).write.mode("append").parquet(
                    os.path.join(src, f"w{i}")
                )
            sentinel = spark.sql(
                "SELECT CAST(-1 AS LONG) user_id, TIMESTAMP '2025-01-01' ts,"
                " CAST(0.0 AS DOUBLE) value"
            )
            sentinel.coalesce(1).write.mode("append").parquet(
                os.path.join(src, "w2")
            )
            stream = (
                spark.readStream.schema("user_id long, ts timestamp, value double")
                .option("maxFilesPerTrigger", 1)
                .parquet(os.path.join(src, "w*"))
            )
            sess = (
                stream.withWatermark("ts", "1 hour")
                .groupBy(F.session_window(F.col("ts"), "30 minutes"), "user_id")
                .agg(
                    F.count("*").alias("n_events"),
                    F.round(F.sum(F.col("value").cast("decimal(28,6)")), 2)
                    .cast("double")
                    .alias("sum_value"),
                )
                .select(
                    "user_id",
                    F.unix_micros(F.col("session_window.start")).alias(
                        "session_start_us"
                    ),
                    F.unix_micros(F.col("session_window.end")).alias(
                        "session_end_us"
                    ),
                    "n_events",
                    "sum_value",
                )
            )
            q = (
                sess.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
        _STREAM_SESS_MEMO[key] = out
    return spark.read.parquet(out).filter(F.col("user_id") >= 0)


_STREAM_SESS_MEMO: dict = {}

QUERIES["stream_session_stats"] = stream_session_stats
# the streamed sessions must equal the batch session_window rollup
ORACLE["stream_session_stats"] = ORACLE["session_window_stats"]


_STREAM_PSI_MEMO: dict = {}


def stream_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Always-on ingestion drift canary
    (streaming/pipeline.py:psi_drift_monitor_sink): the event stream
    arrives as three micro-batches whose value distribution SHIFTS per
    wave (+30 per wave — the upstream-schema-change / sensor-recalibration
    shape), and every batch appends one (wave, n_events, psi) row
    measuring its fixed-bin PSI against the frozen wave-0 reference
    histogram. Per-batch cost is one hash aggregation to <= 10 rows;
    the PSI arithmetic is bounded by the bin-count parameter, so the
    monitor rides any CDC stream at 100 TB cadence. Wave 0's self-PSI
    is exactly 0; drift must grow with the shift. Output is keyed by
    the in-data wave tag, independent of micro-batch arrival order."""
    import os
    import tempfile

    from cdc_streaming_pipeline_spark.streaming.pipeline import (
        psi_drift_monitor_sink,
    )

    key = (spark.sparkContext.applicationId, sf_dir, "stream_psi")
    out = _STREAM_PSI_MEMO.get(key)
    if out is None:
        root = os.path.join(
            tempfile.gettempdir(),
            f"spsi-{spark.sparkContext.applicationId}-{abs(hash(sf_dir)) % 10**8}",
        )
        src, out, ckpt = (os.path.join(root, d) for d in ("src", "out", "ckpt"))
        if not os.path.exists(out):
            w = (F.col("event_id") % 3).cast("long")
            ev = load_table(spark, sf_dir, "events").select(
                w.alias("wave"),
                (F.col("value") + w.cast("double") * 30.0).alias("value"),
            )
            for i in range(3):
                ev.filter(F.col("wave") == i).coalesce(1).write.mode(
                    "append"
                ).parquet(os.path.join(src, f"w{i}"))
            ref = {
                int(r["_b"]): int(r["_c"])
                for r in ev.filter(F.col("wave") == 0)
                .groupBy(
                    F.greatest(
                        F.lit(0), F.least(F.floor(F.col("value") / 50.0), F.lit(9))
                    ).alias("_b")
                )
                .agg(F.count("*").alias("_c"))
                .collect()
            }
            q = (
                psi_drift_monitor_sink(
                    spark.readStream.schema("wave long, value double")
                    .option("maxFilesPerTrigger", 1)
                    .parquet(os.path.join(src, "w*")),
                    out,
                    ckpt,
                    value_col="value",
                    tag_col="wave",
                    ref_counts=ref,
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
        _STREAM_PSI_MEMO[key] = out
    return (
        spark.read.parquet(out)
        .select(F.col("tag").alias("wave"), "n_events", "psi")
        .orderBy("wave")
    )


QUERIES["stream_drift_psi"] = stream_drift_psi
ORACLE["stream_drift_psi"] = """
    WITH ev AS (
        SELECT event_id % 3 AS wave, value + (event_id % 3) * 30.0 AS v
        FROM events
    ), c AS (
        SELECT wave,
               GREATEST(LEAST(CAST(FLOOR(v / 50.0) AS BIGINT), 9), 0) AS b,
               COUNT(*) AS cnt
        FROM ev GROUP BY wave, b
    ), bins AS (
        SELECT w.wave, r.range AS b
        FROM (SELECT DISTINCT wave FROM ev) w, range(10) r
    ), f AS (
        SELECT bins.wave, bins.b, COALESCE(c.cnt, 0) AS cnt
        FROM bins LEFT JOIN c ON bins.wave = c.wave AND bins.b = c.b
    ), n AS (
        SELECT wave, CAST(SUM(cnt) AS DOUBLE) AS n FROM f GROUP BY wave
    ), ref AS (
        SELECT f.b, (f.cnt + 1.0) / (n.n + 10) AS p
        FROM f JOIN n USING (wave) WHERE f.wave = 0
    )
    SELECT f.wave,
           CAST(n.n AS BIGINT) AS n_events,
           ROUND(SUM((ref.p - (f.cnt + 1.0) / (n.n + 10))
                     * ln(ref.p / ((f.cnt + 1.0) / (n.n + 10)))), 6) AS psi
    FROM f JOIN n USING (wave) JOIN ref ON f.b = ref.b
    GROUP BY f.wave, n.n ORDER BY f.wave
"""
