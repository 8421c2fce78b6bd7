"""Driver-shaped session smoke test (round-5 verdict item #2).

The correctness driver constructs its OWN SparkSession with default confs
and calls ``queries()[name](spark, sf_dir)`` — it never goes through
``session.get_spark()``, so confs pinned only at session build time never
apply there. Round 4/5 shipped exactly that bug: Spark 4 infers the
events-table parquet timestamp as TIMESTAMP_NTZ by default, and
``unix_micros(TIMESTAMP_NTZ)`` throws, so ``user_sessions`` was red in the
driver gate while ``test_registry_on_parquet.py`` (which runs under the
pinned conftest session) stayed green.

This test runs the timestamp-consuming registered queries in a SUBPROCESS
with a vanilla ``SparkSession.builder.getOrCreate()`` — a fresh JVM with
default confs, the same shape as the driver's harness. It must fail on any
revision where those queries rely on a build-time-only conf, and pass when
the fix lives at runtime in the read path (sources/tables.py load_table).
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

SF_DIR = "/root/testdata/sf0.001"

# Every registered query whose plan does event-time arithmetic — the class
# of query the NTZ inference breaks.
TIMESTAMP_QUERIES = [
    "user_sessions",
    "session_window_stats",
    "events_asof_order_state",
    "time_partition_counts",
    "hourly_type_windows",
    "latest_event_per_user",
    "cdc_latest_state",
    "cdc_state_as_of",
]

SCRIPT = textwrap.dedent(
    """
    import sys
    from pyspark.sql import SparkSession

    # Deliberately NOT session.get_spark(): default confs, like the driver.
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .appName("default-conf-smoke")
        .getOrCreate()
    )
    import __spark_entry__ as entry

    qs = entry.queries()
    sf_dir = sys.argv[1]
    failures = []
    for name in sys.argv[2].split(","):
        if name not in qs:
            continue  # registry may evolve; absence is not a session bug
        try:
            n = qs[name](spark, sf_dir).count()
            print(f"OK {name} rows={n}", flush=True)
        except Exception as exc:  # noqa: BLE001 - report every query
            failures.append(f"{name}: {type(exc).__name__}: {exc}")
    spark.stop()
    if failures:
        print("FAILED\\n" + "\\n".join(failures))
        sys.exit(1)
    print("ALL_GREEN")
    """
)


def test_timestamp_queries_under_default_conf_session():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT, SF_DIR, ",".join(TIMESTAMP_QUERIES)],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=600,
    )
    assert proc.returncode == 0, (
        "timestamp queries broke under a driver-shaped default-conf session:\n"
        + proc.stdout[-4000:]
        + proc.stderr[-2000:]
    )
    assert "ALL_GREEN" in proc.stdout
