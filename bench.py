#!/usr/bin/env python
"""Benchmark harness — times every registered query at the given scale factor.

Runs each ``__spark_entry__.queries()`` entry on local[$SPARK_GRAFT_CPUS]
against $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints
exactly ONE JSON line to stdout:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Execution is forced with a noop-format write (full pipeline runs JVM-side,
nothing is collected to the driver). A short warmup scan amortizes JVM/
codegen startup out of the first measured query. Everything except the
final JSON line goes to stderr.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def read_cpu_ticks() -> dict[str, int] | None:
    """Aggregate /proc/stat cpu ticks — steal/idle deltas let a later
    reader adjudicate 'regression or noisy hypervisor?' without re-running
    (this box shows multi-minute steal bursts worth up to 3x on wall
    clock; see .benchmarks/DELTA_r4_r5.md)."""
    try:
        with open("/proc/stat", encoding="ascii") as fh:
            parts = fh.readline().split()
        names = ["user", "nice", "system", "idle", "iowait", "irq", "softirq", "steal"]
        return dict(zip(names, (int(v) for v in parts[1:9])))
    except Exception:  # noqa: BLE001 — non-Linux or locked-down /proc
        return None


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from cdc_streaming_pipeline_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("bench", extra_conf={"spark.ui.showConsoleProgress": "false"})
    queries = entrymod.queries()

    # Warmup: touch the biggest table (reader init) and run one tiny
    # synthetic pipeline exercising the expression classes the suite leans
    # on (JSON serde, window dedup, union, groupBy) so JVM/JIT/codegen
    # startup isn't attributed to whichever query happens to run first —
    # the registry leads with the CDC family, and without this they
    # measured ~2x slower purely from position.
    t0 = time.perf_counter()
    try:
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
        from pyspark.sql import Window, functions as F

        w = spark.range(10_000).select(
            F.col("id"),
            F.to_json(F.struct("id")).alias("j"),
        )
        parsed = w.select("id", F.from_json("j", "id bigint").alias("p"))
        win = Window.partitionBy(F.pmod("id", F.lit(7))).orderBy(F.col("id").desc())
        (
            parsed.unionByName(parsed)
            .withColumn("rn", F.row_number().over(win))
            .filter(F.col("rn") == 1)
            .groupBy(F.pmod("id", F.lit(3)))
            .count()
            .write.format("noop").mode("overwrite").save()
        )

        # spawn the Python worker pool across all cores (daemon start +
        # numpy/pandas import is ~6s cold for 32 workers — pay it here, not
        # inside whichever Arrow-stage query runs first)
        def _ident(batches):
            yield from batches

        (
            spark.range(32_000)
            .repartition(spark.sparkContext.defaultParallelism)
            .mapInPandas(_ident, "id long")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
    except Exception as exc:  # noqa: BLE001 — still emit the JSON contract line
        log(f"warmup failed: {exc}")
    log(f"warmup {time.perf_counter() - t0:.2f}s; {len(queries)} queries at {sf_dir}")

    # Each query is timed twice and the MIN is reported: the first run pays
    # one-time JVM/codegen compilation for that query's expression tree
    # (amortized to nothing over a real at-scale run) and this host shows
    # bursty external load. The two timings come from two FULL PASSES over
    # the registry, not back-to-back runs: hypervisor steal bursts on this
    # box last minutes (.benchmarks/DELTA_r4_r5.md), so consecutive runs
    # land in the same burst while the same query in pass 1 and pass 2 is
    # separated by the whole suite and rarely hit twice.
    ticks_before = read_cpu_ticks()
    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for pass_no in (1, 2):
        for name, fn in queries.items():
            if name in failures:
                continue
            try:
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                elapsed = time.perf_counter() - t0
            except Exception as exc:  # noqa: BLE001 — one bad query must not kill the bench
                failures[name] = f"{type(exc).__name__}: {exc}"
                timings.pop(name, None)
                log(f"{name}: FAILED {failures[name]}")
                continue
            if name in timings:
                timings[name] = min(timings[name], round(elapsed, 3))
            else:
                timings[name] = round(elapsed, 3)
            if pass_no == 2:
                log(f"{name}: {timings[name]}s")

    result = {
        "metric": "all_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "n_queries": len(timings),
        "queries": timings,
        "sf": sf,
    }
    if failures:
        result["failures"] = failures
    ticks_after = read_cpu_ticks()
    if ticks_before and ticks_after:
        delta = {k: ticks_after[k] - ticks_before[k] for k in ticks_before}
        busy = sum(delta.values()) or 1
        # host-noise context, local artifact only (never the driver line)
        result["host_cpu"] = {
            "steal_ticks": delta.get("steal", 0),
            "steal_frac": round(delta.get("steal", 0) / busy, 4),
            "idle_frac": round(delta.get("idle", 0) / busy, 4),
        }
    # Full per-query JSON always lands beside the repo so round-over-round
    # regression diffs (README "Bench continuity") have complete data.
    local = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json")
    with open(local, "w", encoding="utf-8") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
        fh.write("\n")

    print(fit_emit_line(result, timings, failures), flush=True)
    return 1 if failures else 0


def fit_emit_line(
    result: dict,
    timings: dict[str, float],
    failures: dict[str, str],
    max_line: int = 1800,
) -> str:
    """Compact the result into ONE JSON line that fits the driver's window.

    The driver keeps only the LAST 2000 chars of stdout and parses the JSON
    line out of that window (BENCH_r02/r03 both recorded parsed:null because
    the full 76-query line is ~2.3k chars and got cut mid-line). Emit a
    compact line and, if needed, drop per-query entries from the END of the
    registry (registry order is already the priority order: cdc family
    first, then the driver-gate block) until the line fits.
    """
    emit = dict(result)
    emit.pop("host_cpu", None)  # local-artifact context only
    # 2-decimal timings in the EMITTED line only (BENCH_LOCAL.json keeps
    # 3): the r16 driver run lost `cdc_txn_boundary_audit` — the 60th
    # driver-tracked query — because slightly longer timing strings
    # pushed the line over budget and the trim below dropped it. ~1 char
    # per entry buys the whole tracked block headroom.
    emit["queries"] = {k: round(v, 2) for k, v in timings.items()}
    if failures:
        # Full exception text is already persisted in BENCH_LOCAL.json;
        # an unbounded traceback here can blow past max_line even after
        # every query entry is dropped, cutting the line mid-JSON.
        emit["failures"] = {k: v[:120] for k, v in failures.items()}
    line = json.dumps(emit, separators=(",", ":"))
    # The first PROTECTED_PREFIX registry entries are the driver's
    # round-over-round tracked set; a tracked query missing from the line
    # is counted "dropped_from_bench" (r16 verdict). Trim untracked
    # entries first; only eat into the protected prefix if the line
    # STILL cannot fit (never happened with 267 queries; contract safety).
    protected = 60
    while len(line) > max_line and len(emit["queries"]) > protected:
        emit["queries"].pop(next(reversed(emit["queries"])))
        emit["queries_omitted"] = len(timings) - len(emit["queries"])
        line = json.dumps(emit, separators=(",", ":"))
    while len(line) > max_line and emit["queries"]:
        emit["queries"].pop(next(reversed(emit["queries"])))
        emit["queries_omitted"] = len(timings) - len(emit["queries"])
        line = json.dumps(emit, separators=(",", ":"))
    # Many-failure runs: queries can be exhausted while the failures dict
    # (120 chars/entry) alone still overflows the window. Shrink failure
    # text first, then drop entries, always keeping the total count.
    while len(line) > max_line and emit.get("failures"):
        if any(len(v) > 40 for v in emit["failures"].values()):
            emit["failures"] = {k: v[:40] for k, v in emit["failures"].items()}
        else:
            emit["failures"].pop(next(reversed(emit["failures"])))
        emit["failures_total"] = len(failures)
        line = json.dumps(emit, separators=(",", ":"))
    return line


if __name__ == "__main__":
    raise SystemExit(main())
