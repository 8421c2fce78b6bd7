"""Per-stage empirical profiler for registered queries (guide §1).

Runs the named queries once with the Spark event log enabled, then parses
the log into a per-stage table: wall time, task time, max/median task,
shuffle read/write bytes, partition count, and the stage's callsite name.
This answers "where does the wall clock actually go" without the UI.

Usage: python tools/profile_query.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_streaming_pipeline_spark.session import get_spark


def profile(queries: list[str], sf_dir: str) -> None:
    import __spark_entry__ as entrymod

    evdir = tempfile.mkdtemp(prefix="spark-events-")
    spark = get_spark(
        "profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{evdir}",
            "spark.eventLog.compress": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    reg = entrymod.queries()
    sc = spark.sparkContext
    marks: dict[str, tuple[float, float]] = {}
    for name in queries:
        fn = reg[name]
        # one untimed run pays codegen/broadcast warmup like bench pass 1
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        sc.setJobDescription(f"PROFILE:{name}")
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        marks[name] = (t0, time.time())
        sc.setJobDescription(None)
    spark.stop()

    # parse the single application event log
    logf = []
    for root, _dirs, files in os.walk(evdir):
        for f in files:
            if not f.startswith(".") and "appstatus" not in f:
                logf.append(os.path.join(root, f))
    events = []
    for lf in logf:
        if lf.endswith(".zstd"):
            import zstandard

            fh = zstandard.ZstdDecompressor().stream_reader(open(lf, "rb"))
            import io

            lines = io.TextIOWrapper(fh, encoding="utf-8")
        else:
            lines = open(lf, encoding="utf-8")
        with lines:
            for line in lines:
                try:
                    events.append(json.loads(line))
                except json.JSONDecodeError:
                    pass

    # job id -> description; stage id -> info
    job_desc: dict[int, str] = {}
    job_stages: dict[int, list[int]] = {}
    for e in events:
        if e.get("Event") == "SparkListenerJobStart":
            props = e.get("Properties") or {}
            job_desc[e["Job ID"]] = props.get("spark.job.description", "")
            job_stages[e["Job ID"]] = [s["Stage ID"] for s in e.get("Stage Infos", [])]

    stage_rows: dict[int, dict] = {}
    task_stats: dict[int, list[tuple[float, int, int]]] = {}
    for e in events:
        if e.get("Event") == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            sid = si["Stage ID"]
            stage_rows[sid] = {
                "name": si.get("Name", "")[:70],
                "n_tasks": si.get("Number of Tasks"),
                "submit": si.get("Submission Time", 0),
                "complete": si.get("Completion Time", 0),
            }
        elif e.get("Event") == "SparkListenerTaskEnd":
            sid = e["Stage ID"]
            tm = e.get("Task Metrics") or {}
            dur = tm.get("Executor Run Time", 0)
            srm = (tm.get("Shuffle Read Metrics") or {})
            swm = (tm.get("Shuffle Write Metrics") or {})
            rd = srm.get("Local Bytes Read", 0) + srm.get("Remote Bytes Read", 0)
            wr = swm.get("Shuffle Bytes Written", 0)
            gc = tm.get("JVM GC Time", 0)
            task_stats.setdefault(sid, []).append((dur, rd, wr, gc))

    for qname, (t0, t1) in marks.items():
        print(f"\n=== {qname}  wall={t1 - t0:.3f}s ===")
        jids = sorted(j for j, d in job_desc.items() if d == f"PROFILE:{qname}")
        seen: set[int] = set()
        total_stage_wall = 0.0
        for j in jids:
            for sid in sorted(job_stages.get(j, [])):
                if sid in seen or sid not in stage_rows:
                    continue
                seen.add(sid)
                r = stage_rows[sid]
                ts = task_stats.get(sid, [])
                wall = (r["complete"] - r["submit"]) / 1000.0
                total_stage_wall += wall
                tt = sum(t[0] for t in ts) / 1000.0
                mx = max((t[0] for t in ts), default=0) / 1000.0
                rd = sum(t[1] for t in ts)
                wr = sum(t[2] for t in ts)
                gc = sum(t[3] for t in ts) / 1000.0
                print(
                    f"  stage {sid:4d} wall={wall:7.3f}s tasks={len(ts):3d} "
                    f"tasktime={tt:7.2f}s maxtask={mx:6.2f}s gc={gc:6.2f}s "
                    f"shufR={rd / 1e6:8.2f}MB shufW={wr / 1e6:8.2f}MB  {r['name']}"
                )
        print(f"  (sum of stage walls: {total_stage_wall:.3f}s; gaps = driver/planning)")


if __name__ == "__main__":
    args = sys.argv[1:]
    sfd = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sfd, args = args[0], args[1:]
    profile(args, sfd)
