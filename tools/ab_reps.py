#!/usr/bin/env python
"""Repeat-run timer for registered queries in ONE session (variance probe).

Usage: python tools/ab_reps.py [sf_dir] reps query [query ...]
Prints per-rep wall seconds per query (first rep pays setup/memo; the
distribution over later reps is the bimodality evidence).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_streaming_pipeline_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sfd = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sfd, args = args[0], args[1:]
    reps = int(args[0])
    names = args[1:]
    import __spark_entry__ as entrymod

    spark = get_spark("ab_reps", extra_conf={"spark.ui.showConsoleProgress": "false"})
    reg = entrymod.queries()
    print(f"local.dir={spark.conf.get('spark.local.dir', '<default>')}", flush=True)
    for name in names:
        fn = reg[name]
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sfd).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: {ts}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
