#!/usr/bin/env python
"""Dump .explain('formatted') for registered queries to files.

Usage: python tools/capture_plan.py <outdir> <suffix> query [query ...]
Writes <outdir>/<query>_<suffix>.txt for each query (sf via
$SPARK_GRAFT_SF_DIR, default sf0.1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_streaming_pipeline_spark.session import get_spark


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    sfd = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    import __spark_entry__ as entrymod

    spark = get_spark("plans", extra_conf={"spark.ui.showConsoleProgress": "false"})
    reg = entrymod.queries()
    for name in names:
        df = reg[name](spark, sfd)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
