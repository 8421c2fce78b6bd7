"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, then compares row count, column-name
sets, and order-insensitive values (columns sorted by name, rows sorted).
Exact equality required — floats must already be rounded inside the query.

Usage: python tools/oracle_check.py [--json OUT.json] [--default-conf]
       [sf_dir] [query ...]

``--default-conf`` builds a vanilla SparkSession instead of get_spark() —
the same shape as the driver's harness, so conf-dependent breakage
(e.g. the round-4/5 TIMESTAMP_NTZ divergence) shows up HERE, not in the
driver gate.

With ``--json`` a per-query artifact in the driver's CORRECTNESS_r{N}
shape is written, covering EVERY registered query (the driver gate caps
at 50 rows; this file is the round's full-surface record, the round-4
lesson being that tail queries can rot invisibly without one).
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_streaming_pipeline_spark.session import get_spark
from cdc_streaming_pipeline_spark.sources.tables import TABLE_NAMES
from tools.bound_oracles import BOUND_ORACLES
from tools.py_oracles import PY_ORACLES


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        elif pd.api.types.is_integer_dtype(df[c]) or pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    scols, ocols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if scols != ocols:
        problems.append(f"schema spark={scols} oracle={ocols}")
        return problems
    if problems:
        return problems
    s, o = normalize(spark_pdf), normalize(oracle_pdf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv):
            neq = ~((sv == ov) | (sv.isna() & ov.isna()))
            if neq.any():
                i = neq.idxmax()
                problems.append(
                    f"col {c}: {int(neq.sum())} float mismatches, first @{i}: "
                    f"{sv[i]!r} vs {ov[i]!r} (maxdiff={float((sv-ov).abs().max())})"
                )
        else:
            neq = ~((sv == ov) | (sv.isna() & ov.isna()))
            if neq.any():
                i = neq.idxmax()
                problems.append(
                    f"col {c}: {int(neq.sum())} mismatches, first @{i}: {sv[i]!r} vs {ov[i]!r}"
                )
    return problems


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    default_conf = False
    while argv and argv[0].startswith("--"):
        if argv[0] == "--json":
            if len(argv) < 2:
                raise SystemExit("usage: --json <output-path> [sf_dir] [query ...]")
            json_out = argv[1]
            argv = argv[2:]
        elif argv[0] == "--default-conf":
            default_conf = True
            argv = argv[1:]
        else:
            raise SystemExit(f"unknown flag {argv[0]}")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    if default_conf:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[*]")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.ui.enabled", "false")
            .appName("oracle_check_default_conf")
            .getOrCreate()
        )
    else:
        spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failed, passed, rows_only, bounded = [], [], [], []
    records: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            records[name] = {
                "rows_match": False, "schema_match": None, "hash_match": None,
                "spark_rows": None, "oracle_rows": None,
                "err": f"spark: {type(e).__name__}: {str(e)[:200]}",
            }
            print(f"FAIL {name}: spark error: {e}")
            continue
        t_spark = time.time() - t0
        py_oracle = PY_ORACLES.get(name) if name not in oracles else None
        if name not in oracles and py_oracle is None:
            # sketch estimates are unhashable by design but NOT
            # uncheckable: assert each within its published error bound
            # vs the exact DuckDB answer (tools/bound_oracles.py)
            bound_fn = BOUND_ORACLES.get(name)
            if bound_fn is not None:
                try:
                    ok, detail = bound_fn(con, sf_dir, spark_pdf)
                except Exception as e:  # noqa: BLE001
                    ok, detail = False, f"bound oracle: {type(e).__name__}: {e}"
                records[name] = {
                    "rows_match": None, "schema_match": None, "hash_match": None,
                    "bounds_match": ok,
                    "spark_rows": len(spark_pdf), "oracle_rows": None,
                    "oracle_kind": "bounds",
                    "err": (detail or None) if not ok else None,
                    "sec": round(t_spark, 2),
                }
                if ok:
                    bounded.append(name)
                    print(f"BOUND {name}: within error bounds ({t_spark:.1f}s)")
                else:
                    failed.append(name)
                    print(f"FAIL {name}: bound violated: {detail}")
                continue
            rows_only.append(name)
            records[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(spark_pdf), "oracle_rows": None,
                "err": "no_oracle", "sec": round(t_spark, 2),
            }
            print(f"ROWS-ONLY {name}: {len(spark_pdf)} rows ({t_spark:.1f}s)")
            continue
        try:
            # SQL-inexpressible exact kernels (zlib, iterative BPE) get a
            # Spark-independent pure-Python oracle (tools/py_oracles.py)
            # through the SAME value compare as the DuckDB twins
            oracle_pdf = (
                con.execute(oracles[name]).df()
                if name in oracles
                else py_oracle(sf_dir)
            )
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            records[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(spark_pdf), "oracle_rows": None,
                "err": f"duckdb: {type(e).__name__}: {str(e)[:200]}",
            }
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = compare(name, spark_pdf, oracle_pdf)
        records[name] = {
            "rows_match": len(spark_pdf) == len(oracle_pdf),
            "schema_match": sorted(spark_pdf.columns) == sorted(oracle_pdf.columns),
            "hash_match": not problems,
            "spark_rows": len(spark_pdf), "oracle_rows": len(oracle_pdf),
            "err": "; ".join(problems)[:300] or None, "sec": round(t_spark, 2),
        }
        if py_oracle is not None:
            records[name]["oracle_kind"] = "python"
        if problems:
            failed.append(name)
            print(f"FAIL {name} ({len(spark_pdf)} rows, {t_spark:.1f}s)")
            for p in problems:
                print(f"   {p}")
        else:
            passed.append(name)
            print(f"OK   {name} ({len(spark_pdf)} rows, {t_spark:.1f}s)")

    if json_out:
        with open(json_out, "w", encoding="utf-8") as fh:
            json.dump(records, fh, indent=1)
            fh.write("\n")
    print(
        f"\n{len(passed)} passed, {len(failed)} failed, "
        f"{len(bounded)} bounds-certified, {len(rows_only)} rows-only "
        f"of {len(qs)} queries at {sf_dir}"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
