"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, then compares row count, column-name
sets, and order-insensitive values (columns sorted by name, rows sorted).
Exact equality required — floats must already be rounded inside the query.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_streaming_pipeline_spark.session import get_spark
from cdc_streaming_pipeline_spark.sources.tables import TABLE_NAMES


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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failed, passed, rows_only = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            rows_only.append(name)
            print(f"ROWS-ONLY {name}: {len(spark_pdf)} rows ({t_spark:.1f}s)")
            continue
        try:
            oracle_pdf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = compare(name, spark_pdf, oracle_pdf)
        if problems:
            failed.append(name)
            print(f"FAIL {name} ({len(spark_pdf)} rows, {t_spark:.1f}s)")
            for p in problems:
                print(f"   {p}")
        else:
            passed.append(name)
            print(f"OK   {name} ({len(spark_pdf)} rows, {t_spark:.1f}s)")

    print(
        f"\n{len(passed)} passed, {len(failed)} failed, {len(rows_only)} rows-only "
        f"of {len(qs)} queries at {sf_dir}"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
