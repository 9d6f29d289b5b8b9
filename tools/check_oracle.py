"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet tables; compare row count, column names, and
order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            # Spark collects ns, DuckDB µs — same instants
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        problems.append(f"columns spark={sc} oracle={oc}")
        return problems
    s, o = normalize(spark_pdf), normalize(oracle_pdf)
    if len(s) == len(o):
        for c in s.columns:
            sv, ov = s[c], o[c]
            if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
                import numpy as np

                a = pd.to_numeric(sv, errors="coerce").to_numpy(dtype=float)
                b = pd.to_numeric(ov, errors="coerce").to_numpy(dtype=float)
                nan_ok = (pd.isna(a) == pd.isna(b)).all()
                exact = ((a == b) | (pd.isna(a) & pd.isna(b))).all()
                if not (nan_ok and exact):
                    diff = np.nanmax(np.abs(a - b)) if len(a) else 0
                    problems.append(f"values differ in '{c}' (max abs diff {diff:.3e})")
            else:
                neq = ~((sv == ov) | (pd.isna(sv) & pd.isna(ov)))
                if neq.any():
                    i = int(neq.idxmax())
                    problems.append(
                        f"values differ in '{c}' at row {i}: "
                        f"spark={sv.iloc[i]!r} oracle={ov.iloc[i]!r}"
                    )
            if f"dtype {c}" not in problems:
                if str(sv.dtype) != str(ov.dtype):
                    problems.append(f"dtype '{c}': spark={sv.dtype} oracle={ov.dtype}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, ".")
    import __spark_entry__ as e
    from odibi_spark import get_spark

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries, oracles = e.queries(), e.oracle_sql()
    failures, passed, rows_only = [], 0, 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append((name, [f"SPARK ERROR: {type(ex).__name__}: {ex}"]))
            print(f"FAIL  {name}: spark error {ex}")
            continue
        if name not in oracles:
            rows_only += 1
            print(f"rows  {name}: {len(sdf)} rows ({time.time()-t0:.1f}s) [rows-only]")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:
            failures.append((name, [f"ORACLE ERROR: {ex}"]))
            print(f"FAIL  {name}: oracle error {ex}")
            continue
        problems = compare(name, sdf, odf)
        if problems:
            failures.append((name, problems))
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            passed += 1
            print(f"ok    {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{passed} ok, {rows_only} rows-only, {len(failures)} failed")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
