#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same parquet tables; compare row count, column names, and
order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(f"columns differ: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}")
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count differs: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s, o = canon(spark_pdf), canon(oracle_pdf)
    if len(s) == len(o):
        for c in s.columns:
            sv, ov = s[c].to_numpy(), o[c].to_numpy()
            if sv.dtype.kind == "f" or ov.dtype.kind == "f":
                sv = sv.astype(np.float64)
                ov = ov.astype(np.float64)
                bad = ~((sv == ov) | (np.isnan(sv) & np.isnan(ov)))
                if bad.any():
                    i = int(np.argmax(bad))
                    problems.append(
                        f"col {c}: {int(bad.sum())} mismatches, first at row {i}: "
                        f"spark={sv[i]!r} oracle={ov[i]!r} (diff {sv[i]-ov[i]:.3e})"
                    )
            elif not (sv == ov).all():
                bad = sv != ov
                i = int(np.argmax(bad))
                problems.append(
                    f"col {c}: {int(bad.sum())} mismatches, first at row {i}: "
                    f"spark={sv[i]!r} oracle={ov[i]!r}"
                )
    return problems


def main() -> int:
    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as mod
    from sketchlib.session import get_spark

    spark = get_spark("check-oracles", cores=4)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = mod.queries()
    oracles = mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark query raised: {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"ok   {name}: rows-only (no oracle), {len(spark_pdf)} rows [{dt:.1f}s]")
            continue
        try:
            oracle_pdf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle raised: {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = compare(name, spark_pdf, oracle_pdf)
        if problems:
            failures += 1
            print(f"FAIL {name} [{dt:.1f}s]")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"ok   {name}: {len(spark_pdf)} rows match [{dt:.1f}s]")
    print(f"{'ALL OK' if not failures else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
