"""Local mirror of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
over the same parquet tables; compare row count, column names, and
order-insensitive values.

Usage: python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_conn(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif np.issubdtype(pdf[c].dtype, np.floating):
            pdf[c] = pdf[c].round(6)
        elif str(pdf[c].dtype).startswith("datetime"):
            pdf[c] = pdf[c].astype("datetime64[us]").astype(str)
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(
        drop=True
    )
    return pdf


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> str:
    if len(spark_pdf) != len(duck_pdf):
        return f"ROWS {len(spark_pdf)} vs {len(duck_pdf)}"
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return f"COLS {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    try:
        # integers may come back int32/int64/uint — compare as values
        for c in a.columns:
            if np.issubdtype(a[c].dtype, np.integer) and np.issubdtype(
                b[c].dtype, np.integer
            ):
                b[c] = b[c].astype(a[c].dtype)
        pd.testing.assert_frame_equal(a, b, check_dtype=False, atol=1e-9)
    except AssertionError as e:
        return "VALUES " + str(e).split("\n")[0] + _diff_sample(a, b)
    return "OK"


def _diff_sample(a: pd.DataFrame, b: pd.DataFrame) -> str:
    neq = (a.astype(str) != b.astype(str)).any(axis=1)
    if neq.any():
        i = int(neq.idxmax())
        return f" | first diff row {i}: spark={a.iloc[i].to_dict()} duck={b.iloc[i].to_dict()}"
    return ""


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from crawler_spark.queries import ORACLES, QUERIES
    from crawler_spark.session import get_spark

    spark = get_spark("contract_check", cores=8, shuffle_partitions=8)
    con = duck_conn(sf_dir)

    failures = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"{name:24s} SPARK-ERROR {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        if name not in ORACLES:
            print(f"{name:24s} rows-only ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            duck_pdf = con.execute(ORACLES[name]).df()
        except Exception as e:
            print(f"{name:24s} DUCK-ERROR {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        verdict = compare(name, spark_pdf, duck_pdf)
        status = verdict if verdict == "OK" else "FAIL " + verdict
        print(f"{name:24s} {status[:260]} ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
        if verdict != "OK":
            failures += 1
        # release per-query persisted intermediates (shingle/band
        # relations) — long-lived cached blocks degrade this runtime
        spark.catalog.clearCache()
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
