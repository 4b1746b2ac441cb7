"""Mini-driver: run every queries() entry against its DuckDB oracle at
sf0.01 and report row-count / schema / value matches (emulates the
round driver's CORRECTNESS check, including order-insensitive
column-sorted value comparison). Usage:

    python scripts/check_queries.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float") or str(df[c].dtype).startswith("Float"):
            df[c] = df[c].astype("float64")
        elif str(df[c].dtype) in ("int32", "Int32", "Int64", "uint32"):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"schema spark={s_cols} duck={d_cols}")
        return problems
    if problems:
        return problems
    # The round driver hashes raw values (no dtype normalization), so a
    # float64-vs-int64 column (e.g. DuckDB HUGEINT sum -> float64) is a
    # hash mismatch even when values agree. Flag kind mismatches hard.
    for c in sorted(spark_pdf.columns):
        sk = spark_pdf[c].dtype.kind
        dk = duck_pdf[c].dtype.kind
        if sk != dk:
            problems.append(
                f"col {c}: dtype-kind mismatch spark={spark_pdf[c].dtype} "
                f"duck={duck_pdf[c].dtype} (driver hash would differ)"
            )
    if problems:
        return problems
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for c in s.columns:
        sv, dv = s[c].to_numpy(), d[c].to_numpy()
        if sv.dtype.kind == "f":
            exact = np.array_equal(sv, dv, equal_nan=True)
            if not exact:
                close = np.allclose(sv, dv, rtol=1e-9, atol=1e-9, equal_nan=True)
                bad = (~np.isclose(sv, dv, rtol=1e-9, atol=1e-9, equal_nan=True)).sum()
                problems.append(
                    f"col {c}: not exact ({'close' if close else f'{bad} values differ'})"
                )
        else:
            if not np.array_equal(sv, dv):
                bad = (sv != dv).sum()
                problems.append(f"col {c}: {bad} values differ")
    return problems


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]

    from pytod_spark.queries import ORACLES, QUERIES, render_generated_oracles
    from pytod_spark.session import get_spark

    unknown = [n for n in only if n not in QUERIES]
    if unknown:
        # a typo'd name (or a stray flag — args are positional) must
        # not produce a success-shaped "0 pass, 0 fail" exit 0
        print(f"unknown query name(s): {unknown}; catalogue has {len(QUERIES)}")
        sys.exit(2)

    # data-dependent oracles (PCA eigenvector literals) are rendered
    # for the driver's sf0.01 at import; re-render for this sf_dir
    render_generated_oracles(sf_dir)

    spark = get_spark("check-queries", master="local[8]", shuffle_partitions=8,
                      extra_conf={"spark.ui.enabled": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in ORACLES:
            print(f"ok   {name}: rows-only ({len(spark_pdf)} rows) [{time.time()-t0:.1f}s]")
            n_pass += 1
            continue
        try:
            duck_pdf = con.sql(ORACLES[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_pdf)} rows) [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
