"""Local stand-in for the driver's CORRECTNESS gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet dir, then compares
row count, column names, and order-insensitive exact values.

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("boolean")
        else:
            df[c] = df[c].astype("string")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(got.columns) != sorted(want.columns):
        return [f"columns differ: spark={sorted(got.columns)} oracle={sorted(want.columns)}"]
    if len(got) != len(want):
        errs.append(f"row count differs: spark={len(got)} oracle={len(want)}")
    g, w = normalize(got), normalize(want)
    if len(g) == len(w) and not g.equals(w):
        neq = (g != w) & ~(g.isna() & w.isna())
        bad_cols = [c for c in g.columns if neq[c].any()]
        for c in bad_cols[:3]:
            idx = neq[c].idxmax()
            errs.append(f"value mismatch col={c} row={idx}: spark={g[c][idx]!r} oracle={w[c][idx]!r}")
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # Data-dependent oracles (trained IVF refits its codebook over the
    # oracle parquet) must target the dir we are comparing at.
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    import __spark_entry__ as E
    from datax_spark.config import get_spark

    spark = get_spark("parity", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)

    qs = E.queries()
    oracles = E.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows)")
            continue
        try:
            want = con.execute(oracles[name]).fetch_df()
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: oracle error {str(e)[:200]}")
            continue
        errs = compare(name, got, want)
        if errs:
            failed.append(name)
            print(f"FAIL {name}: " + "; ".join(errs))
        else:
            print(f"ok   {name}: {len(got)} rows match")
    print(f"\n{len(qs) - len(failed)}/{len(qs)} queries pass")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
