#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare (dev tool only —
the Scala engine never depends on this). Usage:

    python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark output), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with views over
<sfDir>/*.parquet, and compares THE WAY THE DRIVER DOES: both sides go
through pandas, columns sorted by name, rows sorted by all columns
(pandas lexsort — raises on unhashable cells like numpy arrays, exactly
as the driver's gate does), then cell-by-cell str() equality. This
reproduces driver-side failure modes the previous fetchall() compare
masked: DuckDB HUGEINT→float64 ("1.0" vs "1") and array-cell outputs.
"""
import json, sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    """Driver-style canonical form: sorted columns, lexsorted rows, str cells."""
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df.astype(str)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            sdf = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            ddf = con.sql(sql).df()
            scols, dcols = sorted(sdf.columns), sorted(ddf.columns)
            if scols != dcols:
                print(f"FAIL {name}: columns {scols} vs {dcols}")
                n_fail += 1
                continue
            if len(sdf) != len(ddf):
                print(f"FAIL {name}: rows {len(sdf)} vs {len(ddf)}")
                n_fail += 1
                continue
            a, b = canon(sdf), canon(ddf)
            if not a.equals(b):
                neq = (a != b).any(axis=1)
                i = int(neq.idxmax())
                print(f"FAIL {name}: first diff at sorted row {i}\n"
                      f"  spark={a.iloc[i].to_dict()}\n  duck ={b.iloc[i].to_dict()}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(sdf)} rows)")
                n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
