#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare (dev tool only —
the Scala engine never depends on this). Usage:

    python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark output), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with views over
<sfDir>/*.parquet, and compares: column names (sorted), row count, and
values in row order.
"""
import json, sys, math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)


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
            spark_rel = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            duck_rel = con.sql(sql)
            scols, dcols = sorted(spark_rel.columns), sorted(duck_rel.columns)
            if scols != dcols:
                print(f"FAIL {name}: columns {scols} vs {dcols}")
                n_fail += 1
                continue
            srows = spark_rel.select(", ".join(f'"{c}"' for c in scols)).fetchall()
            drows = duck_rel.select(", ".join(f'"{c}"' for c in dcols)).fetchall()
            if len(srows) != len(drows):
                print(f"FAIL {name}: rows {len(srows)} vs {len(drows)}")
                n_fail += 1
                continue
            bad = None
            for i, (a, b) in enumerate(zip(srows, drows)):
                if [norm(x) for x in a] != [norm(x) for x in b]:
                    bad = (i, a, b)
                    break
            if bad:
                print(f"FAIL {name}: row {bad[0]}\n  spark={bad[1]}\n  duck ={bad[2]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(srows)} rows)")
                n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
