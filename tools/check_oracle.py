#!/usr/bin/env python3
"""Driver-style DuckDB oracle cross-check for a graft.Verify dump.

Usage:
    python3 tools/check_oracle.py [sfDir] [verifyOutDir]

Defaults: sfDir=/root/testdata/sf0.01, verifyOutDir=/tmp/verify_out.
Mirrors the driver's compare: for each entry in oracle_sql.json, run the
SQL in DuckDB over the sfDir parquet tables (registered by filename
stem), load the corresponding Spark parquet output, sort columns by name
and rows by all columns, and compare values exactly (floats via float64
equality, NaN == NaN). Prints one line per mismatching query and a
summary count.
"""
import duckdb, json, glob, sys
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    ok = 0
    for name in sorted(oracles):
        try:
            spark_df = pd.concat(
                [pd.read_parquet(f) for f in glob.glob(f"{out}/{name}/*.parquet")])
            o = con.sql(oracles[name]).df()
            cols, ocols = sorted(spark_df.columns), sorted(o.columns)
            if cols != ocols:
                print(f"{name}: SCHEMA spark={cols} oracle={ocols}")
                continue
            s = spark_df[cols].sort_values(cols).reset_index(drop=True)
            od = o[ocols].sort_values(ocols).reset_index(drop=True)
            if len(s) != len(od):
                print(f"{name}: ROWS spark={len(s)} oracle={len(od)}")
                continue
            bad = False
            for c in cols:
                a, b = s[c].values, od[c].values
                if (np.issubdtype(s[c].dtype, np.floating)
                        or np.issubdtype(od[c].dtype, np.floating)):
                    eq = np.array_equal(a.astype("float64"), b.astype("float64"),
                                        equal_nan=True)
                else:
                    eq = (pd.Series(a).astype(str) == pd.Series(b).astype(str)).all()
                if not eq:
                    print(f"{name}: VALUES column {c}; "
                          f"spark head {a[:3]}, oracle head {b[:3]}")
                    bad = True
            if not bad:
                ok += 1
        except Exception as e:
            print(f"{name}: ERR {str(e)[:200]}")
    print(f"{ok}/{len(oracles)} fully green")


if __name__ == "__main__":
    main()
