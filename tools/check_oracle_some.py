#!/usr/bin/env python3
"""Targeted variant of check_oracle.py for optimization-round iteration:
same compare (columns sorted by name, rows sorted by all columns, exact
values, float64 equality with NaN == NaN), but only for the query names
given on the command line.

Usage:
    python3 tools/check_oracle_some.py sfDir verifyOutDir q78 q96 ...

Query args match by prefix against oracle_sql.json keys.
"""
import duckdb, json, glob, os, sys
import pandas as pd
import numpy as np


def main():
    sf, out = sys.argv[1], sys.argv[2]
    wanted = sys.argv[3:]
    con = duckdb.connect()
    for p in glob.glob(f"{sf}/*.parquet"):
        stem = os.path.basename(p)[: -len(".parquet")]
        con.sql(f"CREATE VIEW {stem} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    names = []
    for w in wanted:
        ms = [k for k in sorted(oracles) if k.startswith(w)]
        if not ms:
            print(f"{w}: no oracle entry matches (NO_ORACLE query?)")
            continue
        names.extend(ms)
    ok = n_fail = 0
    for name in names:
        try:
            files = glob.glob(f"{out}/{name}/*.parquet")
            if not files:
                print(f"{name}: MISS (no Spark dump)")
                n_fail += 1
                continue
            spark_df = pd.concat([pd.read_parquet(f) for f in files])
            o = con.sql(oracles[name]).df()
            cols, ocols = sorted(spark_df.columns), sorted(o.columns)
            if cols != ocols:
                print(f"{name}: SCHEMA spark={cols} oracle={ocols}")
                n_fail += 1
                continue
            s = spark_df[cols].sort_values(cols).reset_index(drop=True)
            od = o[ocols].sort_values(ocols).reset_index(drop=True)
            if len(s) != len(od):
                print(f"{name}: ROWS spark={len(s)} oracle={len(od)}")
                n_fail += 1
                continue
            bad = False
            for c in cols:
                a, b = s[c].values, od[c].values
                if (np.issubdtype(s[c].dtype, np.floating)
                        and np.issubdtype(od[c].dtype, np.floating)):
                    eq = np.array_equal(a.astype("float64"), b.astype("float64"),
                                        equal_nan=True)
                else:
                    eq = (pd.Series(a).map(repr) == pd.Series(b).map(repr)).all()
                if not eq:
                    print(f"{name}: VALUES column {c}; "
                          f"spark head {a[:3]}, oracle head {b[:3]}")
                    bad = True
            if not bad:
                print(f"{name}: green")
                ok += 1
            else:
                n_fail += 1
        except Exception as e:
            print(f"{name}: ERR {str(e)[:200]}")
            n_fail += 1
    print(f"{ok}/{len(names)} green")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
