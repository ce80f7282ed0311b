#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate:
runs graft.Verify's parquet dumps against oracle_sql.json over the same
testdata tables, comparing row multisets with columns sorted by name.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = repr(v)  # full precision
            vals.append(str(v))
        out.append("\x00".join(vals))
    return sorted(out)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            print(f"[MISS ] {name}: no parquet output")
            n_fail += 1
            continue
        got = con.execute(f"SELECT * FROM read_parquet({files!r})")
        got_cols = [d[0] for d in got.description]
        got_rows = got.fetchall()
        if name not in oracles:
            print(f"[ROWS ] {name}: {len(got_rows)} rows (no oracle)")
            continue
        try:
            exp = con.execute(oracles[name])
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"[ERR  ] {name}: oracle SQL failed: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"[SCHEMA] {name}: spark={sorted(got_cols)} duckdb={sorted(exp_cols)}")
            n_fail += 1
            continue
        a, b = canon(got_rows, got_cols), canon(exp_rows, exp_cols)
        if a == b:
            print(f"[PASS ] {name}: {len(a)} rows")
            n_pass += 1
        else:
            print(f"[FAIL ] {name}: spark {len(a)} rows vs duckdb {len(b)} rows")
            onlya = [x for x in a if x not in set(b)][:3]
            onlyb = [x for x in b if x not in set(a)][:3]
            for x in onlya: print(f"    spark-only:  {x[:200]}")
            for x in onlyb: print(f"    duckdb-only: {x[:200]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
