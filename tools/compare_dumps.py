#!/usr/bin/env python3
"""Bit-exact comparison of two graft.Verify dumps (partitioning invariance).

Usage: python3 tools/compare_dumps.py OUT_A OUT_B

For each query directory present in both dumps, loads all parquet parts,
sorts columns by name and rows by every column, and compares values
exactly (NaN == NaN, bytes compared as bytes). Exits nonzero on any
difference — the property under test is that no query output depends on
partition count, task order, or parallelism level.
"""
import glob, os, sys
import pandas as pd
import numpy as np


def load(outdir, q):
    files = sorted(glob.glob(f"{outdir}/{q}/*.parquet"))
    df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    df = df[sorted(df.columns)]
    # stable total order over all columns (bytes/lists stringified for sort)
    key = df.apply(lambda c: c.map(repr), axis=0) if len(df) else df
    order = key.sort_values(by=list(df.columns)).index if len(df) else df.index
    return df.loc[order].reset_index(drop=True)


def eq(a, b):
    if a.shape != b.shape or list(a.columns) != list(b.columns):
        return False
    for c in a.columns:
        va, vb = a[c].values, b[c].values
        if va.dtype.kind == "f" and vb.dtype.kind == "f":
            if not ((va == vb) | (np.isnan(va) & np.isnan(vb))).all():
                return False
        else:
            if not all(repr(x) == repr(y) for x, y in zip(va, vb)):
                return False
    return True


def main():
    out_a, out_b = sys.argv[1], sys.argv[2]
    qs = sorted(
        {d for d in os.listdir(out_a) if os.path.isdir(os.path.join(out_a, d))}
        & {d for d in os.listdir(out_b) if os.path.isdir(os.path.join(out_b, d))})
    n_bad = 0
    for q in qs:
        a, b = load(out_a, q), load(out_b, q)
        if eq(a, b):
            print(f"{q}: identical ({len(a)} rows)")
        else:
            n_bad += 1
            print(f"{q}: MISMATCH (rows {len(a)} vs {len(b)})")
    print(f"{len(qs) - n_bad}/{len(qs)} bit-identical")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
