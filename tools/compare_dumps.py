#!/usr/bin/env python3
"""Partition-invariance check: compare two graft.Verify output dirs.

Usage: python3 tools/compare_dumps.py <dirA> <dirB>

For each query subdir present in both, loads the parquet result, sorts
columns by name and rows by all columns, and compares a value hash —
the same canonicalization the driver's oracle gate uses. Any mismatch
means the operator's result depends on partitioning.
"""
import sys, glob, os, hashlib
import pandas as pd


def canon_hash(files):
    df = pd.concat([pd.read_parquet(f) for f in sorted(files)]) if files \
        else pd.DataFrame()
    if len(df) == 0:
        return "EMPTY", 0
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: repr(v))
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(repr(tuple(row)).encode())
    return h.hexdigest(), len(df)


def main(a, b):
    names = sorted(set(os.listdir(a)) & set(os.listdir(b)))
    names = [n for n in names
             if os.path.isdir(os.path.join(a, n)) and
             os.path.isdir(os.path.join(b, n))]
    bad = 0
    for n in names:
        ha, ra = canon_hash(glob.glob(f"{a}/{n}/*.parquet"))
        hb, rb = canon_hash(glob.glob(f"{b}/{n}/*.parquet"))
        if ha != hb or ra != rb:
            bad += 1
            print(f"  MISMATCH {n}: rows {ra} vs {rb}, hash "
                  f"{ha[:12]} vs {hb[:12]}")
    print(f"== compared={len(names)} mismatched={bad}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
