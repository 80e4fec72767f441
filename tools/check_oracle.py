#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet result (written by graft.Verify),
runs the corresponding SQL from oracle_sql.json in DuckDB over the same
parquet tables, and compares: schema (column names), row count, and a hash of
values with columns sorted by name. Dev-only tool — the real gate is the
driver's; this just gives fast feedback with the same duckdb version.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize dtypes a bit: timestamps -> iso strings, floats stay floats
    out = pd.DataFrame()
    for c in df.columns:
        s = df[c]
        if str(s.dtype).startswith("datetime"):
            s = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            import datetime as _dt
            s = s.map(lambda v: v.isoformat()
                      if isinstance(v, (_dt.date, _dt.datetime)) else v)
        out[c] = s
    return out

def hash_df(df: pd.DataFrame) -> str:
    import hashlib
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(repr(tuple(row)).encode())
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)]) if files \
            else pd.DataFrame()
        if name not in oracle:
            n_rowsonly += 1
            status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY!"
            print(f"  {status:18s} {name}: rows={len(got)}")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"  ORACLE-ERR         {name}: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        schema_ok = list(g.columns) == list(e.columns)
        rows_ok = len(g) == len(e)
        hash_ok = schema_ok and rows_ok and hash_df(g) == hash_df(e)
        if hash_ok:
            n_pass += 1
            print(f"  PASS               {name}: rows={len(g)}")
        else:
            n_fail += 1
            print(f"  FAIL               {name}: schema_ok={schema_ok} "
                  f"({list(g.columns)} vs {list(e.columns)}) rows {len(g)} vs {len(e)}")
            if schema_ok and rows_ok:
                diff = (g.reset_index(drop=True) != e.reset_index(drop=True))
                bad_cols = [c for c in g.columns if diff[c].any()]
                print(f"      value-diff cols: {bad_cols}")
                for c in bad_cols[:3]:
                    idx = diff[c].idxmax()
                    print(f"      first diff {c}[{idx}]: got={g[c][idx]!r} exp={e[c][idx]!r}")
    print(f"== pass={n_pass} fail={n_fail} rows_only={n_rowsonly}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
