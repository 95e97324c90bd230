#!/usr/bin/env python3
"""Self-check harness mirroring the driver's correctness gate:
runs each oracle SQL in DuckDB over the same parquet tables and compares
to the Spark result parquet written by graft.Verify.

Usage: tools/check.py <sfDir> <verifyOutDir>
(dev-loop tool only — not part of the engine)
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except (TypeError, AttributeError):
                pass
            df[c] = s.astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(6)
        elif s.dtype == object:
            df[c] = s.astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, t + ".parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        spark_path = os.path.join(out_dir, name)
        files = glob.glob(spark_path + "/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:200]}"); n_fail += 1; continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}"); n_fail += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9)
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: {str(e).splitlines()[0][:200]}")
            try:
                diff = (g != w)
                bad_cols = [c for c in g.columns if diff[c].any()]
                for c in bad_cols[:3]:
                    i = diff[c].idxmax()
                    print(f"   col {c} row {i}: spark={g[c][i]!r} duck={w[c][i]!r}")
            except Exception as de:
                print(f"   (diff detail unavailable: {str(de)[:120]})")
            n_fail += 1
    # rows-only queries (declared but no oracle)
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p) and d not in oracles:
            files = glob.glob(p + "/*.parquet")
            n = sum(pd.read_parquet(f).shape[0] for f in files) if files else 0
            print(f"ROWS {d}: {n}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
