#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate.

Reads the Verify output dir (per-query parquet + oracle_sql.json),
runs each oracle SQL in DuckDB against the same sf parquet tables,
and compares (columns sorted by name, values hashed row-wise).

NOT part of the library — the Scala engine has zero Python deps.
Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pq_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(pq_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            want = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        eq = got.equals(want)
        if not eq:
            # find first diff for debugging
            diff_cols = [c for c in got.columns if not got[c].equals(want[c])]
            print(f"FAIL {name}: value mismatch in cols {diff_cols}")
            for c in diff_cols[:2]:
                neq = got[c] != want[c]
                # NaN-safe
                neq = neq & ~(got[c].isna() & want[c].isna())
                idx = neq[neq].index[:3]
                for i in idx:
                    print(f"   row {i} col {c}: spark={got[c][i]!r} duck={want[c][i]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
