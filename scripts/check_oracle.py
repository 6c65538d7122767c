#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate.

Reads the Verify output dir (per-query parquet + oracle_sql.json),
runs each oracle SQL in DuckDB against the same sf parquet tables,
and compares (columns sorted by name, values hashed row-wise).

NOT part of the library — the Scala engine has zero Python deps.
Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir> [jsonOut]

With jsonOut, also writes a per-key result dict in the driver's
CORRECTNESS_r*.json byte format (rows_match / schema_match /
hash_match / spark_rows / oracle_rows / err) — the round-close
self-published artifact (r8's driver file landed empty; this makes
that a non-event).
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

def main(sf_dir, out_dir, json_out=None):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    results = {}
    def rec(name, rows_m, schema_m, hash_m, sr, orr, err):
        results[name] = {"rows_match": rows_m, "schema_match": schema_m,
                         "hash_match": hash_m, "spark_rows": sr,
                         "oracle_rows": orr, "err": err}
    for name, sql in sorted(oracle.items()):
        pq_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(pq_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1
            rec(name, False, False, False, 0, 0, "no spark output"); continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            want = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1
            rec(name, False, False, False, 0, 0,
                f"{type(e).__name__}: {e}"); continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1
            rec(name, len(got) == len(want), False, False, len(got),
                len(want), "schema mismatch"); continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1
            rec(name, False, True, False, len(got), len(want),
                "row count mismatch"); continue
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
            rec(name, True, True, False, len(got), len(want),
                f"value mismatch in {diff_cols[:4]}")
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
            rec(name, True, True, True, len(got), len(want), None)
    print(f"\n{n_pass} pass / {n_fail} fail")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {json_out} ({len(results)} keys)")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
