#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs Verify's parquet output dirs against the DuckDB oracle SQL in
oracle_sql.json, normalizes (sort columns by name, sort rows, stringify)
and hash-compares. Usage:
    python3 tools/compare.py <verify_out_dir> <sf_dir>
"""
import sys, os, json, glob, hashlib
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm_rows(df: pd.DataFrame):
    """Sorted normalized string rows (handles array cells, unlike
    DataFrame.sort_values which crashes on ndarray columns)."""
    df = df.reindex(sorted(df.columns), axis=1)
    def cell(v):
        if isinstance(v, float):
            return f"{v:.10g}"
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(cell(x) for x in v) + "]"
        if pd.isna(v) if not isinstance(v, (list, tuple)) else False:
            return "NULL"
        return str(v)
    return sorted("|".join(cell(v) for v in r) for r in df.itertuples(index=False, name=None))

def norm(df: pd.DataFrame) -> str:
    return hashlib.sha256("\n".join(norm_rows(df)).encode()).hexdigest()

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: cols {sorted(got.columns)} vs {sorted(exp.columns)}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        gr, er = norm_rows(got), norm_rows(exp)
        if gr != er:
            print(f"FAIL {name}: hash mismatch ({len(got)} rows)")
            diffs = [(g, e) for g, e in zip(gr, er) if g != e][:3]
            for g, e in diffs:
                print("  got:", g)
                print("  exp:", e)
            n_fail += 1; continue
        print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
