#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dumped by
graft.Verify, run the oracle SQL in DuckDB over the same parquet tables and
compare values (columns sorted by name, rows sorted, exact match).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize cell values to strings for a hash-like compare
    def cell(v):
        if isinstance(v, float):
            return f"{v:.9g}"
        if isinstance(v, (list, tuple)) or str(type(v)).endswith("ndarray'>"):
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)
    out = df.apply(lambda c: c.map(cell))
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    missing_dump, no_oracle = [], []
    for name in sorted(oracle):
        qdir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            missing_dump.append(name); n_fail += 1
            print(f"FAIL {name}: no spark output"); continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            n_fail += 1; print(f"FAIL {name}: oracle error: {e}"); continue
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            n_fail += 1
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}"); continue
        # the driver hashes RAW values, so int64 1786 vs float64 1786.0 is a
        # hash mismatch even though %.9g strings compare equal — fail here on
        # any int-vs-float dtype CLASS disagreement per column (r9's
        # q_sketch_cms failure mode: DuckDB HUGEINT -> pandas float64)
        def kind(dtype):
            k = getattr(dtype, "kind", "O")
            return "int" if k in "iu" else "float" if k == "f" else "other"
        dt_bad = [c for c in spark_df.columns
                  if {kind(spark_df[c].dtype), kind(duck_df[c].dtype)} == {"int", "float"}]
        if dt_bad:
            n_fail += 1
            print(f"FAIL {name}: dtype class mismatch (int vs float) in {dt_bad}: "
                  f"spark {[str(spark_df[c].dtype) for c in dt_bad]} vs "
                  f"duck {[str(duck_df[c].dtype) for c in dt_bad]}")
            continue
        if len(a) != len(b):
            n_fail += 1
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); continue
        if not a.equals(b):
            n_fail += 1
            diff = (a != b).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"FAIL {name}: value mismatch, first rows:")
            for i in idx:
                print("  spark:", a.loc[i].to_dict())
                print("  duck :", b.loc[i].to_dict())
            continue
        n_pass += 1
        print(f"PASS {name} ({len(a)} rows)")
    # queries with no oracle (rows-only check)
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(qdir)
        if os.path.isdir(qdir) and name not in oracle:
            files = glob.glob(os.path.join(qdir, "*.parquet"))
            rows = sum(pd.read_parquet(f).shape[0] for f in files) if files else 0
            status = "PASS" if rows > 0 else "FAIL"
            if rows == 0:
                n_fail += 1
            print(f"{status} {name} (rows-only: {rows})")
            no_oracle.append(name)
    print(f"\n== {n_pass} pass / {n_fail} fail / {len(no_oracle)} rows-only ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
