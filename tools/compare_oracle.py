#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers each testdata parquet as a
DuckDB view, runs each oracle query, and compares against the Spark result
parquet at <verifyOutDir>/<name>/ — columns sorted by name, rows sorted by
all columns, values compared exactly (floats to 9 significant digits).
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    def normval(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{v:.9g}"
        if isinstance(v, (list, tuple)) or str(type(v)).endswith("ndarray'>"):
            return "[" + ",".join(normval(x) for x in list(v)) + "]"
        return str(v)
    rows = [tuple(normval(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            expected = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pd.concat([pq.read_table(f).to_pandas() for f in files])
        if sorted(got.columns) != sorted(expected.columns):
            print(f"FAIL {name}: columns spark={sorted(got.columns)} oracle={sorted(expected.columns)}")
            n_fail += 1
            continue
        for c in got.columns:
            a, b = str(got[c].dtype), str(expected[c].dtype)
            if a != b and {a, b} != {"object", "string"}:
                print(f"  WARN {name}.{c}: dtype spark={a} oracle={b}")
        g, e = norm(got), norm(expected)
        if g == e:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}")
            for i, (a, b) in enumerate(zip(g, e)):
                if a != b:
                    print(f"  first diff at row {i}:\n    spark : {a}\n    oracle: {b}")
                    break
            else:
                if len(g) != len(e):
                    longer, tag = (g, "spark") if len(g) > len(e) else (e, "oracle")
                    print(f"  extra {tag} row: {longer[min(len(g), len(e))]}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

main()
