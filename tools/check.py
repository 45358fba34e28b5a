#!/usr/bin/env python3
"""Local dev-side oracle check, mirroring the driver's DuckDB compare.

Usage: python3 tools/check.py [sfDir] [outDir]
Reads outDir/<name>/ parquet (written by graft.Verify) and outDir/oracle_sql.json,
runs each oracle SQL in DuckDB over the sfDir parquet tables, and compares
(columns sorted by name, rows in result order, exact value equality).

NOT part of the shipped library — a development harness only.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.reset_index(drop=True)

def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        return af == bf
    return a == b

def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            duck_df = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: cols spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            n_fail += 1
            continue
        # dtype check (driver hash is dtype-sensitive)
        dmis = [(c, str(spark_df[c].dtype), str(duck_df[c].dtype))
                for c in spark_df.columns if str(spark_df[c].dtype) != str(duck_df[c].dtype)]
        mism = None
        for i in range(len(spark_df)):
            for c in spark_df.columns:
                if not values_equal(spark_df[c].iloc[i], duck_df[c].iloc[i]):
                    mism = (i, c, spark_df[c].iloc[i], duck_df[c].iloc[i])
                    break
            if mism:
                break
        if mism:
            i, c, sv, dv = mism
            print(f"FAIL {name}: row {i} col {c}: spark={sv!r} duck={dv!r}")
            n_fail += 1
        elif dmis:
            print(f"WARN {name}: values equal but dtypes differ: {dmis}")
            n_pass += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
