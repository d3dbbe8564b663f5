#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the same testdata parquet, compare with the Spark result
parquet (columns sorted by name, rows compared as sorted multisets).

Usage: compare_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    # driver testdata tables are single files; ScaleUp rehearsal tables are
    # directories of part files — read_parquet needs the glob form for those
    src = p if os.path.isfile(p) else f"{p}/*.parquet"
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for q, sql in sorted(oracles.items()):
    spark_files = glob.glob(f"{out_dir}/{q}/*.parquet")
    if not spark_files:
        print(f"{q:24s} MISSING spark output"); fails.append(q); continue
    try:
        oracle = con.execute(sql).df()
    except Exception as e:
        print(f"{q:24s} ORACLE ERROR {e}"); fails.append(q); continue
    spark = pd.concat([pd.read_parquet(f) for f in spark_files])
    o = oracle.reindex(sorted(oracle.columns), axis=1)
    s = spark.reindex(sorted(spark.columns), axis=1)
    # array-valued columns (numpy arrays / lists) are unhashable and
    # unsortable — canonicalize to tuples so sort_values/compare work
    for df in (o, s):
        for c in df.columns:
            if df[c].dtype == object and df[c].map(
                    lambda v: hasattr(v, "__len__") and not isinstance(v, (str, bytes))).any():
                df[c] = df[c].map(lambda v: tuple(v) if hasattr(v, "__iter__")
                                  and not isinstance(v, (str, bytes)) else v)
    if list(o.columns) != list(s.columns):
        print(f"{q:24s} SCHEMA cols oracle={list(o.columns)} spark={list(s.columns)}")
        fails.append(q); continue
    if len(o) != len(s):
        print(f"{q:24s} ROWS oracle={len(o)} spark={len(s)}"); fails.append(q); continue
    o = o.sort_values(by=list(o.columns), ignore_index=True)
    s = s.sort_values(by=list(s.columns), ignore_index=True)
    same_types = [str(a) == str(b) for a, b in zip(o.dtypes, s.dtypes)]
    try:
        pd.testing.assert_frame_equal(o, s, check_dtype=False, check_exact=True)
        ty = "" if all(same_types) else f"  [dtypes differ: o={list(map(str,o.dtypes))} s={list(map(str,s.dtypes))}]"
        print(f"{q:24s} OK rows={len(s)}{ty}")
    except AssertionError as e:
        print(f"{q:24s} VALUE MISMATCH: {str(e).splitlines()[-1][:160]}")
        fails.append(q)

no_oracle = [d for d in os.listdir(out_dir)
             if os.path.isdir(f"{out_dir}/{d}") and d not in oracles]
for q in sorted(no_oracle):
    n = sum(len(pd.read_parquet(f)) for f in glob.glob(f"{out_dir}/{q}/*.parquet"))
    print(f"{q:24s} rows-only rows={n}")
print(f"\n{len(oracles)-len(fails)}/{len(oracles)} oracle-checked OK; {len(no_oracle)} rows-only; FAILS: {fails}")
sys.exit(1 if fails else 0)
