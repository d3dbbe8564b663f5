#!/usr/bin/env python3
"""Full-surface oracle compare with a per-query timeout — the sf1.0 variant
of compare_oracle.py (r9 review "next round" #3: one full-surface DuckDB
verify at the 10x scale). A few DEFINITIONAL oracles are quadratic in
DuckDB at sf1.0 (the exact jaccard verifier, containment, fuzzy_join);
rather than exclude them up front, every oracle runs in its own subprocess
under a timeout, and timeouts are REPORTED (never silently dropped) — the
semantics of a timed-out oracle remain pinned by the sf0.01/sf0.1 gates.

Usage: compare_oracle_timeout.py <sfDir> <verifyOutDir> [timeout_sec]
"""
import sys, json, glob, os, multiprocessing as mp


def check_one(args):
    sf_dir, out_dir, q, sql = args
    import duckdb, pandas as pd
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        src = p if os.path.isfile(p) else f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    spark_files = glob.glob(f"{out_dir}/{q}/*.parquet")
    if not spark_files:
        return (q, "MISSING", "no spark output")
    try:
        oracle = con.execute(sql).df()
    except Exception as e:
        return (q, "ORACLE_ERROR", str(e)[:160])
    spark = pd.concat([pd.read_parquet(f) for f in spark_files])
    o = oracle.reindex(sorted(oracle.columns), axis=1)
    s = spark.reindex(sorted(spark.columns), axis=1)
    for df in (o, s):
        for c in df.columns:
            if df[c].dtype == object and df[c].map(
                    lambda v: hasattr(v, "__len__") and not isinstance(v, (str, bytes))).any():
                df[c] = df[c].map(lambda v: tuple(v) if hasattr(v, "__iter__")
                                  and not isinstance(v, (str, bytes)) else v)
    if list(o.columns) != list(s.columns):
        return (q, "SCHEMA", f"oracle={list(o.columns)} spark={list(s.columns)}")
    if len(o) != len(s):
        return (q, "ROWS", f"oracle={len(o)} spark={len(s)}")
    o = o.sort_values(by=list(o.columns), ignore_index=True)
    s = s.sort_values(by=list(s.columns), ignore_index=True)
    # EXACT comparison — identical to compare_oracle.py (the driver gate
    # replica); a tolerance here would be a weaker gate than the driver's
    try:
        pd.testing.assert_frame_equal(o, s, check_dtype=False, check_exact=True)
        return (q, "OK", f"rows={len(s)}")
    except AssertionError as e:
        return (q, "VALUES", str(e).splitlines()[-1][:160])


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 300
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok, fails, timeouts = [], [], []
    for q, sql in sorted(oracles.items()):
        with mp.Pool(1) as pool:
            res = pool.apply_async(check_one, ((sf_dir, out_dir, q, sql),))
            try:
                name, status, detail = res.get(timeout=timeout)
            except mp.TimeoutError:
                name, status, detail = q, "TIMEOUT", f">{timeout}s (quadratic oracle at this scale)"
                pool.terminate()
            except Exception as e:
                name, status, detail = q, "CRASH", str(e)[:160]
        print(f"{name:26s} {status:12s} {detail}")
        sys.stdout.flush()
        (ok if status == "OK" else timeouts if status == "TIMEOUT" else fails).append(name)
    print(f"\n{len(ok)}/{len(oracles)} oracle-checked OK; "
          f"{len(timeouts)} oracle-timeout (semantics pinned at sf0.01/sf0.1): {timeouts}; "
          f"FAILS: {fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
