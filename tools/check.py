#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, compare to the Spark result parquet
(columns sorted by name, exact value compare). Usage:
  python3 tools/check.py /tmp/verify_r2 /root/testdata/sf0.01 [query ...]
"""
import json, sys, glob, os, time
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table directory (e.g. ScaleUp output)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = n_noorc = 0
    for name in sorted(os.listdir(outdir)):
        if not os.path.isdir(f"{outdir}/{name}"):
            continue
        if only and name not in only:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"{name}: NO SPARK OUTPUT"); n_fail += 1; continue
        spark = pd.read_parquet(files[0])
        # The driver's checker sorts every output column with pandas
        # factorize, which CRASHES on non-scalar cells (ndarray/list/
        # dict). Be AT LEAST as strict here: any non-scalar value in an
        # oracle-checked query is a hard fail; in a rows-only query it's
        # a loud warning (the driver only counts rows there).
        import numpy as np
        nonscalar = [c for c in spark.columns if len(spark)
                     and isinstance(spark[c].iloc[0], (np.ndarray, list, dict, tuple))]
        if name not in oracles:
            n_noorc += 1
            warn = f" NON-SCALAR cols {nonscalar} (driver tolerates in rows-only, but avoid)" if nonscalar else ""
            print(f"{name}: rows-only ({len(spark)} rows)" + (" EMPTY!" if len(spark) == 0 else "") + warn)
            continue
        if nonscalar:
            print(f"{name}: NON-SCALAR OUTPUT COLUMNS {nonscalar} — driver checker would crash; flatten to scalars")
            n_fail += 1; continue
        t0 = time.time()
        try:
            orc = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}"); n_fail += 1; continue
        oracle_sec = time.time() - t0
        s = spark[sorted(spark.columns)]
        o = orc[sorted(orc.columns)]
        ok = True
        if list(s.columns) != list(o.columns):
            print(f"{name}: SCHEMA MISMATCH spark={list(s.columns)} oracle={list(o.columns)}"); ok = False
        elif len(s) != len(o):
            print(f"{name}: ROWS MISMATCH spark={len(s)} oracle={len(o)}"); ok = False
        else:
            # Mirror the driver: order-insensitive row compare — sort
            # both frames by every column before the per-value check.
            key = [s[c].astype(str) for c in s.columns]
            s = s.iloc[pd.concat(key, axis=1).apply(tuple, axis=1).argsort(kind="stable")].reset_index(drop=True) if len(s) else s
            key = [o[c].astype(str) for c in o.columns]
            o = o.iloc[pd.concat(key, axis=1).apply(tuple, axis=1).argsort(kind="stable")].reset_index(drop=True) if len(o) else o
            def same(a, b):
                if a is None and b is None:
                    return True
                try:
                    if a != a and b != b:  # NaN == NaN for this gate
                        return True
                except (TypeError, ValueError):
                    pass
                eq = a == b
                return bool(eq.all()) if hasattr(eq, "all") else bool(eq)
            for c in s.columns:
                sv, ov = s[c].tolist(), o[c].tolist()
                if str(s[c].dtype) != str(o[c].dtype):
                    # dtype diff → would hash-diverge for the driver
                    print(f"{name}: DTYPE {c}: spark={s[c].dtype} oracle={o[c].dtype}")
                    ok = False
                bad = [(i, a, b) for i, (a, b) in enumerate(zip(sv, ov)) if not same(a, b)]
                if bad:
                    print(f"{name}: VALUES differ in {c}: {bad[:3]} ({len(bad)} rows)"); ok = False
        if ok:
            n_pass += 1
            # per-oracle DuckDB wall — the dial that decides which shapes
            # are feasible in the sfN spot gates (SCALING.md tables)
            print(f"{name}: ok oracle={oracle_sec:.1f}s")
        else: n_fail += 1
    print(f"\npass={n_pass} fail={n_fail} rows_only={n_noorc}")
    sys.exit(1 if n_fail else 0)

main()
