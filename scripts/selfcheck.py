#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify at a
given SF, then compare each result parquet against the DuckDB oracle
(columns sorted by name, rows sorted by all columns, value hash).
Usage: python3 scripts/selfcheck.py [sfdir] [outdir] [--skip-verify]
"""
import sys, json, subprocess, hashlib, glob, os

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
skip = "--skip-verify" in sys.argv

if not skip:
    r = subprocess.run(
        ["sbt", f'runMain graft.Verify {sfdir} {outdir}'],
        cwd="/root/repo", capture_output=True, text=True, timeout=1800)
    if r.returncode != 0:
        print(r.stdout[-3000:]); print(r.stderr[-3000:]); sys.exit(1)
    for line in (r.stdout + r.stderr).splitlines():
        if "[verify]" in line:
            print(line)

import duckdb
import pandas as pd

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def h(df: pd.DataFrame) -> str:
    # Default to_csv rendering, NO float_format: the driver hashes raw
    # pandas rendering, so an int64 123 vs float64 123.0 must differ.
    # (%.17g masked DuckDB HUGEINT->float64 drift in round 2: every
    # integer `sum()` in DuckDB returns HUGEINT, which pandas converts
    # to float64 and renders "123.0" unless the oracle CASTs to BIGINT.)
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()

fails = 0
names = sorted(set(list(oracle.keys()) + [os.path.basename(p) for p in glob.glob(f"{outdir}/*") if os.path.isdir(p)]))
for name in names:
    pq = glob.glob(f"{outdir}/{name}/*.parquet")
    if not pq:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    got = canon(pd.concat([pd.read_parquet(p) for p in pq]))
    if name not in oracle:
        print(f"SKIP {name}: no oracle (rows={len(got)})"); continue
    try:
        want = canon(con.sql(oracle[name]).df())
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    ok_schema = list(got.columns) == list(want.columns)
    ok_rows = len(got) == len(want)
    ok_hash = ok_schema and ok_rows and h(got) == h(want)
    if ok_hash:
        print(f"PASS {name} ({len(got)} rows)")
    else:
        fails += 1
        print(f"FAIL {name}: schema={ok_schema} rows={len(got)}vs{len(want)} hash={ok_hash}")
        if ok_schema and ok_rows:
            for c in got.columns:
                if not got[c].astype(str).equals(want[c].astype(str)):
                    merged = got[c].astype(str) != want[c].astype(str)
                    i = merged.idxmax()
                    print(f"  col {c}: first diff row {i}: got={got[c][i]} want={want[c][i]}")
        else:
            print(f"  got cols: {list(got.columns)}")
            print(f"  want cols: {list(want.columns)}")
print(f"\n{len(names)-fails}/{len(names)} pass")
sys.exit(1 if fails else 0)
