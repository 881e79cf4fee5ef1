#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, compare to the parquet dumped by graft.Verify
(sort columns by name, sort rows, exact value compare). Usage:
    python3 tools/check_correctness.py /root/testdata/sf0.01 /tmp/vout
"""
import sys, json, glob, math
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = f.split("/")[-1].removesuffix(".parquet")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (bytes, bytearray)):
            df[c] = df[c].apply(lambda b: b.hex() if isinstance(b, (bytes, bytearray)) else b)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def cmp(name):
    try:
        ours = canon(con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df())
    except Exception as e:
        return f"FAIL {name}: cannot read our parquet: {e}"
    try:
        theirs = canon(con.execute(oracle[name]).df())
    except Exception as e:
        return f"FAIL {name}: oracle SQL error: {e}"
    if list(ours.columns) != list(theirs.columns):
        return f"FAIL {name}: columns {list(ours.columns)} vs {list(theirs.columns)}"
    if len(ours) != len(theirs):
        return f"FAIL {name}: rows {len(ours)} vs {len(theirs)}"
    for c in ours.columns:
        a, b = ours[c], theirs[c]
        try:
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                af = a.astype(float); bf = b.astype(float)
                neq = ~((af == bf) | (af.isna() & bf.isna()))
                if neq.any():
                    i = neq.idxmax()
                    # report max abs diff too
                    d = (af - bf).abs().max()
                    return (f"FAIL {name}: col {c} differs at row {i}: "
                            f"{af[i]!r} vs {bf[i]!r} (maxabsdiff={d:.3e})")
            else:
                aa = a.astype(str); bb = b.astype(str)
                neq = aa != bb
                if neq.any():
                    i = neq.idxmax()
                    return f"FAIL {name}: col {c} differs at row {i}: {a[i]!r} vs {b[i]!r}"
        except Exception as e:
            return f"FAIL {name}: col {c} compare error: {e}"
    return f"OK   {name} ({len(ours)} rows)"

fails = 0
for name in sorted(oracle):
    r = cmp(name)
    if r.startswith("FAIL"):
        fails += 1
    print(r)
# rows-only entries
import os
for d in sorted(os.listdir(outdir)):
    if d != "oracle_sql.json" and d not in oracle:
        n = con.execute(f"SELECT count(*) FROM '{outdir}/{d}/*.parquet'").fetchone()[0]
        print(f"ROWS {d}: {n}")
print(f"\n{fails} failures / {len(oracle)} oracle-checked")
sys.exit(1 if fails else 0)
