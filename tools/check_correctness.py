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

# The driver hashes TYPED cells, so an oracle column whose DuckDB type
# differs from the Spark parquet type hash-mismatches even when every
# value is equal (r7+r8: uncast SUM(BIGINT) -> HUGEINT). pandas coerces
# HUGEINT to float64 and int64==float64 passes, so the value compare
# below is blind to exactly that defect — gate on DESCRIBE types first.
BENIGN = [
    # Spark parquet timestamps are UTC-adjusted (isAdjustedToUTC), which
    # DuckDB reads as TIMESTAMP WITH TIME ZONE; oracle TIMESTAMP is the
    # same instant and the driver's green rows confirm it hashes equal.
    {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
    # int32 vs int64 hashes equal at the driver (text_stats carries
    # INTEGER columns against BIGINT oracle outputs and has been
    # driver-green since r6) — the widening that does NOT hash equal is
    # HUGEINT/DECIMAL, which stays fatal.
    {"INTEGER", "BIGINT"},
]

def types_of(sql):
    return {r[0]: r[1].upper() for r in con.execute(f"DESCRIBE ({sql})").fetchall()}

def type_gate(name):
    ours = types_of(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
    theirs = types_of(oracle[name])
    bad = []
    for c in sorted(set(ours) & set(theirs)):
        a, b = ours[c], theirs[c]
        if a != b and not any(a in s and b in s for s in BENIGN):
            bad.append(f"{c}: parquet {a} vs oracle {b}")
    return bad

def cmp(name):
    try:
        ours = canon(con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df())
    except Exception as e:
        return f"FAIL {name}: cannot read our parquet: {e}"
    try:
        theirs = canon(con.execute(oracle[name]).df())
        bad_types = type_gate(name)
        if bad_types:
            return f"FAIL {name}: column type mismatch ({'; '.join(bad_types)})"
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
