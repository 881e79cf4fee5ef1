#!/usr/bin/env python3
"""Compare two graft.Verify output dirs query by query: exact row-set
equality after canonicalization (sort columns by name, sort rows).
Usage: python3 tools/diff_dumps.py DIR_A DIR_B [only_csv]
Prints one line per differing query and a summary."""
import sys, os, glob
import duckdb

a, b = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
con = duckdb.connect()
qs = sorted(set(os.listdir(a)) & set(os.listdir(b)))
qs = [q for q in qs if os.path.isdir(os.path.join(a, q))
      and (only is None or q in only)]
diff, same, err = [], [], []
for q in qs:
    try:
        ra = con.execute(f"SELECT * FROM '{a}/{q}/*.parquet'").fetchdf()
        rb = con.execute(f"SELECT * FROM '{b}/{q}/*.parquet'").fetchdf()
        ra = ra.reindex(sorted(ra.columns), axis=1)
        rb = rb.reindex(sorted(rb.columns), axis=1)
        for df in (ra, rb):
            for c in df.columns:
                if df[c].dtype == object and len(df) and isinstance(
                        df[c].iloc[0], (bytes, bytearray)):
                    df[c] = df[c].apply(
                        lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v)
                if df[c].dtype == object and len(df) and isinstance(
                        df[c].iloc[0], (list,)) or str(df[c].dtype).startswith("object"):
                    df[c] = df[c].astype(str)
        ra = ra.sort_values(by=list(ra.columns), ignore_index=True)
        rb = rb.sort_values(by=list(rb.columns), ignore_index=True)
        if ra.equals(rb):
            same.append(q)
        else:
            diff.append(q)
            print(f"DIFF {q}: {len(ra)} vs {len(rb)} rows")
    except Exception as e:
        err.append(q)
        print(f"ERR  {q}: {e}")
print(f"\n{len(same)} identical / {len(diff)} differing / {len(err)} errors "
      f"over {len(qs)} queries")
if diff:
    print("differing:", ",".join(diff))
