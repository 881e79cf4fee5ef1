#!/usr/bin/env python3
"""One-off scale-up fixture generator for the SCALE.md "measured at 10x"
experiment: builds an N-fold copy of the sf tables into OUT_DIR with the
same per-row statistics but WITHOUT creating cross-copy near-duplicates
(which would change the dedup/CC graph shape, not just the data volume):

- documents: copy i remaps every token through a rotation of the (closed,
  ~31-word) vocabulary — within-copy structure (pair counts, lengths,
  dup families) is isomorphic to the original, while the same doc in two
  copies shares no shingles, so the near-dup graph scales linearly like a
  real corpus would. doc_id offsets by i*ID_OFF; n_chars recomputed.
- embeddings: copy i rotates the embedding elements by (i*7) mod dim —
  norm-preserving, and a rotated iid-ish vector is ~orthogonal to the
  original, so no artificial semantic duplicates. vec_id offsets match
  doc_id offsets (the two share an id space).
- events: copy i shifts ts by i*(span+1h) and offsets ids — 10x the data
  at the SAME event density, so interval joins scale by data, not by an
  artificially inflated rate.
- every other table is copied verbatim (dimension-sized).

Usage: python3 tools/scale_gen.py /root/testdata/sf0.1 /tmp/sf1 10
"""
import sys, glob, os, shutil
import duckdb

src, out, copies = sys.argv[1], sys.argv[2], int(sys.argv[3])
ID_OFF = 1_000_000
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

vocab = [r[0] for r in con.execute(
    f"SELECT DISTINCT unnest(string_split(text, ' ')) AS t FROM '{src}/documents.parquet' ORDER BY t"
).fetchall()]
V = len(vocab)
print(f"vocab: {V} tokens")

def doc_copy(i):
    if i == 0:
        return f"SELECT * FROM '{src}/documents.parquet'"
    case = "CASE t " + " ".join(
        f"WHEN '{w}' THEN '{vocab[(k + i) % V]}'" for k, w in enumerate(vocab)
    ) + " ELSE t END"
    return f"""
      SELECT doc_id + {i * ID_OFF} AS doc_id, text, lang, source,
             CAST(length(text) AS INT) AS n_chars
      FROM (SELECT doc_id,
              array_to_string(list_transform(string_split(text, ' '), t -> {case}), ' ') AS text,
              lang, source
            FROM '{src}/documents.parquet')"""

def emb_copy(i):
    if i == 0:
        return f"SELECT * FROM '{src}/embeddings.parquet'"
    dim = con.execute(f"SELECT len(embedding) FROM '{src}/embeddings.parquet' LIMIT 1").fetchone()[0]
    k = (i * 7) % dim
    rot = (f"list_concat(embedding[{k + 1}:{dim}], embedding[1:{k}])" if k else "embedding")
    return f"""
      SELECT vec_id + {i * ID_OFF} AS vec_id,
             CAST({rot} AS FLOAT[]) AS embedding, label
      FROM '{src}/embeddings.parquet'"""

span_h = con.execute(
    f"SELECT CAST(ceil(date_diff('hour', min(ts), max(ts)) + 1) AS INT) FROM '{src}/events.parquet'"
).fetchone()[0]
print(f"events span: {span_h} hours")

def ev_copy(i):
    if i == 0:
        return f"SELECT * FROM '{src}/events.parquet'"
    return f"""
      SELECT event_id + {i * ID_OFF} AS event_id,
             ts + INTERVAL ({i * span_h}) HOUR AS ts,
             user_id + {i * ID_OFF} AS user_id, event_type, value, props
      FROM '{src}/events.parquet'"""

for name, mk in [("documents", doc_copy), ("embeddings", emb_copy), ("events", ev_copy)]:
    union = " UNION ALL ".join(mk(i) for i in range(copies))
    con.execute(f"COPY ({union}) TO '{out}/{name}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{out}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n} rows")

for f in glob.glob(f"{src}/*.parquet"):
    base = os.path.basename(f)
    if base not in ("documents.parquet", "embeddings.parquet", "events.parquet"):
        shutil.copyfile(f, f"{out}/{base}")
        print(f"copied {base}")
print("done")
