#!/usr/bin/env python3
"""Scale-up fixture generator for the SCALE.md "measured at Nx"
experiments: builds an N-fold copy of the sf tables into OUT_DIR with the
same per-row statistics but WITHOUT creating cross-copy near-duplicates
(which would change the dedup/CC graph shape, not just the data volume):

- documents: copy i remaps every token through an AFFINE PERMUTATION of
  the (closed, ~31-word) vocabulary, k -> (a_i*k + b_i) mod V with a_i
  coprime to V — within-copy structure (pair counts, lengths, dup
  families) is isomorphic to the original, while two copies share no
  more shingles than two unrelated corpora. The r15 version used a bare
  ROTATION (a=1), whose period is V: at >= V copies, copy V was
  token-identical to copy 0 and the dedup graph grew quadratic cliques.
  Distinct (a_i, b_i) pairs hold for every i < lcm(phi-ish(V), V)
  (~930 at V=31), far past the 100x this script now serves.
- embeddings: copy i rotates the embedding elements by (i*7) mod dim AND
  multiplies by a per-copy WALSH-ROW sign pattern — both norm-preserving
  orthogonal maps, so a transformed iid-ish vector stays ~orthogonal to
  every other copy's. Two prior defects in this map: the r15
  rotation-only version had period dim/gcd(7,dim) (64 at dim=64), so at
  100 copies copies 0 and 64 carried IDENTICAL vectors; the r16
  bit-slice sign fix still left same-rotation partners differing on only
  9/64 coordinates (cross-copy cosine ~0.72 — above every dedup/ANN
  threshold). Distinct Walsh rows differ on exactly half of a 64-aligned
  block, and the script ASSERTS the pairwise sign distance for every
  same-rotation pair before writing anything.
- events: copy i shifts ts by i*(span+1h) and offsets ids — Nx the data
  at the SAME event density, so interval joins scale by data, not by an
  artificially inflated rate.
- every other table is copied verbatim (dimension-sized).

An optional 4th arg `grow` switches documents to GROWN-VOCAB copies:
copy i suffixes every token with `q{i}` instead of permuting, so copies
share NO tokens and the shingle universe grows ~linearly with the corpus
(the Heaps-law regime: per-shingle document frequency stays CONSTANT as
the corpus scales, so uncapped n-gram joins are honestly linear). The
default closed-vocab mode keeps the original 31-token universe, where
per-shingle df grows with the corpus — every shingle becomes a hot
boilerplate key and sum(df^2) joins go quadratic; that is the
boilerplate-saturated regime the maxDocFreq caps exist for. The round-16
100x audit measures the dedup family in BOTH regimes.

Usage: python3 tools/scale_gen.py /root/testdata/sf0.1 /tmp/sf1 10 [grow]
"""
import sys, glob, os, shutil
from math import gcd
import duckdb

src, out, copies = sys.argv[1], sys.argv[2], int(sys.argv[3])
grow_vocab = len(sys.argv) > 4 and sys.argv[4] == "grow"
ID_OFF = 1_000_000
assert copies <= 128, "sign-flip distinctness argument holds for < 128 copies"
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

vocab = [r[0] for r in con.execute(
    f"SELECT DISTINCT unnest(string_split(text, ' ')) AS t FROM '{src}/documents.parquet' ORDER BY t"
).fetchall()]
V = len(vocab)
units = [a for a in range(1, V) if gcd(a, V) == 1]
print(f"vocab: {V} tokens ({len(units)} affine multipliers)")
# (a_i, b_i) collide only when i == j mod lcm(#units, V)
assert copies <= (len(units) * V) // gcd(len(units), V), \
    "affine-permutation distinctness exhausted for this copy count"


def doc_copy(i):
    if i == 0:
        return f"SELECT * FROM '{src}/documents.parquet'"
    if grow_vocab:
        return f"""
          SELECT doc_id + {i * ID_OFF} AS doc_id, text, lang, source,
                 CAST(length(text) AS INT) AS n_chars
          FROM (SELECT doc_id,
                  array_to_string(list_transform(string_split(text, ' '),
                    t -> t || 'q{i}'), ' ') AS text,
                  lang, source
                FROM '{src}/documents.parquet')"""
    a, b = units[i % len(units)], i % V
    if a == 1 and b == 0:
        b = 1
    perm = {w: vocab[(a * k + b) % V] for k, w in enumerate(vocab)}
    case = "CASE t " + " ".join(
        f"WHEN '{w}' THEN '{p}'" for w, p in perm.items()
    ) + " ELSE t END"
    return f"""
      SELECT doc_id + {i * ID_OFF} AS doc_id, text, lang, source,
             CAST(length(text) AS INT) AS n_chars
      FROM (SELECT doc_id,
              array_to_string(list_transform(string_split(text, ' '), t -> {case}), ' ') AS text,
              lang, source
            FROM '{src}/documents.parquet')"""


dim = con.execute(
    f"SELECT len(embedding) FROM '{src}/embeddings.parquet' LIMIT 1").fetchone()[0]


# Per-copy sign patterns are WALSH ROWS, not bit-slices of i (the r16
# version flipped coordinate j by bit (j mod 7) of i, so copies i and
# i+64 — which share a rotation, period dim/gcd(7,dim) — differed only
# where (j mod 7) == 6, i.e. 9 of 64 coordinates: cross-copy cosine
# ~0.72, ABOVE the 0.5/0.35 dedup/contamination thresholds, planting
# cross-copy semantic near-dups the docstring claimed away). A Walsh
# row s_w(j) = (-1)^popcount(w & (j mod 64)) makes any two DISTINCT
# rows differ on exactly half of any 64-aligned coordinate block; the
# row index is nonlinear in the rotation-period step so same-rotation
# partners never collide, and the pairwise property is ASSERTED below
# rather than trusted.
ROT_PERIOD = dim // gcd(7, dim)


def sign_pattern(i):
    if i == 0:
        return [1] * dim  # copy 0 is verbatim
    w = (i * 37 + 19 * (i // ROT_PERIOD)) % 64
    return [1 if bin(w & (j % 64)).count("1") % 2 == 0 else -1
            for j in range(dim)]


_pats = [sign_pattern(i) for i in range(copies)]
for _i in range(copies):
    for _i2 in range(_i + ROT_PERIOD, copies, ROT_PERIOD):
        _d = sum(1 for a, b in zip(_pats[_i], _pats[_i2]) if a != b)
        assert _d >= int(0.45 * dim), (
            f"same-rotation copies {_i},{_i2} differ on only {_d}/{dim} "
            "sign coordinates — cross-copy near-dup risk")


def emb_copy(i):
    if i == 0:
        return f"SELECT * FROM '{src}/embeddings.parquet'"
    k = (i * 7) % dim
    rot = (f"list_concat(embedding[{k + 1}:{dim}], embedding[1:{k}])" if k else "embedding")
    signs = ",".join(str(s) for s in _pats[i])
    flipped = f"list_transform({rot}, (x, j) -> x * [{signs}][j])"
    return f"""
      SELECT vec_id + {i * ID_OFF} AS vec_id,
             CAST({flipped} AS FLOAT[]) AS embedding, label
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
