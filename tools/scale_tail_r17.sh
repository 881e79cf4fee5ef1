#!/usr/bin/env bash
# Round-17 100x scale-tail audit. Same two-regime structure as r16
# (see tools/scale_tail_r16.sh and tools/scale_gen.py), with the
# round's changes:
#
# - Fixtures REGENERATED with the Walsh-row sign patterns (the r16
#   ADVICE medium: the old bit-slice patterns left same-rotation copy
#   pairs at cross-copy cosine ~0.72, quietly inflating every
#   dedup/ANN truth set at 100x; the new patterns measure at the
#   unrelated-pair baseline). ANN/dedup 100x rows are therefore
#   re-baselined this round, not compared raw to r16's.
# - Group S gains the capped transitive-cluster family
#   (dedup_clusters_capped / dedup_keep_best_capped /
#   doc_pagerank_capped) — closing the one r16 perf_weak: the uncapped
#   family blew the 900 s watchdog at closed-vocab 100x, the capped
#   path must not — and the IVF near-dup arm
#   (embed_near_dup_ivf_scaled) + the (n, θ)-routed
#   embed_near_dup_auto_arm, which selects SRP at 1x and IVF at 100x
#   (the r16 stretch: the arm switch measured end to end).
# - Group G gets the task-7 A/B at 100x: the same queries at the fixed
#   32 shuffle partitions (r16 continuity) and at 256
#   (SPARK_GRAFT_SHUFFLE_PARTITIONS — separating sort-spill overhang
#   from algorithmic shape; on a real cluster this is AQE territory).
# - Every artifact now carries hostmark_1t/_mt (Bench writes them into
#   the spread JSON), so cross-round tail compares normalize
#   mechanically instead of by adjudication.
#
# Usage: tools/scale_tail_r17.sh [fixture_root]   (default /tmp/scale_r17)
set -euo pipefail
cd "$(dirname "$0")/.."
ROOT="${1:-/tmp/scale_r17}"
GROUP_S="bpe_encode,bm25_search,dedup_exact,dedup_containment_capped,dedup_clusters_capped,dedup_keep_best_capped,doc_pagerank_capped,dedup_incremental_stored,embed_near_dup_srp_scaled,embed_near_dup_ivf_scaled,embed_near_dup_auto_arm,hybrid_rrf_ann,ivf_stored_topk,ivf_topk,pq_topk_scaled_recall,semantic_contamination_scaled,semantic_prune_scaled"
GROUP_G="minhash_pairs,ngram_jaccard,dedup_clusters,dedup_keep_best,dedup_corpus"

[ -d "$ROOT/sf10x" ]   || python3 tools/scale_gen.py /root/testdata/sf0.1 "$ROOT/sf10x" 10
[ -d "$ROOT/sf100x" ]  || python3 tools/scale_gen.py /root/testdata/sf0.1 "$ROOT/sf100x" 100
[ -d "$ROOT/sf10xg" ]  || python3 tools/scale_gen.py /root/testdata/sf0.1 "$ROOT/sf10xg" 10 grow
[ -d "$ROOT/sf100xg" ] || python3 tools/scale_gen.py /root/testdata/sf0.1 "$ROOT/sf100xg" 100 grow

run() { # $1 = queries, $2 = sf dir, $3 = out json, $4 = runs, $5 = shuffle partitions
  SPARK_GRAFT_BENCH_ONLY="$1" SPARK_GRAFT_BENCH_RUNS="$4" \
  SPARK_GRAFT_SF_DIR="$2" SPARK_GRAFT_SPREAD_OUT="$3" \
  SPARK_GRAFT_SHUFFLE_PARTITIONS="${5:-32}" \
  SPARK_GRAFT_BENCH_TIMEOUT_SEC=900 SPARK_DRIVER_MEM=32g \
  sbt -batch "runMain graft.Bench"
}

# 1x base (sf0.1 verbatim — copy 0 of every fixture) and closed-vocab
# 10x for BOTH groups (G is still linear there; these are the ratio base)
run "$GROUP_S,$GROUP_G" /root/testdata/sf0.1 tools/scale_tail_r17_1x.json  3 32
run "$GROUP_S,$GROUP_G" "$ROOT/sf10x"        tools/scale_tail_r17_10x.json 3 32
# group S at closed-vocab 100x (the boilerplate-saturated regime: the
# capped family's home turf; auto_arm must select IVF here)
run "$GROUP_S"          "$ROOT/sf100x"       tools/scale_tail_r17_100x.json 2 32
# group G at grown-vocab 10x and 100x, fixed 32 partitions (r16 base)
run "$GROUP_G"          "$ROOT/sf10xg"       tools/scale_tail_r17_10xg.json 3 32
run "$GROUP_G"          "$ROOT/sf100xg"      tools/scale_tail_r17_100xg.json 2 32
# task-7 A/B: same grown-vocab 100x, shuffle partitions scaled 32 -> 256
run "$GROUP_G"          "$ROOT/sf100xg"      tools/scale_tail_r17_100xg_p256.json 2 256

python3 tools/scale_audit.py tools/scale_tail_r17_1x.json tools/scale_tail_r17_100x.json 20
python3 tools/scale_audit.py tools/scale_tail_r17_10xg.json tools/scale_tail_r17_100xg.json 20
python3 tools/scale_audit.py tools/scale_tail_r17_100xg.json tools/scale_tail_r17_100xg_p256.json 2
