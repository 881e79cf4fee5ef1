#!/usr/bin/env bash
# Round-16 100x scale-tail audit: the ~17 scale-critical queries (the
# dedup/containment and ANN/retrieval families, with every corpus-derived
# operating point active) measured at 1x (sf0.1), 10x and 100x fixtures
# built by tools/scale_gen.py (period-safe transforms — see its header).
# Envelope-edge rows (embed_near_dup_srp fixed point, uncapped
# dedup_containment_prune) are EXCLUDED by design: their quadratic shape
# is documented in SCALE.md and measured at 10x; at 100x they are the
# rows the scaled/capped variants exist to replace.
#
# Usage: tools/scale_tail_r16.sh [fixture_root]   (default /tmp/scale_r16)
# Writes tools/scale_tail_r16_{1x,10x,100x}.json; compare with
#   python3 tools/scale_audit.py tools/scale_tail_r16_1x.json tools/scale_tail_r16_100x.json
set -euo pipefail
cd "$(dirname "$0")/.."
ROOT="${1:-/tmp/scale_r16}"
SUBSET="bpe_encode,bm25_search,dedup_exact,dedup_clusters,dedup_containment_capped,dedup_corpus,dedup_incremental_stored,dedup_keep_best,embed_near_dup_srp_scaled,hybrid_rrf_ann,ivf_stored_topk,ivf_topk,minhash_pairs,ngram_jaccard,pq_topk_scaled_recall,semantic_contamination_scaled,semantic_prune_scaled"

[ -d "$ROOT/sf10x" ]  || python3 tools/scale_gen.py /root/testdata/sf0.1 "$ROOT/sf10x" 10
[ -d "$ROOT/sf100x" ] || python3 tools/scale_gen.py /root/testdata/sf0.1 "$ROOT/sf100x" 100

run() { # $1 = sf dir, $2 = out json, $3 = runs
  SPARK_GRAFT_BENCH_ONLY="$SUBSET" SPARK_GRAFT_BENCH_RUNS="$3" \
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_SPREAD_OUT="$2" \
  SPARK_GRAFT_BENCH_TIMEOUT_SEC=900 SPARK_DRIVER_MEM=32g \
  sbt -batch "runMain graft.Bench"
}

run /root/testdata/sf0.1 tools/scale_tail_r16_1x.json   3
run "$ROOT/sf10x"        tools/scale_tail_r16_10x.json  3
run "$ROOT/sf100x"       tools/scale_tail_r16_100x.json 2

python3 tools/scale_audit.py tools/scale_tail_r16_1x.json tools/scale_tail_r16_10x.json 20
python3 tools/scale_audit.py tools/scale_tail_r16_10x.json tools/scale_tail_r16_100x.json 20
python3 tools/scale_audit.py tools/scale_tail_r16_1x.json tools/scale_tail_r16_100x.json 20
