#!/usr/bin/env bash
# Round-16 100x scale-tail audit, TWO REGIMES (see tools/scale_gen.py):
#
# Group S — the scale-path queries (capped / corpus-derived operating
#   points / store-backed / linear rows) on the CLOSED-VOCAB fixtures:
#   the boilerplate-saturated regime, where per-shingle df grows with the
#   corpus. The uncapped n-gram family is EXCLUDED here by measurement,
#   not by assumption: dedup_clusters (uncapped ngramJaccardPairs) blew
#   the 900 s watchdog at closed-vocab 100x — sum(df^2) grows ~10,000x
#   when every shingle is hot, exactly the blowup maxDocFreq exists for
#   (dedup_containment_capped, which runs the same join shape WITH the
#   cap, stays in the group).
#
# Group G — the uncapped n-gram/minhash dedup family on GROWN-VOCAB
#   fixtures (token universe scales with the corpus, per-shingle df
#   constant — the Heaps-law regime of a real growing corpus): the
#   uncapped family must be ~linear here.
#
# 1x base for both groups is sf0.1 itself (copy 0 is verbatim in every
# fixture). Same heap (32g) at every point so ratios compare like for
# like.
#
# Usage: tools/scale_tail_r16.sh [fixture_root]   (default /tmp/scale_r16)
# Writes tools/scale_tail_r16_{1x,10x,100x}.json          (group S; 1x/10x
#   files also carry group G's rows at closed-vocab 1x/10x, where the
#   closed fixture is still linear) and
#   tools/scale_tail_r16_{10xg,100xg}.json                (group G).
set -euo pipefail
cd "$(dirname "$0")/.."
ROOT="${1:-/tmp/scale_r16}"
GROUP_S="bpe_encode,bm25_search,dedup_exact,dedup_containment_capped,dedup_incremental_stored,embed_near_dup_srp_scaled,hybrid_rrf_ann,ivf_stored_topk,ivf_topk,pq_topk_scaled_recall,semantic_contamination_scaled,semantic_prune_scaled"
GROUP_G="minhash_pairs,ngram_jaccard,dedup_clusters,dedup_keep_best,dedup_corpus"

[ -d "$ROOT/sf10x" ]   || python3 tools/scale_gen.py /root/testdata/sf0.1 "$ROOT/sf10x" 10
[ -d "$ROOT/sf100x" ]  || python3 tools/scale_gen.py /root/testdata/sf0.1 "$ROOT/sf100x" 100
[ -d "$ROOT/sf10xg" ]  || python3 tools/scale_gen.py /root/testdata/sf0.1 "$ROOT/sf10xg" 10 grow
[ -d "$ROOT/sf100xg" ] || python3 tools/scale_gen.py /root/testdata/sf0.1 "$ROOT/sf100xg" 100 grow

run() { # $1 = queries, $2 = sf dir, $3 = out json, $4 = runs
  SPARK_GRAFT_BENCH_ONLY="$1" SPARK_GRAFT_BENCH_RUNS="$4" \
  SPARK_GRAFT_SF_DIR="$2" SPARK_GRAFT_SPREAD_OUT="$3" \
  SPARK_GRAFT_BENCH_TIMEOUT_SEC=900 SPARK_DRIVER_MEM=32g \
  sbt -batch "runMain graft.Bench"
}

# group S + group G at 1x and closed-vocab 10x (G is still linear there —
# the r15 full-spread audit measured it; these files are the ratio base)
run "$GROUP_S,$GROUP_G" /root/testdata/sf0.1 tools/scale_tail_r16_1x.json  3
run "$GROUP_S,$GROUP_G" "$ROOT/sf10x"        tools/scale_tail_r16_10x.json 3
# group S at closed-vocab 100x
run "$GROUP_S"          "$ROOT/sf100x"       tools/scale_tail_r16_100x.json 2
# group G at grown-vocab 10x and 100x
run "$GROUP_G"          "$ROOT/sf10xg"       tools/scale_tail_r16_10xg.json 3
run "$GROUP_G"          "$ROOT/sf100xg"      tools/scale_tail_r16_100xg.json 2

python3 tools/scale_audit.py tools/scale_tail_r16_1x.json tools/scale_tail_r16_100x.json 20
python3 tools/scale_audit.py tools/scale_tail_r16_10xg.json tools/scale_tail_r16_100xg.json 20
