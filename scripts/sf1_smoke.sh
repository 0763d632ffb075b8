#!/usr/bin/env bash
# sf1 smoke lane — O(n²)-shape detector (VERDICT r8 task 7).
#
# Inflates sf0.1 tenfold into target/sf1 (ScaleGen: ids remapped, text
# perturbed per copy) and runs the historically slowest queries there.
# Linear operators should land near 10× their sf0.1 time; a quadratic
# shape shows up as ~100×. This lane makes regressions like the round-7/8
# HOF findings (75 s / 150 s operators that were clean at sf0.01) visible
# BEFORE the committed bench.
#
# Usage: scripts/sf1_smoke.sh [queries]   (default: the known-slowest set)
set -euo pipefail
cd "$(dirname "$0")/.."

SF1_DIR=target/sf1
QUERIES="${1:-dedup_clusters,dedup_minhash,dedup_near,range_join,dedup_simhash,top_ngram_frac,repetition_stats,asof_join_global,tfidf_top_terms,unigram_logprob}"

if [ ! -d "$SF1_DIR/lineitem.parquet" ]; then
  echo "[sf1] generating $SF1_DIR from sf0.1 (one-time, ~1 min)..."
  sbt -batch "runMain graft.ScaleGen /root/testdata/sf0.1 $SF1_DIR 10" \
    | grep '\[scalegen\]'
fi

echo "[sf1] running: $QUERIES"
SPARK_GRAFT_SF_DIR="$SF1_DIR" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
SPARK_GRAFT_QUERIES="$QUERIES" SPARK_GRAFT_QUERY_TIMEOUT="${SPARK_GRAFT_QUERY_TIMEOUT:-300}" \
SPARK_GRAFT_BENCH_OUT="scripts/sf1_smoke_out.json" \
  sbt -batch "runMain graft.Bench" 2>&1 | grep -E '\[bench\]|"metric"'
echo "[sf1] compare scripts/sf1_smoke_out.json against bench_out.json (sf0.1):"
echo "[sf1] linear ops land ~10x their sf0.1 time; a quadratic shape shows ~100x."
