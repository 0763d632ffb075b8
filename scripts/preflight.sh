#!/usr/bin/env bash
# Preflight gate — run before EVERY end-of-round / milestone commit.
# Catches the two failure modes that have zeroed rounds before:
#   1. code that doesn't compile (r3: ScaleWindows, r5: ReshapeOps)
#   2. a query/oracle regression in the driver gate
#
# Usage: scripts/preflight.sh [sf-dir]    (default /root/testdata/sf0.001)
# Exit 0 = safe to commit. Anything else = DO NOT COMMIT.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.001}"
OUT=target/preflight_out
# Three queries spanning the main surfaces: core agg, reshape, llm/dedup.
SMOKE_QUERIES="${SPARK_GRAFT_QUERIES:-groupby_agg,pivot_longer,dedup_exact}"

echo "[preflight] 1/3 compile (main + test)..."
sbt -batch compile "Test/compile" >/dev/null

echo "[preflight] 2/3 mini-Verify (${SMOKE_QUERIES}) @ ${SF_DIR}..."
rm -rf "$OUT"
SPARK_GRAFT_QUERIES="$SMOKE_QUERIES" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
  sbt -batch "runMain graft.Verify $SF_DIR $OUT" >/dev/null 2>&1 \
  || { echo "[preflight] FAIL: graft.Verify crashed"; exit 1; }

echo "[preflight] 3/3 DuckDB compare..."
python3 scripts/check.py "$SF_DIR" "$OUT" | tail -1 | tee /dev/stderr \
  | grep -qE '^[1-9][0-9]*/[0-9]+ comparable queries pass' \
  || { echo "[preflight] FAIL: gate compare failed"; exit 1; }
FAILS=$(python3 scripts/check.py "$SF_DIR" "$OUT" | grep -c '^FAIL' || true)
if [ "$FAILS" -ne 0 ]; then
  echo "[preflight] FAIL: $FAILS failing queries"; exit 1
fi

echo "[preflight] OK — safe to commit."
