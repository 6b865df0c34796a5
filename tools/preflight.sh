#!/bin/bash
# MANDATORY pre-snapshot gate (r17 verdict task #2): the r17 round lost
# its entire correctness record because an end-of-round refactor was
# committed without compiling. This script is the minimum bar before ANY
# end-of-round (or otherwise unverified) commit:
#   1. Test/compile           — the r17 failure class (main OR test broken)
#   2. QueryIndexSpec         — QUERY_INDEX.md anchors not stale
#   3. 3-query smoke Verify   — one query per heavy family actually runs
#      end-to-end at sf0.001 and oracle-passes in DuckDB
# Exit 0 = safe to commit. Anything else = DO NOT COMMIT THE SNAPSHOT.
#
# Usage: tools/preflight.sh [sf-dir]   (default /root/testdata/sf0.001)
set -u
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.001}
SMOKE=${PREFLIGHT_SMOKE:-x1_exact_dedup,x105_pq_recall,x119_vocab_coverage}
OUT=$(mktemp -d /tmp/preflight.XXXXXX)
trap 'rm -rf "$OUT"' EXIT

echo "[preflight] 1/3 Test/compile"
if ! sbt -batch "Test/compile" >"$OUT/compile.log" 2>&1; then
  tail -30 "$OUT/compile.log"
  echo "[preflight] FAIL: Test/compile broken — this is exactly the r17 loss; fix before committing" >&2
  exit 1
fi

echo "[preflight] 2/3 QueryIndexSpec (QUERY_INDEX.md staleness)"
if ! sbt -batch "testOnly graft.QueryIndexSpec" >"$OUT/index.log" 2>&1; then
  tail -30 "$OUT/index.log"
  echo "[preflight] FAIL: QUERY_INDEX.md is stale — run: sbt \"Test/runMain graft.QueryIndexGen\" and re-check" >&2
  exit 1
fi

echo "[preflight] 3/3 smoke Verify ($SMOKE @ $SF)"
if ! SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} \
    sbt -batch "runMain graft.Verify $SF $OUT/verify $SMOKE" >"$OUT/verify.log" 2>&1; then
  tail -30 "$OUT/verify.log"
  echo "[preflight] FAIL: smoke Verify crashed" >&2
  exit 1
fi
if grep -F '[verify] ' "$OUT/verify.log"; then
  echo "[preflight] FAIL: a smoke query failed inside Verify (lines above)" >&2
  exit 1
fi
if ! python3 tools/check.py "$SF" "$OUT/verify" >"$OUT/check.log" 2>&1; then
  tail -20 "$OUT/check.log"
  echo "[preflight] FAIL: DuckDB oracle mismatch on a smoke query" >&2
  exit 1
fi
tail -1 "$OUT/check.log"
echo "[preflight] OK — safe to commit"
