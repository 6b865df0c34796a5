#!/bin/sh
# Self-certifying bench runner (VERDICT r15 task 4): run graft.Bench and
# RETRY with a backoff while the session fails its own load gate
# (`record_ok: false` — pre-run canary median >1.3x, any canary >1.5x,
# or any mid-run probe >1.5x). Every attempt's lossless artifact is
# kept (`<out>.attemptN`), so a round that never found a quiet window
# ships the 3-attempt evidence instead of silently recording a hot
# session — the r13/r14/r15 artifact class this closes.
#
# Usage: tools/run_bench.sh [out.json] [sfDir] [attempts] [backoff_s]
# Exit 0 iff some attempt certified (its artifact is copied to <out>);
# exit 1 after <attempts> refused attempts (<out> carries the LAST
# attempt, flagged record_ok:false, with all attempts kept alongside).
set -u
cd "$(dirname "$0")/.."

OUT="${1:-bench_full.json}"
SF="${2:-/root/testdata/sf0.1}"
ATTEMPTS="${3:-3}"
BACKOFF="${4:-300}"

i=1
while [ "$i" -le "$ATTEMPTS" ]; do
  echo "[run_bench] attempt $i/$ATTEMPTS (loadavg: $(cut -d' ' -f1-3 /proc/loadavg))"
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
    SPARK_GRAFT_BENCH_OUT="$OUT.attempt$i" \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep -F '"metric"'
  if [ ! -f "$OUT.attempt$i" ]; then
    echo "[run_bench] attempt $i produced no artifact (build failure?)" >&2
    exit 2
  fi
  # parse, don't grep: certification must not couple to the writer's
  # pretty-print spacing (the r16 advisory — a compact-JSON change would
  # silently classify every certified run as refused)
  if python3 -c 'import json, sys; sys.exit(0 if json.load(open(sys.argv[1])).get("record_ok") is True else 1)' "$OUT.attempt$i"; then
    cp "$OUT.attempt$i" "$OUT"
    echo "[run_bench] attempt $i certified (record_ok true) -> $OUT"
    exit 0
  fi
  echo "[run_bench] attempt $i refused by the load gate (record_ok false)"
  if [ "$i" -lt "$ATTEMPTS" ]; then
    echo "[run_bench] backing off ${BACKOFF}s before retrying"
    sleep "$BACKOFF"
  fi
  i=$((i + 1))
done
cp "$OUT.attempt$ATTEMPTS" "$OUT"
echo "[run_bench] no attempt certified after $ATTEMPTS tries; $OUT carries the last (refused) run and the per-attempt artifacts are the evidence" >&2
exit 1
