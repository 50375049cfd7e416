#!/bin/bash
# Round-17 generalized alternating-JVM A/B (ab_r16.sh with explicit class
# dirs): same host, same hour, A/B/A/B/A/B, 3 bench reps per JVM, medians
# compared offline by ab_report.py. Lets the round A/B two HISTORICAL
# snapshots (e.g. dc00c15 vs f9db219 — the r16 verdict #1 family-1 wall
# attribution) as well as current-vs-snapshot.
# Usage: CLS_A=<dirA> CLS_B=<dirB> scripts/ab_r17.sh <name> <query-filter> [sfDir]
set -uo pipefail
cd /root/repo
NAME="$1"; QS="$2"; SF="${3:-/root/testdata/sf0.1}"
: "${CLS_A:?set CLS_A}"; : "${CLS_B:?set CLS_B}"
mkdir -p target/ab_r16
for round in 1 2 3; do
  for side in A B; do
    cls="$CLS_A"
    [ "$side" = B ] && cls="$CLS_B"
    if CLS="$cls" SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_SF_DIR="$SF" \
       scripts/bench_direct.sh "$QS" \
         2> "target/ab_r16/${NAME}_${side}${round}.err" | grep '"metric"' \
         > "target/ab_r16/${NAME}_${side}${round}.json" \
       && [ -s "target/ab_r16/${NAME}_${side}${round}.json" ]; then
      echo "[ab] ${NAME} ${side}${round} OK"
    else
      echo "[ab] ${NAME} ${side}${round} FAILED"
    fi
  done
done
echo AB_DONE_${NAME}
