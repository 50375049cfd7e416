#!/bin/bash
# Round-16 generic alternating-JVM A/B: same host, same hour, A/B/A/B/A/B,
# 3 bench reps per JVM, medians compared offline. Removes host drift from
# single-change adjudication (r16: filtered-run walls swung ~30% between
# runs at equal start-canary; identical-code queries "regressed" 25-50%).
# Usage: scripts/ab_r16.sh <name> <query-filter> [sfDir]
set -uo pipefail
cd /root/repo
NAME="$1"; QS="$2"; SF="${3:-/root/testdata/sf0.1}"
mkdir -p target/ab_r16
for round in 1 2 3; do
  for side in A B; do
    cls=/tmp/graft_A
    [ "$side" = B ] && cls=/root/repo/target/scala-2.13/classes
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
