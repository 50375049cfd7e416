#!/bin/bash
# q93 paired gate: 3 alternating sf1/sf10 pairs (q93 only, 3 reps each).
# Per-pair ratios absorb hour-scale host drift; the committed read is the
# median pair ratio + the min-min, against the counted candidate growth.
set -e
cd /root/repo
mkdir -p target/scale_r14
export SPARK_GRAFT_BENCH_REPS=3
for i in 1 2 3; do
  for sf in sf1 sf10; do
    SPARK_GRAFT_SF_DIR=target/sfgen/$sf scripts/bench_direct.sh q93 \
      2> target/scale_r14/q93gate_${sf}_$i.err | grep '"metric"' | head -1 \
      > target/scale_r14/q93gate_${sf}_$i.json
    echo "[q93gate] pair $i $sf done"
  done
done
echo Q93GATE_DONE
