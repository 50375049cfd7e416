#!/bin/bash
# Round-14 phase A measurements (machine otherwise idle):
#  1. q93 (+ companion q97) same-session sf1->sf10 paired gate on the
#     SHIPPED scoped wide-shuffle code, no env knobs (r13 verdict #1);
#     q266 rides along for its index-build/probe split ramp (#6).
#  2. Banded-family ramps sf1->sf10: ExactSubstr postings, Jaccard prefix
#     join, embedding near-dup at the corpus-sized layout (#3).
set -e
cd /root/repo
mkdir -p target/scale_r14
export SPARK_GRAFT_BENCH_REPS=3
for sf in sf1 sf10; do
  SPARK_GRAFT_SF_DIR=target/sfgen/$sf scripts/bench_direct.sh q93,q97,q266 \
    2> target/scale_r14/bench_$sf.err | grep '"metric"' > target/scale_r14/bench_$sf.json
  echo "[phaseA] bench $sf done"
done
for sf in sf1 sf10; do
  SPARK_GRAFT_SF_DIR=target/sfgen/$sf scripts/ramp_direct.sh \
    x_exactsubstr_full x_jaccard_prefix_full x_embedding_neardup_scaled_t09 \
    2> target/scale_r14/ramp_$sf.err | grep '"metric"' > target/scale_r14/ramp_$sf.json
  echo "[phaseA] ramp $sf done"
done
echo PHASE_A_DONE
