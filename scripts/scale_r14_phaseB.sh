#!/bin/bash
# Round-14 phase B: the sf100 THIRD DECADE (r12 task #5 carried through
# r13 — the SCALE.md row that was promised but never committed).
# Scope per the r13 verdict: q93 + the medallion trio first (the core
# deliverable), then q97 as a separate second run so a wall-clock cut
# cannot take the core rows with it. 3 reps, stage splits skipped
# (SPARK_GRAFT_SKIP_STAGES=1): one cumulative stage walk at sf100 costs
# more than the repped queries themselves.
set -e
cd /root/repo
mkdir -p target/scale_r14
export SPARK_GRAFT_BENCH_REPS=3
export SPARK_GRAFT_SKIP_STAGES=1
export SPARK_GRAFT_SF_DIR=target/sfgen/sf100
scripts/bench_direct.sh q93,q60,q61,q62 \
  2> target/scale_r14/bench_sf100_core.err | grep '"metric"' \
  > target/scale_r14/bench_sf100_core.json
echo "[phaseB] sf100 core (q93 + medallion trio) done"
scripts/bench_direct.sh q97 \
  2> target/scale_r14/bench_sf100_q97.err | grep '"metric"' \
  > target/scale_r14/bench_sf100_q97.json
echo "[phaseB] sf100 q97 done"
echo PHASE_B_DONE
