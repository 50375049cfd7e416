#!/bin/bash
# Round-15 jaccard-prefix sf10 autopsy runner: launches the dedicated
# x_jaccard_prefix_full ramp at sf10 and samples full-JVM thread dumps
# every 15 s until the JVM exits (or 25 min). The r14 log evidence says
# the executor "driver-heartbeater" thread blocks inside ONE
# reportHeartBeat call for the whole silence window (piled-up
# scheduleAtFixedRate runs burst-drain at teardown) — the dumps name the
# blocking frame.
set -u
cd /root/repo
mkdir -p target/diag_r15
SPARK_GRAFT_SF_DIR=target/sfgen/sf10 scripts/ramp_direct.sh x_jaccard_prefix_full \
  2> target/diag_r15/run.err > target/diag_r15/run.json &
RUN=$!
# ramp_direct execs java, so $RUN IS the JVM pid
i=0
while kill -0 "$RUN" 2>/dev/null && [ $i -lt 100 ]; do
  sleep 15
  i=$((i+1))
  jstack "$RUN" > "target/diag_r15/stack_$(printf '%03d' $i).txt" 2>/dev/null || true
done
wait "$RUN"
echo "EXIT=$? SAMPLES=$i"
