#!/bin/bash
# Round-14 banded-family ramps (r13 verdict #3), rerun standalone after
# the q93 A/B: ExactSubstr postings, Jaccard prefix join, embedding
# near-dup (corpus-sized layout) at sf1 then sf10.
set -e
cd /root/repo
mkdir -p target/scale_r14
for sf in sf1 sf10; do
  SPARK_GRAFT_SF_DIR=target/sfgen/$sf scripts/ramp_direct.sh \
    x_exactsubstr_full x_jaccard_prefix_full x_embedding_neardup_scaled_t09 \
    2> target/scale_r14/ramp_$sf.err | grep '"metric"' > target/scale_r14/ramp_$sf.json
  echo "[ramps] $sf done"
done
echo RAMPS_DONE
