#!/bin/bash
# Round-15 carried ramps (r14 verdict #2): exactsubstr and embedding
# sf1 -> sf10, each (family, sf) in its OWN dedicated JVM so a failure in
# one family cannot starve the others (the r14 shared-JVM ramp died on
# jaccard before these ever ran). Pairs are same-session sequential.
set -e
cd /root/repo
mkdir -p target/scale_r15
for q in x_exactsubstr_full x_embedding_neardup_scaled_t09; do
  for sf in sf1 sf10; do
    echo "[r15 ramps] $q @ $sf"
    SPARK_GRAFT_SF_DIR=target/sfgen/$sf scripts/ramp_direct.sh "$q" \
      2> "target/scale_r15/${q}_${sf}.err" \
      | grep '"metric"' > "target/scale_r15/${q}_${sf}.json" || echo "[r15 ramps] $q @ $sf FAILED"
  done
done
echo R15_RAMPS_DONE
