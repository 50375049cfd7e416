#!/bin/bash
# Round-15 jaccard-prefix gate (r14 verdict #1): dedicated same-hour
# sf1/sf10 runs of x_jaccard_prefix_full on the FIXED operator (scoped
# wide shuffle + persisted token frame + checkpointed narrow candidates),
# 3 reps, zero env knobs, one JVM per (query, sf). The candidate counts
# at both SFs give the workload-growth denominator for the SCALE.md ratio.
set -eo pipefail
cd /root/repo
mkdir -p target/scale_r15
for sf in sf1 sf10; do
  echo "[jacgate] ramp $sf"
  SPARK_GRAFT_SF_DIR=target/sfgen/$sf scripts/ramp_direct.sh x_jaccard_prefix_full \
    2> "target/scale_r15/jacfix_${sf}.err" \
    | grep '"metric"' > "target/scale_r15/jacfix_${sf}.json"
done
for sf in sf1 sf10; do
  echo "[jacgate] candcount $sf"
  scripts/candcount_direct.sh "target/sfgen/$sf" jaccard \
    2> "target/scale_r15/jaccand_${sf}.err" \
    | grep CANDIDATES > "target/scale_r15/jaccand_${sf}.txt"
done
echo JACGATE_DONE
