#!/bin/bash
# Chained scale-fixture generation: sf0.1 -> sf1 -> sf10 -> sf100, each a
# 10x GenSf replication of the previous output. Runs in a plain JVM
# (bench_direct.sh pattern) so sbt keeps the project lock for tests.
# Usage: scripts/gen_chain.sh [last]   (last in {sf1,sf10,sf100}; default sf100)
set -e
CLS="${CLS:-/root/repo/target/scala-2.13/classes}"
LAST="${1:-sf100}"
run() {
  java \
    --add-opens java.base/java.lang=ALL-UNNAMED \
    --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
    --add-opens java.base/java.lang.reflect=ALL-UNNAMED \
    --add-opens java.base/java.io=ALL-UNNAMED \
    --add-opens java.base/java.net=ALL-UNNAMED \
    --add-opens java.base/java.nio=ALL-UNNAMED \
    --add-opens java.base/java.util=ALL-UNNAMED \
    --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
    --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
    --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
    --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
    --add-opens java.base/sun.security.action=ALL-UNNAMED \
    --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Xmx64g \
    -cp "$CLS:/opt/spark/jars/*" graft.GenSf "$@"
}
echo "[gen_chain] sf0.1 -> sf1"
run /root/testdata/sf0.1 target/sfgen/sf1 10
[ "$LAST" = "sf1" ] && exit 0
echo "[gen_chain] sf1 -> sf10"
run target/sfgen/sf1 target/sfgen/sf10 10
[ "$LAST" = "sf10" ] && exit 0
echo "[gen_chain] sf10 -> sf100"
run target/sfgen/sf10 target/sfgen/sf100 10
echo "[gen_chain] done"
