#!/bin/bash
# Direct-JVM Bench runner: bypasses the sbt project lock so long
# generated-SF benches can run while sbt compiles/tests in parallel.
# Usage: CLS=/tmp/graft_cls SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_BENCH_REPS=3 \
#        scripts/bench_direct.sh q93
CLS="${CLS:-/root/repo/target/scala-2.13/classes}"
exec java \
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
  -Xmx"${SPARK_DRIVER_MEM:-64g}" \
  -cp "$CLS:/opt/spark/jars/*" graft.Bench "$@"
