#!/bin/bash
# Direct-JVM ScaleRamp runner (bench_direct.sh pattern): bypasses the sbt
# project lock so generated-SF operator ramps can run while sbt
# compiles/tests in parallel.
# Usage: SPARK_GRAFT_SF_DIR=target/sfgen/sf1 scripts/ramp_direct.sh x_q93
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
  -cp "$CLS:/opt/spark/jars/*" graft.ScaleRamp "$@"
