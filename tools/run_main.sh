#!/bin/bash
# Run a graft main class on the compiled classpath without sbt (so
# profiling / data-generation runs don't contend with a live sbt test
# session for the project lock). Mirrors build.sbt's JDK17 add-opens.
# Usage: run_main.sh <mainClass> [args...]   (env: SPARK_DRIVER_MEM)
set -euo pipefail
REPO=/root/repo
CP="$REPO/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "$@"
