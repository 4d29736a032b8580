#!/bin/bash
# Stress-run HnswSpec directly on the compiled test classes (no sbt —
# avoids the project lock and the per-run sbt startup), optionally with
# a parallel CPU-load generator, to reproduce the driver's 437/438
# HnswSpec failure under load. Usage: stress_hnsw.sh <n_runs> [load]
set -uo pipefail
REPO=/root/repo
N=${1:-20}
LOAD=${2:-0}
CP="$REPO/target/scala-2.13/test-classes:$REPO/target/scala-2.13/classes"
CP="$CP:$(find /root/.cache/coursier -name 'scalatest*_2.13-3.2.19.jar' -o -name 'scalatest-compatible-3.2.19.jar' -o -name 'scalactic_2.13-3.2.19.jar' | tr '\n' ':')"
CP="$CP:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
LOADPIDS=()
if [ "$LOAD" -gt 0 ]; then
  for i in $(seq 1 "$LOAD"); do
    (while true; do :; done) &
    LOADPIDS+=($!)
  done
  echo "load generators: ${LOADPIDS[*]}"
fi
trap '[ ${#LOADPIDS[@]} -gt 0 ] && kill "${LOADPIDS[@]}" 2>/dev/null' EXIT
PASS=0; FAIL=0
for i in $(seq 1 "$N"); do
  if java $OPENS -Xmx6g -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC -cp "$CP" \
      org.scalatest.tools.Runner -R "$REPO/target/scala-2.13/test-classes" \
      -s graft.operators.HnswSpec -o > /tmp/stress_hnsw_run$i.log 2>&1; then
    PASS=$((PASS+1)); echo "run $i: PASS"
  else
    FAIL=$((FAIL+1)); echo "run $i: FAIL (log: /tmp/stress_hnsw_run$i.log)"
    grep -E "FAILED|Exception|assert" /tmp/stress_hnsw_run$i.log | head -5
  fi
done
echo "total: $PASS pass / $FAIL fail"
exit $((FAIL > 0))
