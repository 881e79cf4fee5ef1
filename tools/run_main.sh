#!/usr/bin/env bash
# Run a graft main against the compiled classes without sbt (no JVM/sbt
# startup, no sbt lock contention with a concurrent test run):
#   tools/run_main.sh graft.Bench
#   SPARK_GRAFT_SF_DIR=... tools/run_main.sh graft.PlanDump sf0.1 plans/r17 _before q1,q2
# Mirrors build.sbt's javaOptions (JDK17 add-opens + UI off + UTC).
set -euo pipefail
cd "$(dirname "$0")/.."
CLASSES=target/scala-2.13/classes
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CLASSES:/opt/spark/jars/*" "$@"
