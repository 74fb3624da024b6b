#!/usr/bin/env bash
# Launch a graft main class outside sbt (keeps sbt free for compiles).
# Usage: tools/run_main.sh graft.Verify /root/testdata/sf0.1 /tmp/out
# Env: SPARK_GRAFT_CPUS, SPARK_DRIVER_MEM, SPARK_GRAFT_SF_DIR pass through.
set -euo pipefail
cd "$(dirname "$0")/.."
CP="${GRAFT_CLASSES:-target/scala-2.13/classes}:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-16g}" \
  -cp "$CP" "$@"
