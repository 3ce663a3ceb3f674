#!/bin/bash
# Launch a graft main class directly on the cached classpath (same
# --add-opens set as tools/run_close.py), skipping sbt JVM bring-up.
# Usage: tools/java_run.sh <heap> <MainClass> [args...]
# Env passthrough: SPARK_GRAFT_* vars are read by the mains themselves.
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
HEAP="$1"; shift
MAIN="$1"; shift
CP="$(cat "$REPO/target/close_classpath.txt")"
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent \
         java.base/java.util.concurrent.atomic java.base/sun.nio.ch \
         java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens $p=ALL-UNNAMED"
done
exec java -Xmx"$HEAP" $OPENS -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -cp "$CP" "$MAIN" "$@"
