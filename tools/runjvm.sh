#!/usr/bin/env bash
# Launch a graft main without sbt (frees the sbt project lock for tests
# while long scale rehearsals run). Mirrors build.sbt's forked-JVM flags:
# JDK17 add-opens, UTC session tz, no UI, SPARK_DRIVER_MEM heap (8g dev
# default — the same default the rehearsals are graded against).
#
# Usage: tools/runjvm.sh <mainClass> [args...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java -Xmx"${SPARK_DRIVER_MEM:-8g}" $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$REPO/target/scala-2.13/classes:/opt/spark/jars/*" "$@"
