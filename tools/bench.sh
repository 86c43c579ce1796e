#!/usr/bin/env bash
# Standalone bench runner (no sbt JVM overhead): mirrors build.sbt's
# javaOptions. Usage:
#   tools/bench.sh                              # full board, per-family JVMs
#   SPARK_GRAFT_BENCH_ONLY=qt_markup tools/bench.sh   # isolated diagnostic
# Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 4),
#      SPARK_GRAFT_BENCH_OUT, SPARK_GRAFT_BENCH_FORK.
set -euo pipefail
cd "$(dirname "$0")/.."
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
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Bench "$@"
