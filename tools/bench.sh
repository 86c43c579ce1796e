#!/usr/bin/env bash
# Standalone bench runner (no sbt JVM overhead): mirrors build.sbt's
# javaOptions. Usage:
#   tools/bench.sh                              # full board, per-family JVMs
#   SPARK_GRAFT_BENCH_ONLY=qt_markup tools/bench.sh   # isolated diagnostic
# Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 4),
#      SPARK_GRAFT_BENCH_OUT, SPARK_GRAFT_BENCH_FORK.
set -euo pipefail
cd "$(dirname "$0")/.."
. tools/java_opts.sh
exec java $GRAFT_JAVA_OPTS -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$GRAFT_CLASSPATH" graft.Bench "$@"
