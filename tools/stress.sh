#!/usr/bin/env bash
# Standing 10x scale-stress runner (graft.Stress): the heaviest
# operator families at base and 10x adversarial input, one JSON line out.
# Usage:
#   tools/stress.sh                      # sf0.1, 4 cpus, -> STRESS.json
#   SPARK_GRAFT_CPUS=32 SPARK_GRAFT_STRESS_OUT=STRESS_r14.json tools/stress.sh
# Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 4),
#      SPARK_GRAFT_STRESS_OUT (default STRESS.json).
set -euo pipefail
cd "$(dirname "$0")/.."
. tools/java_opts.sh
exec java $GRAFT_JAVA_OPTS -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$GRAFT_CLASSPATH" graft.Stress "$@"
