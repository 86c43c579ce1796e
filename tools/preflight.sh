#!/usr/bin/env bash
# Round-start preflight (~1 min): compile + run every registered query at
# sf0.001 and fail loudly if any errors. Catches driver-side testdata/env
# shifts (e.g. the round-12 events.ts TIMESTAMP(NANOS)→(MICROS) regen that
# silently killed 28 queries) BEFORE any building happens.
# Usage: tools/preflight.sh  [sf-dir]  (default /root/testdata/sf0.001)
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.001}"
OUT="$(mktemp -d /tmp/graft_preflight.XXXXXX)"
sbt -batch compile
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx8g \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$SF" "$OUT"
if [ "$(cat "$OUT/errors.json")" != "{}" ]; then
  echo "PREFLIGHT FAILED — errors.json:" >&2
  cat "$OUT/errors.json" >&2
  exit 1
fi
N=$(ls -d "$OUT"/*/ | wc -l)
echo "PREFLIGHT OK: $N queries ran clean at $SF"
rm -rf "$OUT"
