#!/usr/bin/env bash
# Round-start preflight (~2 min): compile, run every registered query at
# sf0.001, and HASH-COMPARE each against its DuckDB oracle. Catches both
# throwing regressions (the round-12 events.ts encoding shift) and silent
# value-level shifts (e.g. a future micros-as-INT64 generation that decodes
# without error but 1000x wrong).
# Usage: tools/preflight.sh  [sf-dir]  (default /root/testdata/sf0.001)
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.001}"
OUT="$(mktemp -d /tmp/graft_preflight.XXXXXX)"
trap 'rm -rf "$OUT"' EXIT
sbt -batch compile
. tools/java_opts.sh
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" SPARK_GRAFT_VERIFY_STRICT=1 \
  java $GRAFT_JAVA_OPTS -Xmx8g -cp "$GRAFT_CLASSPATH" \
  graft.Verify "$SF" "$OUT" || {
    echo "PREFLIGHT FAILED — errors.json:" >&2
    cat "$OUT/errors.json" >&2
    exit 1
  }
RES="$(python3 tools/check_oracle.py "$OUT" "$SF")"
echo "$RES" | grep -v "^OK " | head -20
echo "$RES" | tail -1 | grep -q " 0 failed" || {
  echo "PREFLIGHT FAILED — oracle mismatches above" >&2
  exit 1
}
N=$(ls -d "$OUT"/*/ | wc -l)
echo "PREFLIGHT OK: $N queries ran clean and hash-match the oracle at $SF"
