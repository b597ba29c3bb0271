#!/usr/bin/env bash
# Deployment smoke test: one availableNow tick of the default job
# against the sf0.001 fixtures, then assert the dual sinks and the
# run_history ledger landed.
#
# With docker available:   ./deploy/smoke.sh docker
# Bare (CI / this VM):     ./deploy/smoke.sh
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${SPARK_GRAFT_SMOKE_SF:-/root/testdata/sf0.001}"
OUT="$(mktemp -d /tmp/spark-graft-smoke.XXXXXX)"
trap 'rm -rf "$OUT"' EXIT

if [[ "${1:-}" == "docker" ]]; then
    docker build -t spark-graft .
    docker run --rm -v "$SF":/data:ro -v "$OUT":/output spark-graft --once
else
    DATA_DIR="$SF" OUTPUT_DIR="$OUT" SPARK_WAREHOUSE="$OUT/warehouse" \
        python -m etl_dagster_service_crawler_spark.deploy --once \
        --source "$SF" --output "$OUT"
fi

test -n "$(ls "$OUT"/main/*.parquet 2>/dev/null)" || { echo "FAIL: no main sink"; exit 1; }
test -n "$(ls "$OUT"/side/*.parquet 2>/dev/null)" || { echo "FAIL: no side sink"; exit 1; }
test -d "$OUT/warehouse/run_history" || { echo "FAIL: no run_history table"; exit 1; }
echo "SMOKE OK: main + side sinks written, run_history ledgered"
