#!/usr/bin/env bash
# Deployment smoke test: one availableNow tick of the default job
# against the sf0.001 fixtures, then assert the dual sinks and the
# run_history ledger landed; then a crawl tick through the REAL HTTP
# transport against the local fixture server, and the --status
# run-control report.
#
# With docker available:   ./deploy/smoke.sh docker
# Bare (CI / this VM):     ./deploy/smoke.sh
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${SPARK_GRAFT_SMOKE_SF:-/root/testdata/sf0.001}"
OUT="$(mktemp -d /tmp/spark-graft-smoke.XXXXXX)"
HTTPD_PID=""
cleanup() {
    [[ -n "$HTTPD_PID" ]] && kill "$HTTPD_PID" 2>/dev/null || true
    rm -rf "$OUT"
}
trap cleanup EXIT

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

if [[ "${1:-}" != "docker" ]]; then
    # crawl tick through the urllib transport against the local
    # fixture endpoint (the second implementation behind the seam)
    python tools/fixture_http_server.py 0 > "$OUT/httpd.log" &
    HTTPD_PID=$!
    for _ in $(seq 50); do
        grep -q "listening on" "$OUT/httpd.log" && break
        sleep 0.1
    done
    BASE="$(sed -n 's/^listening on //p' "$OUT/httpd.log" | head -1)"
    test -n "$BASE" || { echo "FAIL: fixture httpd did not start"; exit 1; }
    CRAWL_OUT="$OUT/crawl"
    DATA_DIR="$SF" SPARK_WAREHOUSE="$OUT/warehouse" \
        python -m etl_dagster_service_crawler_spark.deploy --once \
        --job crawl_scan_2min --transport "$BASE/listing" \
        --side-cols keyword,job_id \
        --source "$SF" --output "$CRAWL_OUT"
    test -n "$(ls "$CRAWL_OUT"/main/*.parquet 2>/dev/null)" \
        || { echo "FAIL: no crawl sink via HTTP transport"; exit 1; }
    echo "SMOKE OK: crawl tick over HTTP transport ($BASE)"

    # run-control report: must show the ledgered runs and the sinks
    STATUS="$(SPARK_WAREHOUSE="$OUT/warehouse" \
        python -m etl_dagster_service_crawler_spark.deploy --status \
        --output "$OUT")"
    echo "$STATUS" | grep -q "run_history: 2 run(s)" \
        || { echo "FAIL: --status missing run counts"; echo "$STATUS"; exit 1; }
    echo "$STATUS" | grep -q "crawl_scan_2min" \
        || { echo "FAIL: --status missing crawl run"; echo "$STATUS"; exit 1; }
    echo "SMOKE OK: --status reports ledger + sinks"
fi
