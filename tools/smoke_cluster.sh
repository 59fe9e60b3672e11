#!/usr/bin/env bash
# Smoke-test the non-local-address path: start a standing Ray cluster head,
# connect the CLI to it as an external driver via RAY_ADDRESS (exactly what
# a `ray job submit` driver does), build + query, then tear down.
#
# In this sandbox the Ray Jobs HTTP server itself cannot run (the dashboard
# needs aiohttp, which is not installed), so tools/submit_job.sh can't be
# exercised end-to-end here; this script validates the same contract one
# layer down — the CLI honoring RAY_ADDRESS and running against a cluster
# it did not start.
set -euo pipefail
cd "$(dirname "$0")/.."

IDX="${1:-/tmp/smoke_cluster_idx}"
rm -rf "$IDX"

ray start --head --num-cpus=8 --include-dashboard=false \
    --disable-usage-stats >/dev/null
trap 'ray stop >/dev/null 2>&1 || true' EXIT

export RAY_ADDRESS="auto"
python -m search_engine_ray.cli build \
    --source /root/testdata/sf0.001/documents.parquet \
    --index "$IDX" --buckets 8 --shards 2
python -m search_engine_ray.cli query --index "$IDX" "scan merge window" -k 5
echo "cluster smoke OK"
