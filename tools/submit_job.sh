#!/usr/bin/env bash
# Submit an index build (or any search_engine_ray CLI command) to a Ray
# cluster as a Ray Job — the multi-node deployment path (VERDICT item 9).
#
# Usage (args pass through to `python -m search_engine_ray.cli`):
#   tools/submit_job.sh build --source <pages.parquet> --index <index_dir>
#   tools/submit_job.sh query --index <index_dir> "german income" -k 10
#
# Environment:
#   RAY_JOB_ADDRESS  Ray dashboard/job-server address of the head node
#                    (default http://127.0.0.1:8265)
#
# Notes for real clusters:
# - <source> and <index_dir> must be on storage every node can reach
#   (S3/NFS/HDFS); the build's default filesystem exchange assumes a shared
#   filesystem — pass `--exchange groupby` to shuffle through each node's
#   object store instead (see build_index docstring).
# - The working dir ships this repo to the workers; the job driver inherits
#   RAY_ADDRESS from the job runtime, and the CLI honors it (cli.py
#   _ensure_ray), so no code change is needed between laptop and cluster.
#
# Smoke-test locally (started head + job server required):
#   ray start --head --port=6379
#   tools/submit_job.sh build --source /root/testdata/sf0.001/documents.parquet \
#       --index /tmp/job_idx
#   ray stop
set -euo pipefail

ADDRESS="${RAY_JOB_ADDRESS:-http://127.0.0.1:8265}"
REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"

exec ray job submit \
    --address "$ADDRESS" \
    --working-dir "$REPO_DIR" \
    -- python -m search_engine_ray.cli "$@"
