#!/usr/bin/env bash
# Crash-retry launcher (reference scripts/run_objnav_hm3d.sh pattern):
# re-launch the driver up to MAX_RETRIES times with a backoff; the driver
# resumes from the CSV row count (benchmarks/common.py get_start_episode).
#
#   scripts/run_benchmark.sh objnav --env habitat --episodes 1000
set -u
TASK="${1:?usage: run_benchmark.sh <task> [driver args...]}"
shift
MAX_RETRIES="${MAX_RETRIES:-20}"
BACKOFF_S="${BACKOFF_S:-5}"

for i in $(seq 1 "$MAX_RETRIES"); do
    echo "[run_benchmark] attempt $i/$MAX_RETRIES: benchmarks.$TASK $*"
    python -m "benchmarks.$TASK" "$@" && exit 0
    echo "[run_benchmark] driver crashed; retrying in ${BACKOFF_S}s"
    sleep "$BACKOFF_S"
done
echo "[run_benchmark] giving up after $MAX_RETRIES attempts"
exit 1
