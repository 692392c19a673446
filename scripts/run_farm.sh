#!/usr/bin/env bash
# Multi-worker episode farming on one or many hosts (benchmarks/farm.py;
# reference analog: per-GPU shell launches, scripts/run_objnav_hm3d.sh).
# Each worker runs its strided share of the episode sequence into its own
# CSV shard (crash-resume per shard), then the shards are merged.
#
#   NUM_WORKERS=4 scripts/run_farm.sh objnav --env habitat --episodes 1000
#
# Workers run as local background processes here; on a multi-host fleet
# run one invocation per host with WORKER_OFFSET set instead.
set -u
TASK="${1:?usage: run_farm.sh <task> [driver args...]}"
shift
NUM_WORKERS="${NUM_WORKERS:-2}"
OUT_CSV="${OUT_CSV:-${TASK}_results.csv}"

pids=()
for w in $(seq 0 $((NUM_WORKERS - 1))); do
    python -m "benchmarks.$TASK" "$@" \
        --num-workers "$NUM_WORKERS" --worker-id "$w" \
        --csv "${OUT_CSV%.csv}.worker${w}.csv" &
    pids+=($!)
done
rc=0
for pid in "${pids[@]}"; do
    wait "$pid" || rc=1
done
[ "$rc" -eq 0 ] || { echo "[run_farm] a worker failed"; exit 1; }
python -m benchmarks.farm merge --out "$OUT_CSV" \
    "${OUT_CSV%.csv}".worker*.csv
