#!/usr/bin/env bash
# Multi-process training launcher (parity: reference tools/dist_train.sh,
# which wraps `torch.distributed.launch --nproc_per_node`).
#
# TPU-native realisation: one jax.distributed process group, coordinator
# on this host. On a TPU pod slice run ONE process per host (jax
# auto-detects pod metadata, so plain `python tools/train.py` suffices
# there); this script is for explicit N-process runs — e.g. multi-host
# CPU/Gloo validation or several single-chip hosts behind one
# coordinator.
#
#   tools/dist_train.sh CONFIG N_PROCS [train.py args...]
set -eu
CONFIG=$1
NPROCS=$2
shift 2
PORT=${PORT:-29500}
COORD=${COORDINATOR:-127.0.0.1}:$PORT

PIDS=()
for ((i = 0; i < NPROCS; i++)); do
  JAX_COORDINATOR_ADDRESS=$COORD \
  JAX_NUM_PROCESSES=$NPROCS \
  JAX_PROCESS_ID=$i \
  python "$(dirname "$0")/train.py" "$CONFIG" "$@" &
  PIDS+=($!)
done
rc=0
for pid in "${PIDS[@]}"; do
  wait "$pid" || rc=$?
done
exit $rc
