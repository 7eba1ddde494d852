#!/usr/bin/env bash
# SLURM training launcher (parity: reference tools/slurm_train.sh).
#
# One srun task per host; the jax.distributed coordinator is task 0's
# node. SLURM_* vars map onto the JAX_* process-group env consumed by
# aidet_tpu.parallel.dist.init_distributed.
#
#   tools/slurm_train.sh PARTITION JOB_NAME CONFIG [train.py args...]
set -eu
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
shift 3
NTASKS=${NTASKS:-1}
PORT=${PORT:-29500}

srun -p "$PARTITION" --job-name="$JOB_NAME" --ntasks="$NTASKS" \
     --ntasks-per-node=1 --kill-on-bad-exit=1 \
  bash -c '
    head=$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -n1)
    export JAX_COORDINATOR_ADDRESS=$head:'"$PORT"'
    export JAX_NUM_PROCESSES=$SLURM_NTASKS
    export JAX_PROCESS_ID=$SLURM_PROCID
    exec python '"$(dirname "$0")"'/train.py '"$CONFIG"' "$@"
  ' _ "$@"
