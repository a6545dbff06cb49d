#!/usr/bin/env bash
# Canonical submission launch (counterpart of the reference's test_model.sh).
set -euo pipefail

DATA_ROOT=${DATA_ROOT:-/data/multi-ffdv}
MODALITY=${MODALITY:-fused}
BATCH_SIZE=${BATCH_SIZE:-8}
NUM_WORKERS=${NUM_WORKERS:-10}
CKPT=${CKPT:-}
LOG_DIR=${LOG_DIR:-./logs/deepfake_test_${MODALITY}.log}

mkdir -p ./logs

EXTRA=()
if [[ -n "${CKPT}" ]]; then
    EXTRA+=(--Resume "--${MODALITY}_ckpt_path" "${CKPT}")
fi

nohup python test.py \
    --preset "${MODALITY}" \
    --data_root "${DATA_ROOT}" \
    --batch_size "${BATCH_SIZE}" \
    --num_workers "${NUM_WORKERS}" \
    --log_dir "${LOG_DIR}" \
    "${EXTRA[@]}" \
    "$@" \
    > ./logs/test_stdout.log 2> ./logs/test_stderr.log &
echo "launched: pid $! (log: ${LOG_DIR})"
