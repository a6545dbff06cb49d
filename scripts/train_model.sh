#!/usr/bin/env bash
# Canonical fused-training launch (counterpart of the reference's
# train_model.sh:1-67; CUDA_VISIBLE_DEVICES / PYTORCH_CUDA_ALLOC_CONF are
# replaced by the JAX device mesh — all local TPU chips join the 'data' axis).
set -euo pipefail

DATA_ROOT=${DATA_ROOT:-/data/multi-ffdv}
MODALITY=${MODALITY:-fused}
BATCH_SIZE=${BATCH_SIZE:-8}
ACCUM_STEP=${ACCUM_STEP:-4}
EPOCHS=${EPOCHS:-4}
LR=${LR:-1e-4}
NUM_FRAMES=${NUM_FRAMES:-32}
SEED=${SEED:-42}
LOG_DIR=${LOG_DIR:-./logs/deepfake_${MODALITY}_b${BATCH_SIZE}_lr${LR}.log}

mkdir -p ./logs ./checkpoints

nohup python train.py \
    --preset "${MODALITY}" \
    --data_root "${DATA_ROOT}" \
    --batch_size "${BATCH_SIZE}" \
    --accum_step "${ACCUM_STEP}" \
    --epochs "${EPOCHS}" \
    --learning_rate "${LR}" \
    --num_frames "${NUM_FRAMES}" \
    --random_seed "${SEED}" \
    --log_dir "${LOG_DIR}" \
    "$@" \
    > ./logs/train_stdout.log 2> ./logs/train_stderr.log &
echo "launched: pid $! (log: ${LOG_DIR})"
