#!/bin/bash
# Round-5 MXU-bf16 kernel A/Bs: the round-5 train trace showed the f32-upcast
# Pallas kernels running at 12-24% MFU while surrounding dense dots hit
# 78-90%; kernels now default to native-dtype (bf16) MXU inputs with f32
# accumulation (the einsum path's semantics). Controls restore the f32 upcast.
# Also the VERDICT-r4 #7 fused-headline bias-cache A/B row. Run solo.
set -u
cd /root/repo
out=docs/sweeps/round5_train.jsonl
run() {
  echo "### $*" >> "$out"
  timeout 3000 env "$@" >> "$out" 2>/tmp/r5_bf16_last.err || \
    echo "{\"error\": \"rc=$? $*\"}" >> "$out"
}
# video_swin training: new default (bf16 kernels) vs f32-upcast control
run python scripts/profile_train.py --modality video_swin --batch 8 --accum 1
run DEEPFAKE_TPU_TRAIN_MXU_BF16=0 python scripts/profile_train.py --modality video_swin --batch 8 --accum 1
# inference configs 2/4: new default vs f32-upcast control
run python bench.py --baseline_config 2
run DEEPFAKE_TPU_QKV_MXU_BF16=0 DEEPFAKE_TPU_NHC_MXU_BF16=0 python bench.py --baseline_config 2
run python bench.py --baseline_config 4
run DEEPFAKE_TPU_QKV_MXU_BF16=0 DEEPFAKE_TPU_NHC_MXU_BF16=0 python bench.py --baseline_config 4
# fused headline: re-measure + the missing bias-cache A/B row (VERDICT r4 #7)
run python bench.py
run python bench.py --no_bias_cache
echo BF16_AB_DONE >> "$out"
