#!/bin/bash
# Resume of round4_train_sweep.sh after the 13:39 session cut. Skips the
# completed fused b4 A/Bs (s2d-train neutral at 34.24%, 2D train kernel a
# LOSS at 32.45% — both stay opt-in) and runs the remaining measurements:
# bigger per-step batch, video_swin A/Bs, remat re-tune, config-5 chunked.
set -u
cd /root/repo
out=${1:-/tmp/round4_train_sweep.jsonl}
run() {
  echo "### $*" >> "$out"
  timeout 3000 "$@" >> "$out" 2>/tmp/train_sweep_last.err || \
    echo "{\"error\": \"rc=$? $*\"}" >> "$out"
}
# bigger per-step batch, plain flags (the b4 A/Bs showed s2d/2D-kernel lose)
run python scripts/profile_train.py --modality fused --batch 8 --accum 1
# video_swin training: round-3 repro + backward-tile A/B
run python scripts/profile_train.py --modality video_swin --batch 8 --accum 1
run env DEEPFAKE_TPU_NHC_BWD_WT=2 DEEPFAKE_TPU_VMEM_MB=20 \
    python scripts/profile_train.py --modality video_swin --batch 8 --accum 1
run env DEEPFAKE_TPU_TRAIN_PROFIT_STEPS=16 \
    python scripts/profile_train.py --modality video_swin --batch 8 --accum 1
# remat re-tune (VERDICT r3 weak #3)
run python scripts/profile_train.py --modality video_swin --batch 8 --accum 1 --remat dots
run python scripts/profile_train.py --modality video_swin --batch 16 --accum 1 --remat dots
run python scripts/profile_train.py --modality video_swin --batch 16 --accum 1
# per-stage remat (layers.stage_policy)
run python scripts/profile_train.py --modality video_swin --batch 8 --accum 1 --remat dots,dots,off,off
run python scripts/profile_train.py --modality video_swin --batch 16 --accum 1 --remat dots,dots,off,off
run python scripts/profile_train.py --modality fused --batch 8 --accum 1 --remat dots,dots,off,off
# config 5 (VERDICT r3 next #8): chunked long-video submission
run python scripts/bench_e2e.py --clips 8 --batch 8 --workers 4 --chunked
# config-2 trace (VERDICT r3 next #6): attribute the 4.2 ms non-GEMM budget
run python scripts/trace_config2.py --iters 5 --top 40
echo DONE >> "$out"
