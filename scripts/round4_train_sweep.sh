#!/bin/bash
# Round-4 TRAINING measurement sweep (VERDICT r3 next #4: video_swin >= 25%
# MFU, fused >= 40%). Run solo on a healthy tunnel, after round4_sweep.sh.
set -u
cd /root/repo
out=${1:-/tmp/round4_train_sweep.jsonl}
: > "$out"
run() {
  echo "### $*" >> "$out"
  timeout 3000 "$@" >> "$out" 2>/tmp/train_sweep_last.err || \
    echo "{\"error\": \"rc=$? $*\"}" >> "$out"
}
# fused training A/Bs: round-3 repro, then the two round-4 candidates
run python scripts/profile_train.py --modality fused --batch 4 --accum 2
run env DEEPFAKE_TPU_S2D_TRAIN=1 \
    python scripts/profile_train.py --modality fused --batch 4 --accum 2
run env DEEPFAKE_TPU_2D_TRAIN_KERNEL=1 \
    python scripts/profile_train.py --modality fused --batch 4 --accum 2
run env DEEPFAKE_TPU_S2D_TRAIN=1 DEEPFAKE_TPU_2D_TRAIN_KERNEL=1 \
    python scripts/profile_train.py --modality fused --batch 4 --accum 2
# bigger per-step batch (fewer fixed costs, may lift MFU; b8 accum1)
run env DEEPFAKE_TPU_S2D_TRAIN=1 DEEPFAKE_TPU_2D_TRAIN_KERNEL=1 \
    python scripts/profile_train.py --modality fused --batch 8 --accum 1
# video_swin training: round-3 repro + backward-tile A/B
run python scripts/profile_train.py --modality video_swin --batch 8 --accum 1
run env DEEPFAKE_TPU_NHC_BWD_WT=2 DEEPFAKE_TPU_VMEM_MB=20 \
    python scripts/profile_train.py --modality video_swin --batch 8 --accum 1
run env DEEPFAKE_TPU_TRAIN_PROFIT_STEPS=16 \
    python scripts/profile_train.py --modality video_swin --batch 8 --accum 1
# remat re-tune (VERDICT r3 weak #3: 'dots' measured -3% in round 3; check
# whether it buys a bigger per-step batch that nets out faster)
run python scripts/profile_train.py --modality video_swin --batch 8 --accum 1 --remat dots
run python scripts/profile_train.py --modality video_swin --batch 16 --accum 1 --remat dots
run python scripts/profile_train.py --modality video_swin --batch 16 --accum 1
# per-stage remat (layers.stage_policy): checkpoint only the big-activation
# early stages; stages 2-3 run free. Cheaper recompute than uniform 'dots'.
run python scripts/profile_train.py --modality video_swin --batch 8 --accum 1 --remat dots,dots,off,off
run python scripts/profile_train.py --modality video_swin --batch 16 --accum 1 --remat dots,dots,off,off
run python scripts/profile_train.py --modality fused --batch 8 --accum 1 --remat dots,dots,off,off
# config 5 (VERDICT r3 next #8): chunked long-video submission over a
# synthetic test set — full Video Swin-T, sliding windows, decode overlap
run python scripts/bench_e2e.py --clips 8 --batch 8 --workers 4 --chunked
echo DONE >> "$out"
