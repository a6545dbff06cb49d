#!/bin/bash
# Round-5 TRAINING sweep (VERDICT r4 next #3/#4): promote-the-winner repro,
# the b32-accum1 reference-global-batch candidate, and fwd/bwd split +
# backward op traces for fused and video_swin. Run solo on a healthy tunnel.
set -u
cd /root/repo
out=${1:-docs/sweeps/round5_train.jsonl}
: > "$out"
run() {
  echo "### $*" >> "$out"
  timeout 3000 "$@" >> "$out" 2>/tmp/r5_train_last.err || \
    echo "{\"error\": \"rc=$? $*\"}" >> "$out"
}
# config-of-record repro + batch-shape candidates
run python scripts/profile_train.py --modality fused --batch 8 --accum 1
run python scripts/profile_train.py --modality fused --batch 32 --accum 1 --iters 6
run python scripts/profile_train.py --modality fused --batch 16 --accum 1 --iters 8
run python scripts/profile_train.py --modality fused --batch 8 --accum 4 --iters 6
# fwd/bwd/optimizer split (the 3-point gap to 40% must be located first)
run python scripts/profile_train_split.py --modality fused --batch 8 --accum 1
run python scripts/profile_train_split.py --modality video_swin --batch 8 --accum 1
# backward op tables
run python scripts/trace_train.py --modality fused --batch 8 --accum 1 --iters 3
run python scripts/trace_train.py --modality video_swin --batch 8 --accum 1 --iters 3
echo DONE >> "$out"
