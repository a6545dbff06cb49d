#!/bin/bash
# Round-5 RNG/dropout A/Bs (VERDICT r4 next #3/#4): isolate the dropout
# mask + threefry cost in the train step, then try the TPU hardware RNG
# (rbg) with semantics preserved. Run solo on a healthy tunnel.
set -u
cd /root/repo
out=docs/sweeps/round5_train.jsonl
run() {
  echo "### $*" >> "$out"
  timeout 3000 "$@" >> "$out" 2>/tmp/r5_rng_last.err || \
    echo "{\"error\": \"rc=$? $*\"}" >> "$out"
}
run python scripts/profile_train.py --modality video_swin --batch 8 --accum 1 --drop0
run python scripts/profile_train.py --modality video_swin --batch 8 --accum 1 --prng rbg
run python scripts/profile_train.py --modality fused --batch 8 --accum 1 --prng rbg
echo RNG_AB_DONE >> "$out"
