#!/bin/bash
# Round-4 inference A/B follow-ups before flipping defaults:
#   - does MIN_STEPS=4 (config-2 +34% win) regress configs 3/4?
#   - is the s2d f0 stem also a loss at b4 (it is at b8: 193.7 vs 198.1)?
set -u
cd /root/repo
out=${1:-/tmp/round4_sweep2.jsonl}
: > "$out"
run() {
  echo "### $*" >> "$out"
  timeout 1800 "$@" >> "$out" 2>/tmp/sweep2_last.err || \
    echo "{\"error\": \"rc=$? $*\"}" >> "$out"
}
run env DEEPFAKE_TPU_NHC_MIN_STEPS=4 python bench.py --baseline_config 4
run env DEEPFAKE_TPU_NHC_MIN_STEPS=4 python bench.py --baseline_config 3
run env DEEPFAKE_TPU_NO_S2D_F0=1 python bench.py --e2e_clips 0 --batch 4
run env DEEPFAKE_TPU_NO_S2D_F0=1 python bench.py --baseline_config 3
run env DEEPFAKE_TPU_NO_S2D_F0=1 DEEPFAKE_TPU_NHC_MIN_STEPS=4 \
    python bench.py --e2e_clips 0 --batch 8
echo DONE >> "$out"
