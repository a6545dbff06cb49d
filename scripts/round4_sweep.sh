#!/bin/bash
# Round-4 measurement sweep on the real chip (run when the tunnel is healthy).
# Sequential — the tunnel serves ONE client; parallel clients wedge it.
set -u
cd /root/repo
out=${1:-/tmp/round4_sweep.jsonl}
: > "$out"
run() {
  echo "### $*" >> "$out"
  timeout 2700 "$@" >> "$out" 2>/tmp/sweep_last.err || echo "{\"error\": \"rc=$? $*\"}" >> "$out"
}
# headline A/B: s2d stem on (default) vs off, b8 and b4
run python bench.py --e2e_clips 0 --batch 8
run env DEEPFAKE_TPU_NO_S2D_F0=1 python bench.py --e2e_clips 0 --batch 8
run python bench.py --e2e_clips 0 --batch 4
# config sweep (measured baselines)
run python bench.py --baseline_config 1
run python bench.py --baseline_config 2
run python bench.py --baseline_config 3
run python bench.py --baseline_config 4
# config-2 b1 kernel-gate A/Bs: route few-window sites through the Wt-grouped
# QKV kernel (default gate keeps them on einsum)
run env DEEPFAKE_TPU_NHC_MIN_STEPS=64 python bench.py --baseline_config 2
run env DEEPFAKE_TPU_NHC_MIN_STEPS=16 python bench.py --baseline_config 2
run env DEEPFAKE_TPU_NHC_MIN_STEPS=4 python bench.py --baseline_config 2
echo DONE >> "$out"
