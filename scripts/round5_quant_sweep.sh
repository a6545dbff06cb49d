#!/bin/bash
# Round-5 int8-serving A/B bank: run once when the axon tunnel is healthy.
# Appends raw JSON rows to docs/sweeps/round5_quant.jsonl.
set -u
cd "$(dirname "$0")/.."
OUT=docs/sweeps/round5_quant.jsonl
log() { echo "$1" >> "$OUT"; }

run() { # run <label> <cmd...>: append last JSON line with a run tag
  local label="$1"; shift
  echo "=== $label: $*" >&2
  local line
  line=$(timeout 900 "$@" 2>/dev/null | tail -1)
  if [ -n "$line" ]; then
    log "{\"run\": \"$label\", \"row\": $line}"
  else
    log "{\"run\": \"$label\", \"error\": \"no output / timeout\"}"
  fi
}

# 1. MXU dtype microbench (matmul control + IRv2 conv shapes)
run int8_microbench python scripts/bench_int8_mxu.py --iters 60

# 2. fused headline A/B (b8): float vs dynamic int8 vs calibrated static
run headline_b8_float python bench.py --iters 20 --e2e_clips 0
run headline_b8_int8 python bench.py --iters 20 --e2e_clips 0 --set model.irv2_quant=int8
run headline_b8_int8_static python bench.py --iters 20 --e2e_clips 0 --set model.irv2_quant=int8_static

# 3. config 3 (fused b4) with the sweep's own baseline line
run config3_float python bench.py --baseline_config 3 --iters 20
run config3_int8 python bench.py --baseline_config 3 --iters 20 --set model.irv2_quant=int8
run config3_int8_static python bench.py --baseline_config 3 --iters 20 --set model.irv2_quant=int8_static

echo "done; rows in $OUT" >&2
