"""Shape-aware roofline for config 2 (Video Swin-T, 16 frames, batch 1).

VERDICT r3 next #6 asks for "config 2 >= 270 clips/s or a written roofline
argument with a trace". This script supplies the analytic half: it
enumerates every GEMM in the b1 forward (qkv/proj/mlp/patch-merge denses +
window-attention score/value contractions) straight from the topology
(reference: /root/reference/src/models/video_swin_transformer.py:773-780,
Swin-T depths (2,2,6,2), heads (3,6,12,24), window (8,7,7), patch (2,4,4)),
and prices each one two ways on a v5e chip:

* MXU time with tile padding: a 128x128 systolic array contracts K in
  chunks of 128 and emits N in chunks of 128; M streams in sublane groups
  of 8. flops_padded = 2 * ceil8(M) * ceil128(K) * ceil128(N), at 197
  TF/s bf16 peak.
* HBM time: bf16 operand + output bytes at 819 GB/s (counts every GEMM's
  in/out as if nothing fused — generous to the "it's bandwidth" theory).

Speed-of-light per op = max(mxu, hbm); the sum is the no-overhead floor
for the GEMM work alone.  Everything the model does besides GEMMs
(layernorms, softmax, gathers/shifts, bias adds, patchify) plus per-op
fixed costs must fit in measured_time - SOL; the companion trace
(scripts/trace_config2.py) attributes that remainder by op category.

Pure-Python arithmetic: runs anywhere, no jax needed.

Usage: python scripts/roofline_config2.py [--frames 16] [--ms-per-clip 5.55]
"""

from __future__ import annotations

import argparse
import json
import math

PEAK_TFLOPS = 197e12  # v5e bf16
PEAK_HBM = 819e9      # v5e bytes/s


def ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class Sheet:
    def __init__(self):
        self.rows = []

    def gemm(self, tag: str, m: int, k: int, n: int, count: int = 1,
             acc_bytes: int = 2):
        """One M x K @ K x N GEMM repeated `count` times (batched dims go
        into count so tile padding is charged per instance)."""
        flops = 2.0 * m * k * n * count
        flops_pad = 2.0 * ceil_to(m, 8) * ceil_to(k, 128) * ceil_to(n, 128) * count
        t_mxu = flops_pad / PEAK_TFLOPS
        byts = (m * k + k * n + m * n * (acc_bytes / 2)) * 2.0 * count
        t_hbm = byts / PEAK_HBM
        self.rows.append(dict(tag=tag, m=m, k=k, n=n, count=count,
                              gflops=flops / 1e9, gflops_pad=flops_pad / 1e9,
                              t_mxu_us=t_mxu * 1e6, t_hbm_us=t_hbm * 1e6,
                              t_sol_us=max(t_mxu, t_hbm) * 1e6))


def build(frames: int) -> Sheet:
    s = Sheet()
    depths = (2, 2, 6, 2)
    heads = (3, 6, 12, 24)
    embed = 96
    wt, wh, ww = 8, 7, 7
    tp, hp, wp = 2, 4, 4
    t0, s0 = frames // tp, 224 // hp  # 8, 56

    # patch embed: conv (2,4,4) stride-same == GEMM [T'*H'*W', tp*hp*wp*3] @ [.., C]
    s.gemm("patch_embed", t0 * s0 * s0, tp * hp * wp * 3, embed)

    for i, (d, h) in enumerate(zip(depths, heads)):
        c = embed * (2 ** i)
        hw = s0 // (2 ** i)
        t = t0
        lt = t * hw * hw
        wt_eff = min(wt, t)
        wh_eff = min(wh, hw)
        nw = (t // wt_eff) * math.ceil(hw / wh_eff) ** 2
        wl = wt_eff * wh_eff * wh_eff  # tokens per window (392 everywhere here)
        ch = c // h
        st = f"stage{i}"
        for _ in range(d):
            s.gemm(f"{st}.qkv", lt, c, 3 * c)
            # attention: per (window, head) score LxCh @ ChxL and value LxL @ LxCh
            s.gemm(f"{st}.attn_score", wl, ch, wl, count=nw * h)
            s.gemm(f"{st}.attn_value", wl, wl, ch, count=nw * h)
            s.gemm(f"{st}.proj", lt, c, c)
            s.gemm(f"{st}.mlp_up", lt, c, 4 * c)
            s.gemm(f"{st}.mlp_down", lt, 4 * c, c)
        if i < 3:
            s.gemm(f"{st}.merge", lt // 4, 4 * c, 2 * c)
    # classifier head: mean-pool + dense [1, 768] @ [768, num_classes]
    s.gemm("head", 1, embed * 8, 1)
    return s


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--ms-per-clip", type=float, default=None,
                   help="measured ms/clip to compare against")
    args = p.parse_args()

    s = build(args.frames)
    by_tag = {}
    for r in s.rows:
        a = by_tag.setdefault(r["tag"], dict(gflops=0.0, gflops_pad=0.0,
                                             t_mxu_us=0.0, t_hbm_us=0.0,
                                             t_sol_us=0.0, shapes=r))
        for k in ("gflops", "gflops_pad", "t_mxu_us", "t_hbm_us", "t_sol_us"):
            a[k] += r[k]

    tot = {k: sum(r[k] for r in s.rows)
           for k in ("gflops", "gflops_pad", "t_mxu_us", "t_hbm_us", "t_sol_us")}
    print(f"{'tag':18s} {'MxKxN xcount':>26s} {'GF':>7s} {'GFpad':>7s}"
          f" {'mxu_us':>8s} {'hbm_us':>8s} {'SOL_us':>8s}")
    for tag, a in sorted(by_tag.items(), key=lambda kv: -kv[1]["t_sol_us"]):
        sh = a["shapes"]
        shp = f"{sh['m']}x{sh['k']}x{sh['n']} x{sh['count']}"
        print(f"{tag:18s} {shp:>26s} {a['gflops']:7.2f} {a['gflops_pad']:7.2f}"
              f" {a['t_mxu_us']:8.1f} {a['t_hbm_us']:8.1f} {a['t_sol_us']:8.1f}")
    print(f"{'TOTAL':18s} {'':>26s} {tot['gflops']:7.2f} {tot['gflops_pad']:7.2f}"
          f" {tot['t_mxu_us']:8.1f} {tot['t_hbm_us']:8.1f} {tot['t_sol_us']:8.1f}")

    out = dict(frames=args.frames, total=tot)
    if args.ms_per_clip:
        sol_ms = tot["t_sol_us"] / 1e3
        out["measured_ms"] = args.ms_per_clip
        out["sol_ms"] = sol_ms
        out["gap_x"] = args.ms_per_clip / sol_ms
        print(f"\nmeasured {args.ms_per_clip:.2f} ms/clip vs GEMM speed-of-light"
              f" {sol_ms:.2f} ms  ->  {out['gap_x']:.2f}x of SOL")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
