"""Split the training-step cost into forward / backward / optimizer parts.

profile_train.py gives one number for the whole optimizer step; this script
times, with the same tunnel-safe chained-carry methodology (CLAUDE.md):
  fwd   — the training-mode forward + loss alone
  grad  — jax.grad of the same loss (forward + backward)
  step  — the full Trainer._train_step (scan over accum, SGD update)
so (grad - fwd) isolates the backward and (step - accum*grad) the optimizer
update + scan overhead. All functions consume the SAME device-resident batch;
grads are consumed by a full tree-sum so XLA cannot prune any branch of the
backward.

Usage: python scripts/profile_train_split.py [--modality fused] [--batch 4]
       [--accum 2] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--accum", type=int, default=2)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--modality", type=str, default="fused")
    p.add_argument("--remat", type=str, default="off",
                   choices=["off", "full", "dots"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from deepfake_tpu.config import Config
    from deepfake_tpu.models.registry import build_model
    from deepfake_tpu.train.trainer import Trainer, bce_with_logits
    from deepfake_tpu.utils.logging import Logger

    cfg = Config()
    cfg.data.modality = args.modality
    cfg.parallel.compute_dtype = args.dtype
    cfg.optim.batch_size = args.batch
    cfg.optim.accum_step = args.accum
    cfg.parallel.remat = args.remat != "off"
    cfg.parallel.remat_policy = "dots" if args.remat == "dots" else ""

    rows = args.batch * args.accum
    t, s, a = cfg.data.num_frames, cfg.data.frame_size, cfg.data.audio_size
    wave = int(cfg.data.wave_seconds_buckets[0] * cfg.data.wave_sample_rate)
    rng = np.random.default_rng(0)
    if args.modality == "fused":
        inputs_np = (
            rng.standard_normal((rows, t, s, s, 3)).astype(np.float32) * 0.5,
            rng.standard_normal((rows, a, a, 3)).astype(np.float32) * 0.5,
            rng.standard_normal((rows, wave)).astype(np.float32) * 0.5,
        )
    elif args.modality == "video_swin":
        # production feed: channel-folded [B,T,H,W*3] (FeatureAssembler)
        inputs_np = rng.standard_normal((rows, t, s, s * 3)).astype(np.float32) * 0.5
    elif args.modality == "video":
        inputs_np = rng.standard_normal((rows, t, s, s, 3)).astype(np.float32) * 0.5
    elif args.modality == "audio":
        inputs_np = rng.standard_normal((rows, a, a, 3)).astype(np.float32) * 0.5
    else:
        inputs_np = rng.standard_normal((rows, wave)).astype(np.float32) * 0.5
    batch = (inputs_np, (rng.random(rows) > 0.5).astype(np.float32))

    class Data:
        def train_loader(self):
            return [batch]

        def val_loader(self):
            return [batch]

    model = build_model(cfg)
    trainer = Trainer(model, cfg, Data(), logger=Logger(None))
    inputs, labels = trainer._put_batch(*batch)
    # micro-batch slice (what one scan iteration sees)
    mb = jax.tree.map(
        lambda x: x[: args.batch] if hasattr(x, "shape") else x, inputs
    )
    mb_labels = labels[: args.batch]
    key = jax.random.PRNGKey(0)

    def loss_of(params, x):
        logits, _, _ = trainer._forward(
            params, trainer.state.batch_stats, x, True, key
        )
        return bce_with_logits(logits, mb_labels)

    perturb = lambda c, x: jax.tree.map(
        lambda l: l + (c * 1e-30).astype(l.dtype), x
    )

    # params/batch ride as ARGUMENTS (closed-over arrays embed as HLO
    # constants — a 200 MB remote-compile body the tunnel rejects, HTTP 413)
    @jax.jit
    def fwd_step(carry, params, x):
        return carry + loss_of(params, perturb(carry, x))

    @jax.jit
    def grad_step(carry, params, x):
        g = jax.grad(loss_of)(params, perturb(carry, x))
        # consume EVERY leaf so no branch of the backward is pruned
        return carry + sum(
            jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(g)
        )

    def timed(stepfn, iters):
        def run(n):
            c = jnp.float32(0.0)
            t0 = time.perf_counter()
            for _ in range(n):
                c = stepfn(c, trainer.state.params, mb)
            float(c)
            return time.perf_counter() - t0

        run(1)
        lo = min(run(1) for _ in range(2))
        hi = min(run(1 + iters) for _ in range(2))
        return (hi - lo) / iters

    def timed_full(iters):
        def run(n):
            state = trainer.state
            k = jax.random.PRNGKey(1)
            t0 = time.perf_counter()
            for _ in range(n):
                state, metrics = trainer._train_step(state, inputs, labels, k)
            float(jax.device_get(metrics["loss"]))
            trainer.state = state
            return time.perf_counter() - t0

        run(1)
        lo = min(run(1) for _ in range(2))
        hi = min(run(1 + iters) for _ in range(2))
        return (hi - lo) / iters

    fwd_s = timed(fwd_step, args.iters)
    grad_s = timed(grad_step, args.iters)
    step_s = timed_full(args.iters)
    print(json.dumps({
        "modality": args.modality,
        "backend": jax.devices()[0].device_kind.lower(),
        "micro_batch": args.batch,
        "accum": args.accum,
        "fwd_ms": round(fwd_s * 1e3, 2),
        "grad_ms": round(grad_s * 1e3, 2),
        "bwd_ms": round((grad_s - fwd_s) * 1e3, 2),
        "step_ms": round(step_s * 1e3, 2),
        "opt_overhead_ms": round((step_s - args.accum * grad_s) * 1e3, 2),
        "bwd_over_fwd": round(grad_s / fwd_s - 1, 2),
    }))


if __name__ == "__main__":
    main()
