"""Per-branch timing of the fused model on hardware: IRv2 trunk, NeXtVLAD
head, SwinV2-B audio branch, wav2vec2 paudio branch, and the full fused
forward, all with the same overhead-cancelled carry-chain methodology as
bench.py. Locates the fused-forward time before optimizing (VERDICT round 1,
next #2).

    python scripts/bench_branches.py [--batch 8] [--iters 20]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys

sys.path.insert(0, ".")

import numpy as np

from scripts.bench_stem import timed_fn


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--dtype", type=str, default="bfloat16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _enable_compile_cache
    from deepfake_tpu.config import Config
    from deepfake_tpu.models.audio2d import Audio2D
    from deepfake_tpu.models.inception_resnet_v2 import InceptionResNetV2
    from deepfake_tpu.models.nextvlad import InceptionVideoClassifier
    from deepfake_tpu.models.registry import build_model, example_inputs
    from deepfake_tpu.models.swin2d import SwinTransformerV2

    _enable_compile_cache()
    d = jnp.dtype(args.dtype)
    B = args.batch
    rng = np.random.default_rng(0)
    key = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}

    def t(name, module, x, batch, **apply_kw):
        v = jax.jit(functools.partial(module.init, **apply_kw))(key, x)
        per = timed_fn(
            lambda v, x: module.apply(v, x, **apply_kw), v, x, args.iters
        )
        print(json.dumps({
            "section": name, "ms_per_batch": round(per * 1e3, 2),
            "clips_per_sec": round(batch / per, 1),
        }), flush=True)
        return per

    cfg = Config()
    cfg.data.modality = "fused"
    cfg.parallel.compute_dtype = args.dtype

    # IRv2 conv trunk alone, 32 frames/clip flattened into the frame batch
    xf = jnp.asarray(rng.standard_normal((B * 32, 224, 224, 3), np.float32) * 0.5)
    t("irv2_trunk_256f", InceptionResNetV2(dtype=d), xf, B)

    # full video branch: IRv2 + NeXtVLAD + gated head
    xv = jnp.asarray(rng.standard_normal((B, 32, 224, 224, 3), np.float32) * 0.5)
    t("video_branch", InceptionVideoClassifier(num_classes=1, use_feat=True,
                                               drop_rate=0.0, classify_drop=0.0,
                                               dtype=d), xv, B)

    # audio branch: SwinV2-B @224
    xa = jnp.asarray(rng.standard_normal((B, 224, 224, 3), np.float32) * 0.5)
    t("swin2d_b224", SwinTransformerV2(
        img_size=224, num_classes=1, embed_dim=128, depths=(2, 2, 18, 2),
        num_heads=(4, 8, 16, 32), window_size=7,
        pretrained_window_sizes=(16, 16, 16, 16), drop_path_rate=0.0,
        use_feat=True, dtype=d), xa, B, deterministic=True)

    # paudio branch: wav2vec2 + head, 4 s bucket
    xw = jnp.asarray(rng.standard_normal((B, 64000), np.float32) * 0.5)
    t("wav2vec2_4s", Audio2D(num_classes=1, use_feat=True, model_drop=0.0,
                             classify_drop=0.0, dtype=d), xw, B,
      deterministic=True)

    # full fused forward (same program bench.py times)
    model = build_model(cfg)
    inputs = jax.tree.map(
        lambda x: jnp.asarray(rng.standard_normal(x.shape).astype(np.float32) * 0.5),
        example_inputs(cfg, batch=B),
    )
    v = jax.jit(functools.partial(model.init, deterministic=True))(key, *inputs)
    per = timed_fn(
        lambda v, x: model.apply(v, x, deterministic=True), v, inputs[0], args.iters
    )
    print(json.dumps({
        "section": "fused_full", "ms_per_batch": round(per * 1e3, 2),
        "clips_per_sec": round(B / per, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
