"""Streaming inference / Kaggle submission controller.

Counterpart of the reference's SubmitCtl (reference: src/submit.py:23-120):
iterates the test loader with a jitted forward, appends
"{filename},{score}" lines to prediction.csv after every batch (crash-
resumable — the dataset skips already-scored files on restart,
data/data_process.py:42-50), and finally writes prediction_full.csv with a
header (fixing the reference's NameError at test.py:61, where `result` is
undefined).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from deepfake_tpu.config import Config
from deepfake_tpu.utils.logging import Logger


class SubmitCtl:
    """`mesh` (default: all visible devices, pure DP) shards every scoring
    batch over the 'data' axis with replicated params — all chips work during
    submission, like the reference's 4-GPU DataParallel submit (reference:
    src/submit.py:43-44, test_model.sh:2). Output order is preserved: batch
    sharding splits the leading axis in order and device_get gathers it back."""

    def __init__(
        self,
        model,
        cfg: Config,
        data,
        logger: Optional[Logger] = None,
        variables: Optional[dict] = None,
        prediction_csv: str = "prediction.csv",
        mesh=None,
    ):
        from deepfake_tpu.parallel.mesh import make_mesh, replicate

        self.model = model
        self.cfg = cfg
        self.data = data
        self.logger = logger or Logger(cfg.log.log_dir)
        self.prediction_csv = prediction_csv
        self.mesh = mesh if mesh is not None else make_mesh()
        self._repl = replicate(self.mesh)

        def _put_vars(v):
            # precompute_bias_cache jits a fresh batch-1 forward per call, so
            # every checkpoint load pays one retrace; submission loads one
            # checkpoint per run, so per-(model,geometry) caching isn't worth
            # the plumbing (ADVICE r4 low, accepted).
            from deepfake_tpu.models.registry import (
                cast_inference_params, example_inputs, precompute_bias_cache,
            )

            v = cast_inference_params(v, cfg)
            v = precompute_bias_cache(
                model, v, *example_inputs(cfg, batch=1), cfg=cfg)
            # int8_static act scales are DATA-derived, not param-derived:
            # entries created before this weight load (e.g. at init) would be
            # calibrated against the wrong activations, so drop them — the
            # quantized convs fall back to dynamic scales until calibrate()
            # is called on representative batches (same staleness class as
            # the ADVICE-r4 bias-cache fix, but data- instead of param-).
            v = {k: x for k, x in v.items() if k != "quant_cache"}
            return jax.device_put(v, self._repl)

        self._put_vars = _put_vars
        if variables is None:
            from deepfake_tpu.models.registry import example_inputs

            init_fn = jax.jit(partial(model.init, deterministic=True))
            variables = init_fn(
                {"params": jax.random.PRNGKey(cfg.random_seed),
                 "dropout": jax.random.PRNGKey(1)},
                *example_inputs(cfg, batch=1),
            )
        self.variables = self._put_vars(variables)

        def fwd(v, x):
            out = self.model.apply(v, x, deterministic=True)
            # VideoClassifier returns (probability, per-frame features)
            # (reference: video_swin_transformer.py:789-793); submission
            # consumes the probability
            return out[0] if isinstance(out, tuple) else out

        self._fwd = jax.jit(fwd)

    def _put(self, inputs):
        from deepfake_tpu.parallel.mesh import shard_batch

        return shard_batch(inputs, self.mesh)

    def load_reference_pth(self, path: str):
        from deepfake_tpu.io.checkpoint import load_params_from_torch

        params, batch_stats = load_params_from_torch(path, self.cfg)
        v = dict(self.variables)
        v["params"] = params
        if batch_stats is not None:
            v["batch_stats"] = batch_stats
        self.variables = self._put_vars(v)
        self.logger(f"Load Finetuned Model From:{path}")

    def calibrate(self, batches):
        """Calibrate int8_static activation scales on representative input
        batches (iterable of input tuples, or bare arrays). No-op unless the
        model has quantized convs in static mode."""
        from deepfake_tpu.models.registry import calibrate_act_scales

        batches = [(b,) if not isinstance(b, (tuple, list)) else tuple(b)
                   for b in batches]
        v = calibrate_act_scales(self.model, dict(self.variables), batches,
                                 cfg=self.cfg)
        self.variables = jax.device_put(v, self._repl)

    def load_checkpoint(self, path: str):
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(os.path.abspath(path))
        v = dict(self.variables)
        v["params"] = restored["params"]
        if restored.get("batch_stats"):
            v["batch_stats"] = restored["batch_stats"]
        self.variables = self._put_vars(v)
        self.logger(f"Load Finetuned Model From:{path}")

    def submit(self) -> Dict[str, float]:
        """Score the test set, streaming results to prediction.csv
        (reference: src/submit.py:79-120)."""
        from deepfake_tpu.data.pipeline import DevicePrefetcher, FeatureAssembler

        cfg = self.cfg
        logger = self.logger
        result: Dict[str, float] = {}
        loader = self.data.test_dataloader()
        assembler = FeatureAssembler(cfg, train=False)
        total = len(loader)
        with open(self.prediction_csv, "a") as f:
            for it, ((inputs, _labels), names) in enumerate(
                DevicePrefetcher(loader, lambda fe, la: assembler(fe, la), cfg.data.prefetch_depth)
            ):
                from deepfake_tpu.parallel.mesh import pad_batch_to_multiple

                # ragged last batch: pad to a data-axis multiple and trim
                # the scores, keeping every batch sharded (no replication)
                inputs, _ = pad_batch_to_multiple(
                    inputs, np.zeros(len(names), np.float32),
                    self.mesh.shape["data"],
                )
                out = self._fwd(self.variables, self._put(inputs))
                probs = np.atleast_1d(np.asarray(jax.device_get(out), np.float32))
                probs = probs[: len(names)]
                for name, p in zip(names, probs):
                    f.write(f"{name},{p}\n")
                    result[name] = float(p)
                f.flush()
                if it % cfg.log.log_step == 0:
                    logger(
                        "|step {:4d} |total {:4d}| Rate% {:.3f}".format(
                            it, total, it / max(total, 1) * 100
                        )
                    )
        logger("Test Score Prediction Done")
        return result

    def score_long_video(
        self, path: str, agg: str = "mean", batch_windows: int = 8
    ) -> float:
        """Long-video path (BASELINE config #4): decode every frame, cut
        fixed-shape sliding windows (cfg.data.chunk_frames/chunk_stride),
        score windows in fixed-size batches, aggregate to one clip score.
        Static shapes throughout — window batches pad by repeating the last
        window, so XLA compiles exactly one program."""
        from deepfake_tpu.data.video_decode import sequential_frames

        frames = sequential_frames(path, self.cfg.data.frame_size)
        return self.score_frames(frames, agg, batch_windows)

    def score_frames(
        self, frames, agg: str = "mean", batch_windows: int = 8
    ) -> float:
        """Score an already-decoded [N, S, S, 3] uint8 frame stream (decode
        and compute split so submit_chunked can overlap them)."""
        from deepfake_tpu.data.chunking import aggregate_window_scores, chunk_frames
        from deepfake_tpu.ops.image import preprocess_clip_batch

        cfg = self.cfg
        windows = chunk_frames(frames, cfg.data.chunk_frames, cfg.data.chunk_stride)
        if windows.shape[0] == 0:
            return float("nan")
        scores = []
        n = windows.shape[0]
        for s in range(0, n, batch_windows):
            batch = windows[s:s + batch_windows]
            if batch.shape[0] < batch_windows:  # pad to the static batch size
                pad = np.repeat(batch[-1:], batch_windows - batch.shape[0], axis=0)
                valid = batch.shape[0]
                batch = np.concatenate([batch, pad], axis=0)
            else:
                valid = batch.shape[0]
            if self.cfg.data.modality == "video_swin":
                from deepfake_tpu.models.swin3d import maybe_window_feed

                # same host-side feed decision as the eval loader/bench
                # (models/swin3d.maybe_window_feed): pre-windowed tokens
                # when profitable, else the channel-folded uint8 (free
                # reshape; no lane-padded [..,3] tensor on device)
                wf = maybe_window_feed(
                    batch, cfg.model.swin3d_patch, cfg.model.swin3d_window,
                    embed_dim=cfg.model.swin3d_embed_dim,
                    use_pallas=cfg.model.swin3d_pallas_attn)
                if wf is not None:
                    batch = wf
                else:
                    bb, tt, hh, ww, cc = batch.shape
                    batch = batch.reshape(bb, tt, hh, ww * cc)
            x = preprocess_clip_batch(
                jax.random.PRNGKey(0), jnp.asarray(batch), train=False
            )
            out = np.atleast_1d(
                np.asarray(
                    jax.device_get(self._fwd(self.variables, self._put(x))),
                    np.float32,
                )
            )
            scores.extend(out[:valid].tolist())
        return aggregate_window_scores(scores, agg)

    def submit_chunked(
        self, agg: str = "mean", decode_ahead: int = 2
    ) -> Dict[str, float]:
        """Chunked submission over the test set (long-video mode). Decode
        overlaps compute: while clip N's windows score on device, a
        background pool (decode_ahead workers; cv2/libav release the GIL)
        stream-decodes clips N+1..N+decode_ahead — the long-video analogue
        of the standard path's ring-buffer prefetch (reference capability:
        data/cuda_dataloader.py:5-74)."""
        from concurrent.futures import ThreadPoolExecutor

        from deepfake_tpu.data.video_decode import sequential_frames

        result: Dict[str, float] = {}
        ds = self.data.testset
        names = list(ds.names)
        size = self.cfg.data.frame_size
        decode_ahead = max(1, decode_ahead)

        def decode(name):
            return sequential_frames(os.path.join(ds.dataset_path, name), size)

        with ThreadPoolExecutor(decode_ahead) as pool, \
                open(self.prediction_csv, "a") as f:
            futs = {
                i: pool.submit(decode, names[i])
                for i in range(min(decode_ahead, len(names)))
            }
            for it, name in enumerate(names):
                frames = futs.pop(it).result()
                nxt = it + decode_ahead
                if nxt < len(names):  # keep the pool fed before scoring
                    futs[nxt] = pool.submit(decode, names[nxt])
                score = self.score_frames(frames, agg)
                f.write(f"{name},{score}\n")
                f.flush()
                result[name] = score
                if it % self.cfg.log.log_step == 0:
                    self.logger(f"|clip {it:4d}| {name} -> {score:.5f}")
        self.logger("Test Score Prediction Done (chunked)")
        return result

    def write_full(self, result: Dict[str, float], path: str = "prediction_full.csv"):
        """prediction_full.csv with header (the reference intends this at
        test.py:58-61 but crashes on an undefined variable)."""
        with open(path, "w") as f:
            f.write("video_name,y_pred\n")
            for k, v in result.items():
                f.write(f"{k},{v}\n")
        self.logger(f"wrote {path} ({len(result)} rows)")
