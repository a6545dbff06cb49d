"""Serving: a compiled-inference handle around any modality.

Build once (weights from an orbax checkpoint, a reference .pth, or fresh
init), then score batches or video files. Complements the batch submission
controller (train/submit.py) with a library-facing API for deployments:

    pred = Predictor.from_checkpoint(cfg, "ckpts/fused_epoch3")
    probs = pred.predict(batch_inputs)          # device arrays/numpy, jitted
    score = pred.score_file("/data/clip.mp4")   # full host pipeline
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from deepfake_tpu.config import Config


class Predictor:
    """`mesh` (default: all visible devices, pure DP) shards every predict
    batch over the 'data' axis with replicated params — the TPU analogue of
    the reference's 4-GPU DataParallel inference (reference:
    src/submit.py:43-44); pass a 1-device mesh to pin to one chip."""

    def __init__(self, cfg: Config, variables: Optional[dict] = None, mesh=None):
        from deepfake_tpu.models.registry import (
            build_model, cast_inference_params, example_inputs,
        )
        from deepfake_tpu.parallel.mesh import make_mesh, replicate

        self.cfg = cfg
        self.model = build_model(cfg)
        self.mesh = mesh if mesh is not None else make_mesh()
        self._repl = replicate(self.mesh)
        if variables is None:
            init_fn = jax.jit(partial(self.model.init, deterministic=True))
            variables = init_fn(
                {"params": jax.random.PRNGKey(cfg.random_seed),
                 "dropout": jax.random.PRNGKey(1)},
                *example_inputs(cfg, batch=1),
            )
        variables = cast_inference_params(variables, cfg)
        from deepfake_tpu.models.registry import precompute_bias_cache

        variables = precompute_bias_cache(
            self.model, variables, *example_inputs(cfg, batch=1), cfg=cfg)
        self.variables = jax.device_put(variables, self._repl)
        self._fwd = jax.jit(
            lambda v, x: self.model.apply(v, x, deterministic=True)
        )
        from deepfake_tpu.data.pipeline import FeatureAssembler

        self._assemble = FeatureAssembler(cfg, train=False)

    def _put(self, inputs):
        from deepfake_tpu.parallel.mesh import shard_batch

        return shard_batch(inputs, self.mesh)

    # ------------------------------------------------------------ factories
    @classmethod
    def from_checkpoint(cls, cfg: Config, path: str, mesh=None) -> "Predictor":
        import os

        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(os.path.abspath(path))
        variables = {"params": restored["params"]}
        if restored.get("batch_stats"):
            variables["batch_stats"] = restored["batch_stats"]
        return cls(cfg, variables, mesh=mesh)

    @classmethod
    def from_reference_pth(cls, cfg: Config, path: str, mesh=None) -> "Predictor":
        from deepfake_tpu.io.checkpoint import load_params_from_torch

        params, batch_stats = load_params_from_torch(path, cfg)
        variables: Dict[str, Any] = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        return cls(cfg, variables, mesh=mesh)

    # ------------------------------------------------------------- inference
    def predict(self, inputs) -> np.ndarray:
        """Model-ready inputs (array or tuple for fused) -> sigmoid scores.
        The batch shards over the mesh's data axis; the gathered output
        preserves input order."""
        out = self._fwd(self.variables, self._put(inputs))
        return np.atleast_1d(np.asarray(jax.device_get(out), np.float32))

    def predict_raw(self, feats: Dict[str, np.ndarray]) -> np.ndarray:
        """Raw host feature dict (dataset format: uint8 frames / padded PCM
        + lengths) -> scores; feature assembly runs on device."""
        inputs, _ = self._assemble(feats, np.zeros(1, np.float32))
        return self.predict(inputs)

    def score_file(self, path: str) -> float:
        """One video file end to end (decode -> features -> score)."""
        from deepfake_tpu.data.dataset import DeepFakeDataset

        ds = DeepFakeDataset.__new__(DeepFakeDataset)
        ds.cfg = self.cfg
        ds.split = "test"
        ds.dataset_path = ""
        ds.labels = {}
        ds.names = [path]
        feats, _label, _name = ds[0]
        batched = {k: np.asarray(v)[None] for k, v in feats.items()}
        return float(self.predict_raw(batched)[0])
