"""Device mesh + sharding rules.

The TPU-native replacement for the reference's torch.nn.DataParallel
(reference: src/trainer.py:74-75, src/submit.py:43-44): a jax.sharding.Mesh
with ('data', 'model') axes. Batches shard over 'data'; XLA inserts the
gradient all-reduce over ICI (replacing NCCL replicate/scatter/gather). Large
projection kernels optionally shard over 'model' (tensor parallelism) — the
reference has no TP at all (SURVEY.md §2c), so this is additive capability.

These models fit comfortably on one chip, so the canonical mesh is
(n_devices, 1) — pure DP — but the rules generalize; dryrun_multichip
exercises a (dp, tp) mesh on CPU.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1, model: int = 1, devices: Optional[list] = None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding for any pytree leaf."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


_warned_replicate = False


def shard_batch(x: Any, mesh: Mesh):
    """Place one host batch element on the mesh: leading-axis sharding over
    'data' when divisible, full replication otherwise (correct, slower —
    warned once; callers should pad_batch_to_multiple instead). Tuples
    recurse (fused inputs; (wave, lengths) pairs)."""
    import jax.numpy as jnp

    if isinstance(x, (tuple, list)):
        return tuple(shard_batch(e, mesh) for e in x)
    x = jnp.asarray(x)
    n = mesh.shape["data"]
    if x.ndim and x.shape[0] % n:
        global _warned_replicate
        if not _warned_replicate:
            _warned_replicate = True
            import warnings

            warnings.warn(
                f"batch of {x.shape[0]} not divisible by data axis {n}: "
                "replicating — every device computes the FULL batch (an "
                "N-way compute cliff; pad_batch_to_multiple or drop the "
                "remainder)"
            )
        return jax.device_put(x, replicate(mesh))
    return jax.device_put(x, batch_sharding(mesh) if x.ndim else replicate(mesh))


def pad_batch_to_multiple(inputs: Any, labels: Any, n: int):
    """Pad every leading-axis-B leaf of (inputs, labels) up to a multiple of
    the data-axis size by repeating the last row; callers trim per-sample
    outputs back to B. Keeps ragged last eval/submit batches sharded instead
    of replicated."""
    import jax.numpy as jnp

    labels = jnp.asarray(labels)
    b = labels.shape[0]
    pad = (-b) % n
    if pad == 0:
        return inputs, labels

    def p(x):
        if isinstance(x, (tuple, list)):
            return tuple(p(e) for e in x)
        x = jnp.asarray(x)
        if x.ndim == 0 or x.shape[0] != b:
            return x
        return jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)

    return p(inputs), p(labels)


# Parameter names whose kernels column-shard over 'model' (their outputs are
# per-shard independent), and whose consumers row-shard (contracting dim).
# Attention projections (qkv / q,k,v / queries,keys,values) column-shard so
# each model-shard holds whole heads; their output projections row-shard.
_COL_KERNELS = ("fc1", "intermediate_dense", "qkv", "qkv_kernel", "q_proj",
                "k_proj", "v_proj", "queries", "keys", "values")
_ROW_KERNELS = ("fc2", "output_dense", "proj", "out_proj")


def _spec_for(path: Tuple[str, ...], leaf: Any, model_size: int) -> P:
    if model_size <= 1 or leaf.ndim < 2:
        return P()
    name = path[-2] if len(path) >= 2 else ""
    key = path[-1]
    if key not in ("kernel", "qkv_kernel"):
        return P()
    if key == "qkv_kernel":
        name = "qkv_kernel"
    if name in _COL_KERNELS and leaf.shape[-1] % model_size == 0:
        return P(*([None] * (leaf.ndim - 1) + ["model"]))
    if name in _ROW_KERNELS and leaf.shape[-2] % model_size == 0:
        return P(*([None] * (leaf.ndim - 2) + ["model", None]))
    return P()


def _path_names(kp) -> Tuple[str, ...]:
    names = []
    for k in kp:
        if hasattr(k, "key"):
            names.append(str(k.key))
        elif hasattr(k, "name"):
            names.append(str(k.name))
        else:
            names.append(str(k))
    return tuple(names)


def shard_like_params(target: Any, params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for an arbitrary param-derived state tree (e.g.
    optimizer momentum traces): a leaf whose tree path ENDS with some
    parameter's path — and has that parameter's shape — inherits the
    parameter's sharding; everything else (schedule counts, empty states)
    replicates. This keeps SGD momentum sharded exactly like its parameter
    under TP instead of force-replicating the whole optimizer state."""
    pspec = {
        _path_names(kp): (tuple(leaf.shape), _spec_for(_path_names(kp), leaf, mesh.shape["model"]))
        for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    }

    def spec_of(kp, leaf) -> P:
        names = _path_names(kp)
        shape = tuple(leaf.shape) if hasattr(leaf, "shape") else ()
        for i in range(len(names)):
            hit = pspec.get(names[i:])
            if hit is not None and hit[0] == shape:
                return hit[1]
        return P()

    flat, treedef = jax.tree_util.tree_flatten_with_path(target)
    specs = [NamedSharding(mesh, spec_of(kp, leaf)) for kp, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, specs)


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for a param tree: replicate by default; tensor-
    shard the large MLP/attention projections over 'model' when it exists."""
    model_size = mesh.shape["model"]
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = [
        NamedSharding(mesh, _spec_for(_path_names(kp), leaf, model_size))
        for kp, leaf in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, specs)
