"""Reference-style weight (re)initialisation.

Counterpart of the reference's weights_init (reference: src/trainer.py:30-44),
applied to the audio branch at construction (train.py:36): Xavier-normal conv
kernels with bias 0.3, Kaiming-normal linear kernels with bias 0, BatchNorm
scale 1 / bias 0. Operates on an existing flax param tree so any model can be
re-initialised the reference way regardless of its module-level defaults.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _xavier_normal(rng, shape, dtype):
    # conv kernel [*k, in, out]: receptive field = prod(k)
    rf = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    fan_in = shape[-2] * rf
    fan_out = shape[-1] * rf
    std = float(np.sqrt(2.0 / (fan_in + fan_out)))
    return std * jax.random.normal(rng, shape, dtype)


def _kaiming_normal(rng, shape, dtype):
    # linear kernel [in, out]; torch default: fan_in of the torch [out, in]
    # layout is the input features = shape[0] here, gain sqrt(2)
    fan_in = shape[0]
    std = float(np.sqrt(2.0 / fan_in))
    return std * jax.random.normal(rng, shape, dtype)


def apply_reference_init(params, rng: jax.Array):
    """Re-initialise a param tree with the reference's weights_init rules."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for i, (kp, leaf) in enumerate(flat):
        names = [getattr(k, "key", getattr(k, "name", str(k))) for k in kp]
        key = jax.random.fold_in(rng, i)
        last = str(names[-1])
        parent = str(names[-2]) if len(names) >= 2 else ""
        is_bn = parent.startswith("bn") or parent in ("norm",) and leaf.ndim == 1
        if last in ("kernel", "qkv_kernel"):
            if leaf.ndim >= 4:  # conv
                out.append(_xavier_normal(key, leaf.shape, leaf.dtype))
            elif leaf.ndim >= 2:  # linear
                out.append(_kaiming_normal(key, leaf.shape, leaf.dtype))
            else:
                out.append(leaf)
        elif last == "bias":
            if parent.startswith("bn"):
                out.append(jnp.zeros_like(leaf))
            elif any(("conv" in str(n)) for n in names):
                out.append(jnp.full_like(leaf, 0.3))  # conv bias (trainer.py:37)
            else:
                out.append(jnp.zeros_like(leaf))
        elif last == "scale" and is_bn:
            out.append(jnp.ones_like(leaf))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)
