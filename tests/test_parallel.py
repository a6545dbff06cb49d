"""Mesh + sharding tests on the 8-virtual-CPU-device mesh."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from deepfake_tpu.parallel.mesh import batch_sharding, make_mesh, param_shardings


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh = make_mesh(model=2)
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2


def test_batch_shards_over_data_axis():
    mesh = make_mesh()
    x = jax.device_put(jnp.zeros((16, 4)), batch_sharding(mesh))
    assert len(x.addressable_shards) == 8
    assert x.addressable_shards[0].data.shape == (2, 4)


def test_param_sharding_rules():
    mesh = make_mesh(model=2)
    params = {
        "block": {
            "mlp": {
                "fc1": {"kernel": jnp.zeros((64, 256)), "bias": jnp.zeros((256,))},
                "fc2": {"kernel": jnp.zeros((256, 64)), "bias": jnp.zeros((64,))},
            },
            "norm": {"scale": jnp.ones((64,)), "bias": jnp.zeros((64,))},
        }
    }
    sh = param_shardings(params, mesh)
    assert sh["block"]["mlp"]["fc1"]["kernel"].spec == P(None, "model")  # column
    assert sh["block"]["mlp"]["fc2"]["kernel"].spec == P("model", None)  # row
    assert sh["block"]["mlp"]["fc1"]["bias"].spec == P()
    assert sh["block"]["norm"]["scale"].spec == P()

    # pure-DP mesh: everything replicated
    sh_dp = param_shardings(params, make_mesh())
    assert sh_dp["block"]["mlp"]["fc1"]["kernel"].spec == P()


def test_tp_matmul_matches_replicated():
    """Column+row sharded MLP over the model axis == replicated compute."""
    mesh = make_mesh(model=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 64)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((64, 256)), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((256, 64)), jnp.float32)

    def f(x, w1, w2):
        return jax.nn.relu(x @ w1) @ w2

    want = f(x, w1, w2)
    xs = jax.device_put(x, jax.sharding.NamedSharding(mesh, P()))
    w1s = jax.device_put(w1, jax.sharding.NamedSharding(mesh, P(None, "model")))
    w2s = jax.device_put(w2, jax.sharding.NamedSharding(mesh, P("model", None)))
    got = jax.jit(f)(xs, w1s, w2s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
