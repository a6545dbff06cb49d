"""Multi-host (multi-process) smoke worker (VERDICT r2 next #6).

Launched once per "host" by tests/test_multihost.py: initialises
jax.distributed over a local TCP coordinator, forms a GLOBAL mesh spanning
both processes' virtual CPU devices, and runs ONE fused train step (the tiny
fused model: 3 branches -> fusion head, fwd+bwd+SGD) with the batch sharded
over the global 'data' axis — the gradient all-reduce crosses the process
boundary, which is exactly the DCN hop `train.py --set parallel.multihost=
true` enables on real multi-host TPU (reference capability matched:
torch DataParallel across local GPUs, src/trainer.py:74-75; we exceed it —
the reference never ran multi-node).

Prints one line: MULTIHOST_OK pid=<i> loss=<x> checksum=<y>
The test asserts both processes print the SAME loss and checksum (parameter
agreement after the cross-process gradient psum).
"""

from __future__ import annotations

import argparse
import os
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--process_id", type=int, required=True)
    p.add_argument("--num_processes", type=int, default=2)
    p.add_argument("--port", type=int, required=True)
    p.add_argument("--local_devices", type=int, default=4)
    args = p.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={args.local_devices}"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    # the ambient env pins JAX_PLATFORMS to the axon TPU tunnel and overrides
    # env-var changes; the config update must land before jax initialises
    jax.config.update("jax_platforms", "cpu")
    # same-host CPU cache (separate from the TPU cache: CPU AOT entries are
    # host-feature-specific) — the two workers compile the identical program,
    # and reruns of the smoke test skip the multi-minute XLA:CPU compile
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert len(jax.devices()) == args.num_processes * args.local_devices, (
        f"global device count {len(jax.devices())} != "
        f"{args.num_processes} x {args.local_devices}"
    )

    import numpy as np

    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as graft
    from deepfake_tpu.models.registry import build_model
    from deepfake_tpu.parallel.mesh import make_mesh
    from deepfake_tpu.train.losses import bce_with_logits

    cfg = graft._fused_cfg(tiny=True)
    cfg.data.num_frames = 1
    cfg.data.frame_size = 96
    mesh = make_mesh(devices=jax.devices())  # (data=8, model=1), 2 processes

    model = build_model(cfg)
    b = mesh.shape["data"]
    t, s, a = cfg.data.num_frames, cfg.data.frame_size, cfg.data.audio_size
    wave = int(cfg.data.wave_seconds_buckets[0] * cfg.data.wave_sample_rate)
    rng = np.random.default_rng(0)  # same seed in every process
    inputs_np = (
        rng.standard_normal((b, t, s, s, 3)).astype(np.float32),
        rng.standard_normal((b, a, a, 3)).astype(np.float32),
        rng.standard_normal((b, wave)).astype(np.float32),
    )
    labels_np = (rng.random(b) > 0.5).astype(np.float32)

    variables = jax.jit(
        lambda k: model.init(
            {"params": k, "dropout": jax.random.PRNGKey(1)},
            tuple(jnp.zeros((1,) + x.shape[1:], x.dtype) for x in inputs_np),
            deterministic=True,
        )
    )(jax.random.PRNGKey(0))
    params = jax.device_get(variables["params"])
    batch_stats = jax.device_get(variables.get("batch_stats", {}))

    def to_global(x, spec):
        x = np.asarray(x)
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    params = jax.tree.map(lambda x: to_global(x, P()), params)
    batch_stats = jax.tree.map(lambda x: to_global(x, P()), batch_stats)
    inputs = tuple(to_global(x, P("data")) for x in inputs_np)
    labels = to_global(labels_np, P("data"))

    tx = optax.sgd(1e-2, momentum=0.9)
    opt_state = jax.tree.map(lambda x: to_global(x, P()), jax.device_get(tx.init(params)))

    @jax.jit
    def train_step(params, batch_stats, opt_state, inputs, labels):
        def loss_fn(p):
            variables = {"params": p}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            out = model.apply(
                variables, inputs, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(2)},
                mutable=["batch_stats"] if batch_stats else False,
            )
            logits = out[0] if batch_stats else out
            logits = logits[0] if isinstance(logits, tuple) else logits
            return bce_with_logits(logits, labels)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        checksum = sum(
            jnp.sum(jnp.abs(x.astype(jnp.float32)))
            for x in jax.tree_util.tree_leaves(new_params)
        )
        return loss, checksum

    # AOT-compile BEFORE the first collective executes, then rendezvous at
    # the coordination-service barrier (TCP to the coordinator, no gloo):
    # on an oversubscribed host the two processes finish the multi-minute
    # XLA:CPU compile at different times, and gloo's pair-connect timeout
    # fires while the late peer is still compiling. The barrier collapses
    # the execution-start skew to milliseconds.
    compiled = train_step.lower(
        params, batch_stats, opt_state, inputs, labels
    ).compile()
    from jax._src import distributed

    distributed.global_state.client.wait_at_barrier(
        "deepfake_tpu_multihost_compiled", 900_000
    )
    loss, checksum = compiled(params, batch_stats, opt_state, inputs, labels)
    loss = float(jax.device_get(loss))
    checksum = float(jax.device_get(checksum))
    assert np.isfinite(loss), loss
    print(f"MULTIHOST_OK pid={args.process_id} loss={loss:.6f} "
          f"checksum={checksum:.4f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
