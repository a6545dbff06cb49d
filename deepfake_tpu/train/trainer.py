"""Training / evaluation orchestration.

TPU-native counterpart of the reference Trainer (reference:
src/trainer.py:46-323). The epoch loop, gradient accumulation, cosine
schedule, per-step logging, loss curves, and periodic checkpointing all map
1:1; the execution model changes completely:

* the whole optimizer step — gradient accumulation over micro-batches
  (lax.scan), SGD+momentum update, metrics — is ONE jitted XLA program
  (the reference pays Python + DataParallel scatter/gather per micro-batch,
  src/trainer.py:244-299);
* multi-device execution is jax.sharding DP over the mesh (XLA all-reduces
  gradients over ICI) instead of torch.nn.DataParallel (src/trainer.py:74-75);
* the loss is the same BCE objective computed from logits (stable) — the
  reference trains BCELoss on sigmoid outputs (src/trainer.py:88).
"""

from __future__ import annotations

import inspect
import os
import time
from functools import partial
from typing import Any, Dict, Iterable, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import struct

from deepfake_tpu.config import Config
from deepfake_tpu.parallel.mesh import (
    batch_sharding, make_mesh, param_shardings, shard_like_params,
)
from deepfake_tpu.train.losses import bce_with_logits
from deepfake_tpu.train.schedule import make_optimizer
from deepfake_tpu.utils.logging import (
    AverageMeter, Drawer, DutyCycle, Logger, StepTimer,
)
from deepfake_tpu.utils.metrics import roc_auc


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def _model_kwargs(model, train: bool) -> Dict[str, Any]:
    sig = inspect.signature(model.__call__)
    kw: Dict[str, Any] = {}
    if "deterministic" in sig.parameters:
        kw["deterministic"] = not train
    if "train" in sig.parameters:
        kw["train"] = train
    if "return_logits" in sig.parameters:
        kw["return_logits"] = True
    return kw


def _first(out):
    return out[0] if isinstance(out, tuple) else out


class Trainer:
    """Drives training for any modality. `data` must expose train_loader() /
    val_loader() iterables of (inputs, labels) numpy batches, where inputs is
    the model's input (array or tuple of arrays)."""

    def __init__(
        self,
        model,
        cfg: Config,
        data,
        logger: Optional[Logger] = None,
        mesh=None,
        init_rng: Optional[jax.Array] = None,
    ):
        self.model = model
        self.cfg = cfg
        self.data = data
        self.logger = logger or Logger(cfg.log.log_dir)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.accum = max(1, cfg.optim.accum_step)
        self.modality = cfg.data.modality
        rng = init_rng if init_rng is not None else jax.random.PRNGKey(cfg.random_seed)
        self.rng, init_key, drop_key = jax.random.split(rng, 3)

        # --- init variables -------------------------------------------------
        from deepfake_tpu.models.registry import example_inputs

        example = example_inputs(cfg, batch=1)
        # init under jit: one compiled program instead of per-op dispatch
        # (essential when the device sits behind a high-latency tunnel)
        init_fn = jax.jit(
            partial(model.init, **_model_kwargs(model, train=False))
        )
        variables = init_fn({"params": init_key, "dropout": drop_key}, *example)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})

        n_params = sum(x.size for x in jax.tree_util.tree_leaves(self.params))
        self.logger(f"model parameters: {n_params / 1e6:.2f}M")

        # --- optimizer ------------------------------------------------------
        # One loader yield = ONE optimizer step (the loader yields
        # batch_size*accum rows; the accumulation scan splits them into accum
        # micro-batches of batch_size, matching the reference where the
        # DataLoader batch is the micro-batch and the optimizer steps every
        # accum_step iterations, src/trainer.py:286-297). The cosine horizon
        # is therefore epochs * steps_per_epoch with NO extra /accum — the
        # /accum in the reference (src/trainer.py:85) converts *loader
        # iterations* to optimizer steps, a conversion our loader already did.
        try:
            steps_per_epoch = len(data.train_loader())
        except TypeError:
            steps_per_epoch = None
        if steps_per_epoch is None:
            steps_per_epoch = 1000
            self.logger(
                "[WARN] train loader has no len(); cosine schedule horizon "
                "assumes 1000 optimizer steps/epoch (set cfg.optim.epochs or "
                "use a sized loader for a correct T_max)"
            )
        t_max = max(1, cfg.optim.epochs * steps_per_epoch)
        self.t_max = t_max
        self.tx = make_optimizer(
            cfg.optim.learning_rate, t_max, cfg.optim.momentum,
            cfg.optim.weight_decay, cfg.optim.grad_clip, cfg.optim.schedule,
        )
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=self.params,
            batch_stats=self.batch_stats,
            opt_state=self.tx.init(self.params),
        )
        self.start_epoch = 0

        # --- shardings -------------------------------------------------------
        self.param_sharding = param_shardings(self.state.params, self.mesh)
        self.repl = jax.sharding.NamedSharding(self.mesh, jax.sharding.PartitionSpec())
        self.data_sharding = batch_sharding(self.mesh)
        repl_put = lambda x: jax.device_put(x, self.repl)
        self.state = TrainState(
            step=repl_put(self.state.step),
            params=jax.tree.map(
                jax.device_put, self.state.params,
                jax.tree.map(lambda s: s, self.param_sharding),
            ),
            batch_stats=jax.tree.map(repl_put, self.state.batch_stats),
            # momentum traces shard exactly like their parameters (scalar
            # schedule counts replicate) so TP never reshards the optimizer
            opt_state=jax.tree.map(
                jax.device_put, self.state.opt_state,
                shard_like_params(self.state.opt_state, self.state.params, self.mesh),
            ),
        )
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)

    # -------------------------------------------------------------------- jit
    def _forward(self, params, batch_stats, inputs, train: bool, rng):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        kwargs = _model_kwargs(self.model, train)
        use_align = (
            train
            and self.cfg.optim.use_align_loss
            and self.modality == "fused"
        )
        if use_align:
            kwargs["with_align_loss"] = True
        mutable = ["batch_stats"] if (train and batch_stats) else False
        rngs = {"dropout": rng} if train else None
        # models take ONE input argument; for the fused model it is itself a
        # tuple of (video, audio, paudio) — matching the reference's
        # FusionModel.forward(feature: tuple) (ModalFusion.py:30)
        out = self.model.apply(variables, inputs, mutable=mutable, rngs=rngs, **kwargs)
        if mutable:
            out, updated = out
            new_stats = updated["batch_stats"]
        else:
            new_stats = batch_stats
        align_loss = None
        if use_align:
            out, align_loss = out
        return _first(out), new_stats, align_loss

    def _train_step_impl(self, state: TrainState, inputs, labels, rng):
        """One optimizer step = `accum` micro-batches scanned on device
        (reference does this in Python: src/trainer.py:280-297)."""
        accum = self.accum

        def micro(carry, xs):
            grads_acc, stats, key = carry
            mb_inputs, mb_labels = xs
            key, sub = jax.random.split(key)

            def loss_fn(p):
                logits, new_stats, align = self._forward(p, stats, mb_inputs, True, sub)
                loss = bce_with_logits(logits, mb_labels)
                if align is not None:
                    # loss = loss_class + align_loss_rate * loss_align
                    # (reference's disabled path: src/trainer.py:134)
                    loss = loss + self.cfg.optim.align_loss_rate * align
                probs = jax.nn.sigmoid(logits)
                acc = jnp.mean(
                    ((probs >= 0.5) == (mb_labels >= 0.5)).astype(jnp.float32)
                )
                return loss, (new_stats, acc)

            (loss, (new_stats, acc)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            return (grads_acc, new_stats, key), (loss, acc)

        zero_grads = jax.tree.map(jnp.zeros_like, state.params)
        split = lambda x: x.reshape((accum, x.shape[0] // accum) + x.shape[1:])
        xs = (jax.tree.map(split, inputs), split(labels))
        (grads, new_stats, _), (losses, accs) = jax.lax.scan(
            micro, (zero_grads, state.batch_stats, rng), xs
        )
        grads = jax.tree.map(lambda g: g / accum, grads)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": jnp.mean(losses), "acc": jnp.mean(accs)}
        return (
            TrainState(
                step=state.step + 1, params=new_params,
                batch_stats=new_stats, opt_state=new_opt,
            ),
            metrics,
        )

    def chained_train_steps(self, n: int):
        """n back-to-back optimizer steps as ONE jitted program (carry =
        TrainState; fori_loop, so the step body compiles once whatever n is).

        Two uses. (1) Timing methodology validation: one dispatch + one
        scalar fetch is bench.py::timed_throughput's inference methodology;
        the round-5 A/B measured it IDENTICAL to a Python loop of jitted
        steps on the fused model (159.3 vs 159.9 ms/step through the axon
        tunnel) — JAX's async dispatch stream already pipelines per-step
        host cost, so the loop-timed training numbers are trustworthy (and
        the 128.7 ms device-trace total for that step under-counts
        device-side gaps, not the other way around). (2) Production hosts
        can cut dispatch load by running several steps per call on a
        device-resident batch window. The per-step dropout key is split
        from the carried key, so masks differ per step (the reference
        advances torch's global RNG stream the same way,
        src/trainer.py:280-297)."""

        def chain(state, inputs, labels, key):
            def body(_, carry):
                state, key, _ = carry
                key, sub = jax.random.split(key)
                state, metrics = self._train_step_impl(
                    state, inputs, labels, sub)
                return state, key, metrics["loss"].astype(jnp.float32)

            state, _, loss = jax.lax.fori_loop(
                0, n, body, (state, key, jnp.zeros((), jnp.float32)))
            return state, loss

        return jax.jit(chain, donate_argnums=(0,))

    def _eval_step_impl(self, params, batch_stats, inputs, labels):
        logits, _, _ = self._forward(params, batch_stats, inputs, False, None)
        probs = jax.nn.sigmoid(logits)
        # per-sample outputs so a padded ragged last batch can be trimmed on
        # the host without biasing the epoch metrics
        lab = labels.astype(logits.dtype)
        loss_vec = (
            jnp.clip(logits, 0) - logits * lab
            + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )
        correct = ((probs >= 0.5) == (labels >= 0.5)).astype(jnp.float32)
        return {"loss_vec": loss_vec, "correct": correct, "probs": probs}

    # ------------------------------------------------------------------- host
    def _put_batch(self, inputs, labels):
        n_data = self.mesh.shape["data"]

        def put(x):
            if isinstance(x, (tuple, list)):  # fused inputs / (wave, len) pairs
                return tuple(put(e) for e in x)
            x = jnp.asarray(x)
            # batches not divisible by the data axis replicate (correct, slower)
            if x.shape[0] % n_data == 0:
                return jax.device_put(x, self.data_sharding)
            if not getattr(self, "_warned_ragged", False):
                self._warned_ragged = True
                self.logger(
                    f"[WARN] batch of {x.shape[0]} not divisible by data axis "
                    f"{n_data}: replicating — every device computes the FULL "
                    "batch (an N-way compute cliff; pad or drop the remainder)"
                )
            return jax.device_put(x, self.repl)

        return put(inputs), put(labels)

    def current_lr(self, step: int) -> float:
        from deepfake_tpu.train.schedule import cosine_annealing

        return float(
            cosine_annealing(self.cfg.optim.learning_rate, self.t_max)(step)
        )

    def train(self):
        cfg = self.cfg
        logger = self.logger
        timer = StepTimer(logger, cfg.log.log_step)
        duty = DutyCycle(logger, cfg.log.log_step)
        loss_stat = AverageMeter()
        train_draw = Drawer(self.modality, "train", cfg.log.curve_dir)
        val_draw = Drawer(self.modality, "val", cfg.log.curve_dir)
        logger(f"[INFO] Start training, lr = {cfg.optim.learning_rate:.6f}")
        if cfg.log.profile_dir:
            jax.profiler.start_trace(cfg.log.profile_dir)
        from deepfake_tpu.utils.profiling import HbmTracker
        from deepfake_tpu.utils.watchdog import StepWatchdog

        hbm = HbmTracker(every=cfg.log.hbm_track_step)
        watchdog = StepWatchdog(cfg.log.step_deadline_s, on_stall=logger)
        t = int(self.state.step)
        for epoch in range(self.start_epoch, cfg.optim.epochs + 1):
            timer.mark("dataload")
            for it, (inputs, labels) in enumerate(self.data.train_loader()):
                duty.add("input_wait", timer.report("dataload"))
                inputs, labels = self._put_batch(inputs, labels)
                self.rng, step_rng = jax.random.split(self.rng)
                timer.mark("step")
                with watchdog.watch(f"train_step {t}"), \
                        jax.profiler.StepTraceAnnotation("train", step_num=t):
                    self.state, metrics = self._train_step(
                        self.state, inputs, labels, step_rng
                    )
                hbm.step()
                hbm.track()
                t += 1
                if t % cfg.log.log_step == 0:
                    m = jax.device_get(metrics)
                    loss_stat.update(m["loss"])
                    train_draw.update(m["loss"])
                    logger(
                        "| epoch {:2d} | step {:4d} | lr {:.4E} | Train Loss Avg {:3.5f} "
                        "| Train Acc {:1.5f}".format(
                            epoch, t, self.current_lr(t), loss_stat.avg, m["acc"]
                        )
                    )
                    timer.report("step")
                # "step" = the whole iteration remainder after input wait,
                # INCLUDING the metric fetch above — dispatch alone returns
                # in ~ms while the device runs (async), so the queue-full
                # blocking and the periodic device_get are where device time
                # actually surfaces on the host; over a log window the
                # aggregate shares are faithful, per-step numbers are not.
                # Checkpoint save / curve drawing is host I/O and gets its
                # own 'ckpt' bucket so save epochs don't inflate 'step'.
                duty.add("step", timer.elapsed("step"))
                if (t + 1) % cfg.log.model_save == 0:
                    timer.mark("ckpt")
                    self.save_ckpt(epoch)
                    train_draw.draw(epoch)
                    val_draw.draw(epoch)
                    duty.add("ckpt", timer.elapsed("ckpt"))
                duty.step()
                timer.mark("dataload")
            val = self.eval(self.data.val_loader(), epoch, t, val_draw)
            logger(f"Phase:train, Avg Loss:{loss_stat.avg}")
            logger(
                f"Phase:val, Avg Loss:{val['loss']}, Acc:{val['acc']}, AUC:{val['auc']}"
            )
            loss_stat.reset()
            train_draw.reset()
            val_draw.reset()
        watchdog.close()
        if cfg.log.profile_dir:
            jax.profiler.stop_trace()

    def eval(self, loader: Iterable, epoch: int = 0, t: int = 0, draw=None) -> Dict:
        from deepfake_tpu.parallel.mesh import pad_batch_to_multiple

        loss_stat, acc_stat = AverageMeter(), AverageMeter()
        all_probs, all_labels = [], []
        n_data = self.mesh.shape["data"]
        for inputs, labels in loader:
            n = np.asarray(labels).shape[0]
            # ragged last batch: pad to a data-axis multiple (repeat last
            # row) and trim the per-sample outputs — no replication cliff
            inputs, labels_p = pad_batch_to_multiple(inputs, labels, n_data)
            inputs, labels_d = self._put_batch(inputs, labels_p)
            out = jax.device_get(
                self._eval_step(
                    self.state.params, self.state.batch_stats, inputs, labels_d
                )
            )
            loss = float(np.mean(out["loss_vec"][:n]))
            loss_stat.update(loss, n)
            acc_stat.update(float(np.mean(out["correct"][:n])), n)
            all_probs.append(out["probs"][:n])
            all_labels.append(np.asarray(labels))
            if draw is not None:
                draw.update(loss)
        probs = np.concatenate(all_probs) if all_probs else np.zeros(0)
        labels = np.concatenate(all_labels) if all_labels else np.zeros(0)
        auc = float(roc_auc(jnp.asarray(probs), jnp.asarray(labels))) if len(probs) else float("nan")
        return {"loss": loss_stat.avg, "acc": acc_stat.avg, "auc": auc}

    # ----------------------------------------------------------- checkpoints
    def save_ckpt(self, epoch: int) -> str:
        from deepfake_tpu.io.checkpoint import save_checkpoint

        path = os.path.join(
            self.cfg.log.ckpt_dir,
            f"deepfake_modality{self.modality}_batch{self.cfg.optim.batch_size}"
            f"_epoch{epoch}_step{int(self.state.step)}",
        )
        save_checkpoint(path, self.state, epoch)
        self.logger(f"checkpoint saved: {path}")
        return path

    def load_ckpt(self, path: str):
        from deepfake_tpu.io.checkpoint import restore_checkpoint

        self.state, epoch = restore_checkpoint(path, self.state)
        self.start_epoch = epoch
        self.logger(f"Load Finetuned Model From:{path}")

    def load_reference_pth(self, path: str):
        """Resume from a reference-format .pth (weights only, like the
        reference's strict=False load: src/trainer.py:90-122)."""
        from deepfake_tpu.io.checkpoint import load_params_from_torch

        params, batch_stats = load_params_from_torch(path, self.cfg)
        self.state = self.state.replace(
            params=params, batch_stats=batch_stats or self.state.batch_stats
        )
        self.logger(f"Load Finetuned Model From:{path} (torch import)")

    def load_pretrained_backbones(self):
        """External pretrained backbone loads at train start, strict=False
        style: --audio_pretrained_dir grafts a SwinV2 .pth into the audio
        branch (reference: train.py:37 load_pretrained, src/utils.py:294-380);
        --video_pretrained_dir grafts a Kinetics-400 Video Swin .pth — or an
        image-Swin .pth via 2D->3D inflation — into the Video Swin backbone
        (reference: video_swin_transformer.py:566-632,760-771)."""
        import numpy as np

        from deepfake_tpu.io.torch_import import (
            graft_pretrained, import_swin2d, import_swin3d,
            inflate_swin2d_to_3d, load_torch_state_dict,
        )

        cfg = self.cfg
        m = cfg.data.modality
        params = jax.device_get(self.state.params)
        changed = 0
        if cfg.model.audio_pretrained_dir and m in ("audio", "fused"):
            sd = load_torch_state_dict(cfg.model.audio_pretrained_dir)
            imported = import_swin2d(sd, depths=tuple(cfg.model.swin2d_depths))
            target = params["audio_extractor"] if m == "fused" else params
            merged, n, _ = graft_pretrained(target, imported, self.logger)
            if m == "fused":
                params = {**params, "audio_extractor": merged}
            else:
                params = merged
            changed += n
        if cfg.model.video_pretrained_dir and m == "video_swin":
            sd = load_torch_state_dict(cfg.model.video_pretrained_dir)
            pe = next(
                (v for k, v in sd.items()
                 if k.endswith("patch_embed.proj.weight")), None,
            )
            if pe is not None and np.asarray(pe).ndim == 4:
                sd = inflate_swin2d_to_3d(
                    sd, depths=tuple(cfg.model.swin3d_depths),
                    patch_depth=cfg.model.swin3d_patch[0],
                    window=tuple(cfg.model.swin3d_window),
                )
            imported = import_swin3d(sd, tuple(cfg.model.swin3d_depths))
            merged, n, _ = graft_pretrained(
                params["videoSwinT"], imported, self.logger
            )
            params = {**params, "videoSwinT": merged}
            changed += n
        if changed:
            # grafted leaves are host numpy float32: cast back to each
            # parameter's configured dtype and re-apply the NamedSharding
            # placement so the next _train_step neither reshards nor loses
            # the donation of its first argument
            params = jax.tree.map(
                lambda new, old: jnp.asarray(new, old.dtype),
                params, self.state.params,
            )
            params = jax.tree.map(jax.device_put, params, self.param_sharding)
            self.state = self.state.replace(params=params)
            self.logger(f"[load_pretrained] {changed} tensors grafted into init")
