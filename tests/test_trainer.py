"""Trainer subsystem tests: optimizer parity with torch SGD, cosine schedule
parity with torch CosineAnnealingLR, BCE loss parity with torch BCELoss, and
an end-to-end jitted train loop (loss decreases, batch_stats update, eval+AUC,
checkpoint round-trip)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepfake_tpu.config import Config
from deepfake_tpu.train.losses import bce_on_probs, bce_with_logits
from deepfake_tpu.train.schedule import cosine_annealing, make_optimizer

torch = pytest.importorskip("torch")


def test_cosine_schedule_matches_torch():
    lr0, t_max = 1e-2, 40
    m = torch.nn.Linear(2, 2)
    opt = torch.optim.SGD(m.parameters(), lr=lr0)
    sch = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=t_max)
    ours = cosine_annealing(lr0, t_max)
    for t in range(t_max):
        assert abs(float(ours(t)) - sch.get_last_lr()[0]) < 1e-8
        opt.step()
        sch.step()


def test_cosine_horizon_covers_all_optimizer_steps():
    """Regression (round-1 advisor high): with accum_step>1 the cosine horizon
    must equal the TOTAL number of optimizer steps — one loader yield is one
    optimizer step, so no /accum — and the LR must still be alive at the last
    training step instead of annealing to 0 after 1/accum of training."""
    from deepfake_tpu.models.swin2d import SwinTransformerV2
    from deepfake_tpu.train.trainer import Trainer
    from deepfake_tpu.utils.logging import Logger

    cfg = _small_cfg()
    cfg.optim.accum_step = 4
    cfg.optim.epochs = 3
    model = SwinTransformerV2(
        img_size=56, num_classes=1, embed_dim=16, depths=(2,), num_heads=(2,),
        window_size=7, drop_path_rate=0.0,
    )
    data = SyntheticAudioData()
    trainer = Trainer(model, cfg, data, logger=Logger(None))
    total_steps = cfg.optim.epochs * len(data.train_loader())
    assert trainer.t_max == total_steps
    assert trainer.current_lr(total_steps - 1) > 0.01 * cfg.optim.learning_rate


def test_train_loader_yields_one_optimizer_step(tmp_path):
    """The datamodule's train loader yields batch_size*accum rows — one
    optimizer step per yield (reference effective batch, src/trainer.py:286-297)."""
    from deepfake_tpu.config import Config
    from deepfake_tpu.data.dataset import DeepFakeDataModule, DeepFakeDataset

    cfg = Config()
    cfg.optim.batch_size = 2
    cfg.optim.accum_step = 3
    dm = DeepFakeDataModule(cfg)

    class FakeSet:
        def __len__(self):
            return 20

    dm.trainset = FakeSet()
    loader = dm.train_dataloader()
    assert loader.batch == 6
    assert len(loader) == 3  # drop_last: 20 // 6


def test_sgd_momentum_weight_decay_matches_torch():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((4, 3)).astype(np.float32)
    tw = torch.nn.Parameter(torch.from_numpy(w.copy()))
    opt = torch.optim.SGD([tw], lr=0.1, momentum=0.9, weight_decay=0.05)

    tx = make_optimizer(0.1, t_max=10 ** 9, momentum=0.9, weight_decay=0.05,
                        schedule="constant")
    params = {"w": jnp.asarray(w)}
    opt_state = tx.init(params)
    jw = params
    for i in range(3):
        g = rng.standard_normal((4, 3)).astype(np.float32)
        opt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        opt.step()
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state, jw)
        jw = jax.tree.map(lambda p, u: p + u, jw, updates)
        np.testing.assert_allclose(np.asarray(jw["w"]), tw.detach().numpy(), atol=1e-5)


def test_bce_losses_match_torch():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal(32).astype(np.float32)
    labels = (rng.random(32) > 0.5).astype(np.float32)
    probs = 1 / (1 + np.exp(-logits))
    want = torch.nn.BCELoss()(torch.from_numpy(probs), torch.from_numpy(labels)).item()
    got_probs = float(bce_on_probs(jnp.asarray(probs), jnp.asarray(labels)))
    got_logits = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(got_probs - want) < 1e-6
    assert abs(got_logits - want) < 1e-6


class SyntheticAudioData:
    """Tiny separable dataset: label = 1 if the image mean is positive."""

    def __init__(self, n=32, batch=8, size=56):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((n, size, size, 3)).astype(np.float32)
        y = (rng.random(n) > 0.5).astype(np.float32)
        x += (y * 2 - 1)[:, None, None, None] * 0.8
        self.x, self.y, self.batch = x, y, batch

    def _loader(self):
        for i in range(0, len(self.x), self.batch):
            yield self.x[i:i + self.batch], self.y[i:i + self.batch]

    def train_loader(self):
        return list(self._loader())

    def val_loader(self):
        return list(self._loader())


def _small_cfg(**over):
    cfg = Config()
    cfg.data.modality = "audio"
    cfg.data.frame_size = 56
    cfg.data.audio_size = 56
    cfg.optim.batch_size = 8
    cfg.optim.accum_step = 2
    cfg.optim.epochs = 1
    cfg.optim.learning_rate = 1e-2
    cfg.log.log_step = 1
    cfg.log.model_save = 10 ** 9
    for k, v in over.items():
        _o, _, attr = k.partition(".")
        setattr(getattr(cfg, _o), attr, v)
    return cfg


def test_train_loop_end_to_end(tmp_path):
    from deepfake_tpu.models.swin2d import SwinTransformerV2
    from deepfake_tpu.train.trainer import Trainer
    from deepfake_tpu.utils.logging import Logger

    cfg = _small_cfg()
    cfg.optim.epochs = 8  # t_max = epochs * steps/epoch = total optimizer steps
    cfg.log.ckpt_dir = str(tmp_path)
    model = SwinTransformerV2(
        img_size=56, num_classes=1, embed_dim=16, depths=(2,), num_heads=(2,),
        window_size=7, drop_path_rate=0.0,
    )
    data = SyntheticAudioData()
    trainer = Trainer(model, cfg, data, logger=Logger(None))

    before = trainer.eval(data.val_loader())
    for _ in range(8):
        for inputs, labels in data.train_loader():
            inputs, labels = trainer._put_batch(inputs, labels)
            trainer.rng, k = jax.random.split(trainer.rng)
            trainer.state, metrics = trainer._train_step(trainer.state, inputs, labels, k)
    after = trainer.eval(data.val_loader())
    assert after["loss"] < before["loss"]
    assert after["auc"] > 0.9  # separable by construction

    # checkpoint round-trip
    path = trainer.save_ckpt(epoch=0)
    step_before = int(trainer.state.step)
    trainer.state = trainer.state.replace(
        params=jax.tree.map(jnp.zeros_like, trainer.state.params)
    )
    trainer.load_ckpt(path)
    assert int(trainer.state.step) == step_before
    restored = trainer.eval(data.val_loader())
    assert abs(restored["loss"] - after["loss"]) < 1e-6


def test_train_step_updates_batch_stats():
    """BatchNorm running stats flow through the scanned micro-batches
    (video modality exercises the batch_stats path)."""
    from deepfake_tpu.models.nextvlad import InceptionVideoClassifier
    from deepfake_tpu.train.trainer import Trainer
    from deepfake_tpu.utils.logging import Logger

    cfg = _small_cfg()
    cfg.data.modality = "video"
    cfg.data.frame_size = 96
    cfg.data.num_frames = 2
    cfg.optim.accum_step = 1

    model = InceptionVideoClassifier(num_classes=1, drop_rate=0.0, classify_drop=0.0)

    class Data:
        def train_loader(self):
            rng = np.random.default_rng(0)
            return [
                (
                    rng.standard_normal((2, 2, 96, 96, 3)).astype(np.float32),
                    np.asarray([0.0, 1.0], np.float32),
                )
            ]

        def val_loader(self):
            return self.train_loader()

    trainer = Trainer(model, cfg, Data(), logger=Logger(None))
    stats0 = jax.device_get(trainer.state.batch_stats)
    inputs, labels = next(iter(Data().train_loader()))
    inputs, labels = trainer._put_batch(inputs, labels)
    trainer.state, _ = trainer._train_step(
        trainer.state, inputs, labels, jax.random.PRNGKey(0)
    )
    stats1 = jax.device_get(trainer.state.batch_stats)
    diffs = jax.tree.map(lambda a, b: float(np.abs(a - b).max()), stats0, stats1)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0


@pytest.mark.slow
def test_chained_train_steps_match_sequential():
    """chained_train_steps(n) — n optimizer steps in ONE jitted fori_loop
    (the tunnel-safe timing path and multi-step dispatch feature) — must
    produce the same final TrainState as n sequential _train_step_impl
    calls with the same key-splitting discipline."""
    from deepfake_tpu.models.nextvlad import InceptionVideoClassifier
    from deepfake_tpu.train.trainer import Trainer
    from deepfake_tpu.utils.logging import Logger

    cfg = _small_cfg()
    cfg.data.modality = "video"
    cfg.data.frame_size = 96
    cfg.data.num_frames = 2
    cfg.optim.accum_step = 1

    model = InceptionVideoClassifier(num_classes=1, drop_rate=0.0, classify_drop=0.0)

    class Data:
        def train_loader(self):
            rng = np.random.default_rng(0)
            return [
                (
                    rng.standard_normal((2, 2, 96, 96, 3)).astype(np.float32),
                    np.asarray([0.0, 1.0], np.float32),
                )
            ]

        def val_loader(self):
            return self.train_loader()

    trainer = Trainer(model, cfg, Data(), logger=Logger(None))
    inputs, labels = next(iter(Data().train_loader()))
    inputs, labels = trainer._put_batch(inputs, labels)

    # sequential reference: same split(key) -> step discipline as the chain
    state = trainer.state
    key = jax.random.PRNGKey(5)
    for _ in range(2):
        key, sub = jax.random.split(key)
        state, metrics = jax.jit(trainer._train_step_impl)(
            state, inputs, labels, sub)
    seq_loss = float(metrics["loss"])

    chained = trainer.chained_train_steps(2)
    # donate_argnums=(0,): hand the chain its own copy of the initial state
    state_c, loss_c = chained(
        jax.tree.map(jnp.copy, trainer.state), inputs, labels,
        jax.random.PRNGKey(5))
    assert abs(float(loss_c) - seq_loss) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(state.params)),
                    jax.tree_util.tree_leaves(jax.device_get(state_c.params))):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
    assert int(state_c.step) == 2


def test_roc_auc_matches_sklearn():
    from sklearn.metrics import roc_auc_score

    from deepfake_tpu.utils.metrics import roc_auc

    rng = np.random.default_rng(0)
    for _ in range(5):
        y = (rng.random(200) > 0.4).astype(np.float32)
        s = np.round(rng.random(200).astype(np.float32) + y * 0.3, 2)  # ties
        want = roc_auc_score(y, s)
        got = float(roc_auc(jnp.asarray(s), jnp.asarray(y)))
        assert abs(got - want) < 1e-6


def test_load_pretrained_backbone_graft(tmp_path):
    """--audio_pretrained_dir grafts an external SwinV2 .pth into the audio
    branch with strict=False semantics (reference: train.py:37 +
    src/utils.py:294-380): matching tensors land in the trainer's params,
    mismatched heads are skipped with a logged warning."""
    from deepfake_tpu.models.swin2d import SwinTransformerV2
    from deepfake_tpu.train.trainer import Trainer
    from deepfake_tpu.utils.logging import Logger
    from tests import ref_loader

    ref_mod = ref_loader.load("src.models.swin_transformer2d")
    torch.manual_seed(3)
    ref = ref_mod.SwinTransformerV2(
        img_size=56, num_classes=7, embed_dim=16, depths=[2], num_heads=[2],
        window_size=7, pretrained_window_sizes=[16], drop_path_rate=0.0,
    ).eval()
    pth = tmp_path / "swin_pre.pth"
    torch.save(ref.state_dict(), str(pth))

    cfg = _small_cfg()
    cfg.model.swin2d_embed_dim = 16
    cfg.model.swin2d_depths = (2,)
    cfg.model.swin2d_heads = (2,)
    cfg.model.swin2d_pretrained_windows = (16,)
    cfg.model.audio_pretrained_dir = str(pth)
    model = SwinTransformerV2(
        img_size=56, num_classes=1, embed_dim=16, depths=(2,), num_heads=(2,),
        window_size=7, pretrained_window_sizes=(16,), drop_path_rate=0.0,
    )
    lines = []

    class L(Logger):
        def __init__(self):
            pass

        def __call__(self, msg):
            lines.append(str(msg))

    trainer = Trainer(model, cfg, SyntheticAudioData(), logger=L())
    before = np.asarray(
        jax.device_get(trainer.state.params["patch_embed"]["proj"]["kernel"])
    )
    trainer.load_pretrained_backbones()
    got = np.asarray(
        jax.device_get(trainer.state.params["patch_embed"]["proj"]["kernel"])
    )
    want = ref.patch_embed.proj.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert not np.allclose(before, got)
    # 7-class head must be skipped (ours is 1-class), and said so
    assert any("skip" in l and "head" in l for l in lines)
    head = np.asarray(
        jax.device_get(trainer.state.params["head"]["fc2"]["kernel"])
    )
    assert head.shape[-1] == 1
