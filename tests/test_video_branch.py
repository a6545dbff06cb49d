"""Golden tests: Inception-ResNet-v2 + NeXtVLAD video branch vs the reference
(src/models/InceptionResV2.py, src/models/IResNet.py), weights copied.

Inputs are small (96x96 frames, few frames) to fit the 1-CPU test box; the
architecture path (all blocks/reductions) is identical at any resolution
>= 75 (stem reduces by 8 with VALID convs).
"""

from types import SimpleNamespace

import numpy as np
import pytest

import jax.numpy as jnp

from deepfake_tpu.io.torch_import import (
    import_inception_resnet_v2,
    import_inception_video,
)
from deepfake_tpu.models.inception_resnet_v2 import InceptionResNetV2
from deepfake_tpu.models.nextvlad import InceptionVideoClassifier, NeXtVLAD
from tests import ref_loader

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_modules():
    ir = ref_loader.load("src.models.InceptionResV2")
    iresnet = ref_loader.load("src.models.IResNet")
    return ir, iresnet


def test_inception_resnet_v2_parity(ref_modules):
    ir, _ = ref_modules
    torch.manual_seed(0)
    ref = ir.Inception_ResNetv2(in_channels=3, dropout_rate=0.0).eval()
    # give BN stats non-trivial values so eval-mode normalisation is exercised
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    params, stats = import_inception_resnet_v2(ref.state_dict())
    ours = InceptionResNetV2(drop_rate=0.0)

    x = np.random.default_rng(0).standard_normal((2, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(
        ours.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
        )
    )
    assert got.shape == want.shape == (2, 1536)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-2)


def test_nextvlad_parity(ref_modules):
    _, iresnet = ref_modules
    torch.manual_seed(1)
    M = 8
    ref = iresnet.NeXtVLAD(dim=64, num_clusters=4, lamb=2, groups=4, max_frames=M).eval()
    with torch.no_grad():
        ref.bn0.running_mean.uniform_(-0.1, 0.1)
        ref.bn0.running_var.uniform_(0.5, 1.5)
        ref.bn1.running_mean.uniform_(-0.1, 0.1)
        ref.bn1.running_var.uniform_(0.5, 1.5)

    from deepfake_tpu.io.torch_import import import_nextvlad

    params, stats = import_nextvlad(ref.state_dict())
    ours = NeXtVLAD(dim=64, num_clusters=4, lamb=2, groups=4, max_frames=M)

    x = np.random.default_rng(1).standard_normal((3, M, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(
        ours.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_inception_video_classifier_parity(ref_modules):
    _, iresnet = ref_modules
    torch.manual_seed(2)
    args = SimpleNamespace(bn_momentum=0.1, num_frames=4, classify_drop=0.0)
    ref = iresnet.InceptionVideoClassifier(args, 1, drop_rate=0.0).eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    variables = import_inception_video(ref.state_dict())
    ours = InceptionVideoClassifier(num_classes=1, drop_rate=0.0, classify_drop=0.0)

    x = np.random.default_rng(2).standard_normal((2, 4, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(
        ours.apply(variables, jnp.asarray(x.transpose(0, 1, 3, 4, 2)))
    )
    np.testing.assert_allclose(got, want, atol=2e-3)

    # feature mode (fusion extractor, reference IResNet.py:387-393)
    ref.use_feat = True
    with torch.no_grad():
        want_feat = ref(torch.from_numpy(x)).numpy()
    ours_feat = InceptionVideoClassifier(num_classes=1, drop_rate=0.0, use_feat=True)
    got_feat = np.asarray(
        ours_feat.apply(variables, jnp.asarray(x.transpose(0, 1, 3, 4, 2)))
    )
    np.testing.assert_allclose(got_feat, want_feat, atol=2e-3, rtol=1e-2)


import pytest


@pytest.mark.parametrize("train", [True, False], ids=["train", "infer"])
def test_stem_s2d_matches_stride2(monkeypatch, train):
    """The opt-in space-to-depth f0 (DEEPFAKE_TPU_S2D_TRAIN=1 in train mode,
    DEEPFAKE_TPU_S2D_F0=1 in inference) matches the stride-2 form — outputs
    AND, in train mode, updated running stats (the s2d output is
    mathematically identical, so the batch statistics are too). Param trees
    are identical by construction."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepfake_tpu.models.inception_resnet_v2 import Stem

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    stem = Stem()
    knob = "DEEPFAKE_TPU_S2D_TRAIN" if train else "DEEPFAKE_TPU_S2D_F0"

    def run(s2d):
        if s2d:
            monkeypatch.setenv(knob, "1")
        else:
            monkeypatch.delenv(knob, raising=False)
        variables = stem.init(jax.random.PRNGKey(0), x, True)
        out, mut = stem.apply(variables, x, train, mutable=["batch_stats"])
        return out, mut["batch_stats"]

    out_s2d, bs_s2d = run(True)
    out_ref, bs_ref = run(False)
    np.testing.assert_allclose(np.asarray(out_s2d), np.asarray(out_ref),
                               atol=2e-5, rtol=2e-5)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(bs_s2d),
        jax.tree_util.tree_leaves_with_path(bs_ref),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5,
            err_msg=jax.tree_util.keystr(kp),
        )
