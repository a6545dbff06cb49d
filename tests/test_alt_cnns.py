"""Golden tests: alternative CNNs (iResNet, Res34) vs the reference
(src/models/IResNet.py:20-245, src/models/resnet34.py)."""

from types import SimpleNamespace

import numpy as np
import pytest

import jax.numpy as jnp

from deepfake_tpu.io.torch_import import import_iresnet, import_res34
from deepfake_tpu.models.iresnet import IResNet, Res34
from tests import ref_loader

torch = pytest.importorskip("torch")


def _randomize_bn(ref):
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.5, 1.5)


def test_iresnet_bottleneck_parity():
    iresnet = ref_loader.load("src.models.IResNet")
    torch.manual_seed(0)
    ref = iresnet.iResNet(iresnet.Bottleneck, [2, 2, 2, 2], dropout_prob0=0.0).eval()
    _randomize_bn(ref)
    variables = import_iresnet(ref.state_dict(), layers=(2, 2, 2, 2), block="bottleneck")
    ours = IResNet(block="bottleneck", layers=(2, 2, 2, 2))

    x = np.random.default_rng(0).standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(ours.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-2)


def test_iresnet_basic_parity():
    iresnet = ref_loader.load("src.models.IResNet")
    torch.manual_seed(1)
    ref = iresnet.iResNet(iresnet.BasicBlock, [2, 2, 3, 2], dropout_prob0=0.0).eval()
    _randomize_bn(ref)
    variables = import_iresnet(ref.state_dict(), layers=(2, 2, 3, 2), block="basic")
    ours = IResNet(block="basic", layers=(2, 2, 3, 2))

    x = np.random.default_rng(1).standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(ours.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-2)


def test_res34_parity():
    res34 = ref_loader.load("src.models.resnet34")
    torch.manual_seed(2)
    args = SimpleNamespace()
    ref = res34.Res34(args, 3, 1024).eval()
    _randomize_bn(ref)
    variables = import_res34(ref.state_dict())
    ours = Res34(out_channels=1024)

    x = np.random.default_rng(2).standard_normal((1, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(ours.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-2)
