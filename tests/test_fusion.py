"""Golden test: full fused model vs the reference FusionModel
(src/models/ModalFusion.py) with all three branch extractors, weights copied.

Uses reduced-size branches (small SwinV2, 96x96 frames, full-size wav2vec2 for
the 768-d interface) — every fusion-head op and both quirks (post-softmax
scaling, BN momentum 0.08) are exercised.
"""

from types import SimpleNamespace

import numpy as np
import pytest

import jax.numpy as jnp

from deepfake_tpu.io.torch_import import import_fusion
from deepfake_tpu.models.audio2d import Audio2D
from deepfake_tpu.models.fusion import FusionModel, infonce_pair_loss
from deepfake_tpu.models.nextvlad import InceptionVideoClassifier
from deepfake_tpu.models.swin2d import SwinTransformerV2
from tests import ref_loader

torch = pytest.importorskip("torch")


@pytest.mark.slow
def test_fusion_parity():
    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2Model as HFModel

    iresnet = ref_loader.load("src.models.IResNet")
    swin2d = ref_loader.load("src.models.swin_transformer2d")
    audio_t = ref_loader.load("src.models.audioTransformer")
    fusion = ref_loader.load("src.models.ModalFusion")

    torch.manual_seed(0)
    args = SimpleNamespace(
        bn_momentum=0.1, num_frames=2, classify_drop=0.0, swin_drop=0.0, soft=0.01
    )
    ref_video = iresnet.InceptionVideoClassifier(args, 1, drop_rate=0.0, use_feat=True)
    ref_audio = swin2d.SwinTransformerV2(
        img_size=56, num_classes=1, embed_dim=32, depths=[2, 2], num_heads=[2, 4],
        window_size=7, pretrained_window_sizes=[16, 16], use_feat=True,
        drop_path_rate=0.0,
    )
    hf = HFModel(HFConfig())
    ref_paudio = audio_t.Audio2D(args, hf, num_classes=1, use_feat=True)
    ref = fusion.FusionModel(
        args, ref_video, ref_audio, ref_paudio, out_dim=1,
        video_dim=1024, audio_dim=64, paudio_dim=768,
    ).eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.5, 1.5)
            if isinstance(m, torch.nn.LayerNorm):
                m.weight.uniform_(0.5, 1.5)

    ours = FusionModel(
        video_extractor=InceptionVideoClassifier(
            num_classes=1, drop_rate=0.0, use_feat=True
        ),
        audio_extractor=SwinTransformerV2(
            img_size=56, num_classes=1, embed_dim=32, depths=(2, 2), num_heads=(2, 4),
            window_size=7, pretrained_window_sizes=(16, 16), use_feat=True,
            drop_path_rate=0.0,
        ),
        paudio_extractor=Audio2D(num_classes=1, use_feat=True, model_drop=0.0),
        out_dim=1, classify_drop=0.0,
    )
    variables = import_fusion(ref.state_dict(), swin_depths=(2, 2))

    rng = np.random.default_rng(0)
    video = rng.standard_normal((2, 2, 3, 96, 96)).astype(np.float32)
    audio = rng.standard_normal((2, 3, 56, 56)).astype(np.float32)
    paudio = rng.standard_normal((2, 8000)).astype(np.float32)

    with torch.no_grad():
        want = ref(
            (torch.from_numpy(video), torch.from_numpy(audio), torch.from_numpy(paudio))
        ).numpy()

    got = np.asarray(
        ours.apply(
            variables,
            (
                jnp.asarray(video.transpose(0, 1, 3, 4, 2)),
                jnp.asarray(audio.transpose(0, 2, 3, 1)),
                jnp.asarray(paudio),
            ),
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_infonce_matches_reference_math():
    """cal_nce_loss parity (reference: ModalFusion.py:78-99)."""
    fusion = ref_loader.load("src.models.ModalFusion")
    torch.manual_seed(1)
    args = SimpleNamespace(soft=0.01, classify_drop=0.0)

    class Dummy(torch.nn.Module):
        pass

    ref = fusion.FusionModel.__new__(fusion.FusionModel)
    torch.nn.Module.__init__(ref)
    ref.soft = 0.01

    a = torch.randn(4, 16)
    b = torch.randn(4, 16)
    want = ref.cal_nce_loss(a, b).item()
    got = float(infonce_pair_loss(jnp.asarray(a.numpy()), jnp.asarray(b.numpy()), 0.01))
    assert abs(got - want) < 1e-4


def test_graft_branch_checkpoints(tmp_path):
    """load_pre_fused equivalent (reference: src/utils.py:262-292): per-branch
    reference .pth checkpoints graft into the fused model's param tree."""
    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2Model as HFModel

    import jax
    from deepfake_tpu.config import Config
    from deepfake_tpu.io.checkpoint import graft_branch_checkpoints

    iresnet = ref_loader.load("src.models.IResNet")
    swin2d = ref_loader.load("src.models.swin_transformer2d")
    audio_t = ref_loader.load("src.models.audioTransformer")

    torch.manual_seed(5)
    args = SimpleNamespace(bn_momentum=0.1, num_frames=2, classify_drop=0.0,
                           swin_drop=0.0)
    # classifier-mode branch checkpoints (heads present, wrapped like the
    # reference trainer saves them: module.-prefixed under 'checkpoint')
    ref_video = iresnet.InceptionVideoClassifier(args, 1, drop_rate=0.0)
    ref_audio = swin2d.SwinTransformerV2(
        img_size=56, num_classes=1, embed_dim=32, depths=[2, 2], num_heads=[2, 4],
        window_size=7, pretrained_window_sizes=[16, 16], drop_path_rate=0.0,
    )
    hf = HFModel(HFConfig())
    ref_paudio = audio_t.Audio2D(args, hf, num_classes=1)

    def save(ref, name):
        sd = {f"module.{k}": v for k, v in ref.state_dict().items()}
        p = str(tmp_path / name)
        torch.save({"epoch": 0, "checkpoint": sd}, p)
        return p

    cfg = Config()
    cfg.data.modality = "fused"
    cfg.model.swin2d_embed_dim = 32
    cfg.model.swin2d_depths = (2, 2)
    cfg.model.swin2d_heads = (2, 4)

    from deepfake_tpu.models.audio2d import Audio2D
    from deepfake_tpu.models.nextvlad import InceptionVideoClassifier
    from deepfake_tpu.models.swin2d import SwinTransformerV2

    fused = FusionModel(
        video_extractor=InceptionVideoClassifier(num_classes=1, drop_rate=0.0,
                                                 use_feat=True),
        audio_extractor=SwinTransformerV2(
            img_size=56, num_classes=1, embed_dim=32, depths=(2, 2),
            num_heads=(2, 4), window_size=7, pretrained_window_sizes=(16, 16),
            use_feat=True, drop_path_rate=0.0),
        paudio_extractor=Audio2D(num_classes=1, use_feat=True, model_drop=0.0),
        out_dim=1, classify_drop=0.0,
    )
    video = jnp.zeros((1, 2, 96, 96, 3))
    audio = jnp.zeros((1, 56, 56, 3))
    paudio = jnp.zeros((1, 4000))
    variables = fused.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        (video, audio, paudio), deterministic=True,
    )
    grafted = graft_branch_checkpoints(
        dict(variables), cfg,
        audio_path=save(ref_audio, "audio.pth"),
        video_path=save(ref_video, "video.pth"),
        paudio_path=save(ref_paudio, "paudio.pth"),
    )
    # grafted branch weights equal the torch originals
    qkv = np.asarray(
        grafted["params"]["audio_extractor"]["layers_0_blocks_0"]["attn"]["qkv_kernel"]
    )
    want = ref_audio.state_dict()["layers.0.blocks.0.attn.qkv.weight"].numpy().T
    np.testing.assert_allclose(qkv, want)
    # structure still matches the module: forward runs
    out = fused.apply(grafted, (video, audio, paudio), deterministic=True)
    assert np.isfinite(np.asarray(out)).all()
