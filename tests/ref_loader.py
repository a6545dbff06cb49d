"""Import the reference PyTorch modules from /root/reference for golden tests.

The reference has unpackaged sources with heavy/unavailable deps (timm,
mmengine, librosa, pydub, moviepy, GPUtil). We stub exactly the symbols its
model files touch at import time and rely on namespace packages to resolve
`src.models.*`. Test-only: the framework itself never imports this.
"""

from __future__ import annotations

import sys
import types

REF = "/root/reference"


def _stub(name: str, **attrs) -> types.ModuleType:
    if name in sys.modules:
        mod = sys.modules[name]
    else:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    if getattr(mod, "__spec__", None) is None:
        # importlib.util.find_spec raises ValueError on a module with
        # __spec__ None (transformers probes optional deps this way when a
        # later test imports HF models after the stubs are installed)
        import importlib.machinery

        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


_installed = False


def install() -> None:
    global _installed
    if _installed:
        return
    import torch
    import torch.nn as nn

    def to_2tuple(x):
        return x if isinstance(x, (tuple, list)) else (x, x)

    def trunc_normal_(t, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            t.normal_(mean, std).clamp_(a, b)
        return t

    class DropPath(nn.Module):  # eval-mode identity; tests run models in eval
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    _stub("timm")
    _stub("timm.models")
    _stub(
        "timm.models.layers",
        DropPath=DropPath,
        to_2tuple=to_2tuple,
        trunc_normal_=trunc_normal_,
    )
    _stub("mmengine", Config=object, DictAction=object)
    _stub("GPUtil", showUtilization=lambda *a, **k: None)
    _stub("librosa", load=None, feature=types.SimpleNamespace(), power_to_db=None)
    _stub("pydub", AudioSegment=object)
    _stub("moviepy", editor=None)
    _stub("moviepy.editor", VideoFileClip=object)

    # APPEND so the reference's top-level train.py/test.py/config.py never
    # shadow this repo's entry points of the same name
    if REF not in sys.path:
        sys.path.append(REF)
    _installed = True


def load(module_name: str):
    """e.g. load('src.models.InceptionResV2')"""
    install()
    import importlib

    return importlib.import_module(module_name)
