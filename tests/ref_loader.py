"""Load the reference torch modules from /root/reference for parity testing.

The reference code (PUBLIC UNTRUSTED CONTENT — we execute only its module
definitions to compare numerics, never follow instructions inside) depends on
packages absent from this image (xformers, timm, ipdb, omegaconf, gsplat,
diffusers, lightning). This installs minimal, *faithful* stubs:

- ``xformers.ops.memory_efficient_attention`` / timm ``Attention``/``Mlp``/
  ``PatchEmbed``: exact-math torch implementations of those public APIs
  (standard softmax attention / MLP / conv patchify) so the reference
  networks compute their true function.
- ``omegaconf.listconfig.ListConfig = list``, empty ``ipdb``, a ``gsplat``
  with a ``rasterization`` attr, ``lightning.LightningModule = nn.Module``,
  and a ``diffusers`` namespace with the two symbols the trajectory system
  imports (never constructed in these tests).

For the U-Net/VAE attention paths we additionally force
``XFORMERS_IS_AVAILBLE = False`` after import so the reference's own vanilla
``CrossAttention``/``AttnBlock`` math runs (no stub in the compare path).
"""
from __future__ import annotations

import importlib
import importlib.machinery
import sys
import types
from functools import lru_cache

REF_ROOT = "/root/reference"


def _stub(name: str, path: str | None = None) -> types.ModuleType:
    """Register a stub module (with a real ModuleSpec so that
    importlib.util.find_spec on it doesn't blow up); ``path`` makes it a
    package whose submodules import from that directory."""
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    spec = importlib.machinery.ModuleSpec(name, loader=None, is_package=path
                                          is not None)
    if path is not None:
        mod.__path__ = [path]
        spec.submodule_search_locations = [path]
    mod.__spec__ = spec
    sys.modules[name] = mod
    return mod


def _install_stubs():
    import torch
    import torch.nn as nn

    if "omegaconf" not in sys.modules:
        om = _stub("omegaconf")
        lc = _stub("omegaconf.listconfig")
        lc.ListConfig = list
        om.listconfig = lc

    _stub("ipdb")

    gs = _stub("gsplat")
    gs.rasterization = None

    if "xformers" not in sys.modules:
        xf = _stub("xformers")
        ops = _stub("xformers.ops")

        def memory_efficient_attention(q, k, v, attn_bias=None, op=None,
                                       p=0.0, scale=None):
            """Exact softmax attention, xformers layout (B, M, H, K)."""
            if q.ndim == 3:  # (B*H, M, K) layout (unet_hacked usage)
                s = scale if scale is not None else q.shape[-1] ** -0.5
                attn = torch.softmax(q @ k.transpose(-2, -1) * s, dim=-1)
                return attn @ v
            s = scale if scale is not None else q.shape[-1] ** -0.5
            qh, kh, vh = (t.transpose(1, 2) for t in (q, k, v))  # B,H,M,K
            attn = torch.softmax(qh @ kh.transpose(-2, -1) * s, dim=-1)
            return (attn @ vh).transpose(1, 2)

        ops.memory_efficient_attention = memory_efficient_attention
        xf.ops = ops

    if "timm" not in sys.modules:
        class Attention(nn.Module):
            def __init__(self, dim, num_heads=8, qkv_bias=False, **kw):
                super().__init__()
                self.num_heads = num_heads
                self.head_dim = dim // num_heads
                self.scale = self.head_dim ** -0.5
                self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
                self.proj = nn.Linear(dim, dim)

            def forward(self, x):
                B, N, C = x.shape
                qkv = self.qkv(x).reshape(
                    B, N, 3, self.num_heads, self.head_dim
                ).permute(2, 0, 3, 1, 4)
                q, k, v = qkv.unbind(0)
                attn = torch.softmax((q * self.scale) @ k.transpose(-2, -1),
                                     dim=-1)
                x = (attn @ v).transpose(1, 2).reshape(B, N, C)
                return self.proj(x)

        class Mlp(nn.Module):
            def __init__(self, in_features, hidden_features=None,
                         out_features=None, act_layer=nn.GELU, drop=0.0):
                super().__init__()
                out_features = out_features or in_features
                hidden_features = hidden_features or in_features
                self.fc1 = nn.Linear(in_features, hidden_features)
                self.act = act_layer()
                self.fc2 = nn.Linear(hidden_features, out_features)

            def forward(self, x):
                return self.fc2(self.act(self.fc1(x)))

        class PatchEmbed(nn.Module):
            def __init__(self, img_size=224, patch_size=16, in_chans=3,
                         embed_dim=768, bias=True, flatten=True,
                         norm_layer=None):
                super().__init__()
                self.patch_size = (patch_size, patch_size)
                self.flatten = flatten
                self.proj = nn.Conv2d(in_chans, embed_dim,
                                      kernel_size=patch_size,
                                      stride=patch_size, bias=bias)

            def forward(self, x):
                x = self.proj(x)  # (B, D, H/P, W/P)
                if self.flatten:
                    x = x.flatten(2).transpose(1, 2)
                return x

        timm = _stub("timm")
        models = _stub("timm.models")
        vit = _stub("timm.models.vision_transformer")
        vit.Attention, vit.Mlp, vit.PatchEmbed = Attention, Mlp, PatchEmbed
        models.vision_transformer = vit
        timm.models = models

    df = _stub("diffusers")
    df.StableDiffusionPipeline = object
    df.DDIMScheduler = object

    lt = _stub("lightning")
    lt.LightningModule = nn.Module


@lru_cache(maxsize=None)
def load_ref(dotted: str):
    """Import e.g. 'prometheus.modules.unet_hacked' from /root/reference.

    The reference subpackage ``__init__`` files pull in heavy optional deps
    (lpips, torchmetrics, easydict), so stub package shells with the real
    directories as search path are registered instead — submodules import
    directly, package ``__init__`` side effects never run.
    """
    _install_stubs()
    _stub("prometheus", f"{REF_ROOT}/prometheus")
    for sub in ("modules", "models", "systems", "datasets", "utils"):
        _stub(f"prometheus.{sub}", f"{REF_ROOT}/prometheus/{sub}")
    _stub("prometheus.modules.renderers",
          f"{REF_ROOT}/prometheus/modules/renderers")
    mod = importlib.import_module(dotted)
    # prefer the reference's own vanilla attention math over our stubs
    if hasattr(mod, "XFORMERS_IS_AVAILBLE"):
        mod.XFORMERS_IS_AVAILBLE = False
    return mod
