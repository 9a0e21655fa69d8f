"""Model zoo: VAE, cross-view DiT, GSDecoder, MV-LDM U-Net, TrajDiT.

A string-keyed registry mirrors the reference's ``import_str`` module lookup
(``prometheus/utils/__init__.py:20-25``) so configs can name models.
"""
from .vae import AutoencoderKL, DiagonalGaussian, Decoder, Encoder
from .dit import DiTBlock, FinalLayer, TimestepEmbedder
from .ray_dit import CrossViewDiT, CrossViewDiTWrapped
from .gs_decoder import GSDecoderModel, decode_and_render
from .unet_mv import MultiViewUNet
from .mv_ldm import MVLDMModel
from .traj_dit import TrajDiTModel, camera_to_token, token_to_camera
from .clip_text import CLIPTextModel, CLIPTokenizer
from .clip_image import CLIPImageEncoder
from .gm_ldm import GMLDMModel
from .lpips import LPIPS, make_lpips_fn
from .depth_anything import DepthAnythingV2, make_depth_fn

MODEL_REGISTRY = {
    "GSDecoderModel": GSDecoderModel,
    "AutoencoderKL": AutoencoderKL,
    "CrossViewDiT": CrossViewDiT,
    "MultiViewUNet": MultiViewUNet,
    "MVLDMModel": MVLDMModel,
    "TrajDiTModel": TrajDiTModel,
    "CLIPTextModel": CLIPTextModel,
    "CLIPImageEncoder": CLIPImageEncoder,
    "GMLDMModel": GMLDMModel,
    "LPIPS": LPIPS,
    "DepthAnythingV2": DepthAnythingV2,
}


def get_model(name: str):
    """Resolve a model class by registry name (accepts dotted paths' last part)."""
    key = name.rsplit(".", 1)[-1]
    if key not in MODEL_REGISTRY:
        raise KeyError(f"unknown model '{name}' (registry: {sorted(MODEL_REGISTRY)})")
    return MODEL_REGISTRY[key]
