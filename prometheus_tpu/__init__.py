"""prometheus-tpu: a TPU-native (JAX/XLA/Pallas) feed-forward text-to-3D framework.

A from-scratch rebuild of the capabilities of Prometheus (CVPR 2025,
arXiv 2412.21117): text -> camera trajectory (TrajDiT) -> multi-view RGB-D
latents (MV-LDM, an SD-2.1-class U-Net with cross-view 3D self-attention) ->
pixel-aligned 3D Gaussians (GS-VAE decoder) -> differentiable tile-based 3DGS
rasterization implemented as Pallas TPU kernels (replacing the reference's
CUDA gsplat dependency).

Subpackages
-----------
- ``ops``       : Pallas/XLA compute kernels (3DGS rasterizer, attention, schedulers)
- ``models``    : network definitions (VAE, MV-UNet, DiTs, decoders) in flax.linen
- ``systems``   : training/inference systems (stage-1 GS-VAE, stage-2 MV-LDM, TrajDiT)
- ``parallel``  : device mesh / sharding / pjit train-step factories
- ``datasets``  : multi-view + text-to-image data pipeline
- ``utils``     : camera/ray math, Gaussian I/O, image/video export
- ``configs``   : dataclass config system (YAML-loadable, Hydra-group-like semantics)

Parity blueprint: SURVEY.md at the repo root (reference layout documented per
component with file:line citations).
"""

__version__ = "0.1.0"


def __getattr__(name):  # lazy top-level API (keeps bare import light)
    if name == "PrometheusPipeline":
        from .pipeline import PrometheusPipeline

        return PrometheusPipeline
    if name == "load_config":
        from .config import load_config

        return load_config
    raise AttributeError(name)
