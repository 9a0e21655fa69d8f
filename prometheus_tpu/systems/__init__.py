"""Training/inference systems (functional analogs of the reference's LightningModules)."""
from .gm_ldm_system import GMLDMSystem
from .gs_decoder_system import GSDecoderSystem
from .mv_ldm_system import MVLDMSystem
from .traj_dit_system import TrajDiTSystem

SYSTEM_REGISTRY = {
    "GMLDMSystem": GMLDMSystem,
    "GSDecoderSystem": GSDecoderSystem,
    "MVLDMSystem": MVLDMSystem,
    "TrajDiTSystem": TrajDiTSystem,
}
