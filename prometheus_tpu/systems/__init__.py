"""Training/inference systems (functional analogs of the reference's LightningModules)."""
from .gs_decoder_system import GSDecoderSystem
from .mv_ldm_system import MVLDMSystem
from .traj_dit_system import TrajDiTSystem

SYSTEM_REGISTRY = {
    "GSDecoderSystem": GSDecoderSystem,
    "MVLDMSystem": MVLDMSystem,
    "TrajDiTSystem": TrajDiTSystem,
}
