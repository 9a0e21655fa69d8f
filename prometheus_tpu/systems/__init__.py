"""Training/inference systems (functional analogs of the reference's LightningModules)."""
from .mv_ldm_system import MVLDMSystem
from .traj_dit_system import TrajDiTSystem

SYSTEM_REGISTRY = {
    "MVLDMSystem": MVLDMSystem,
    "TrajDiTSystem": TrajDiTSystem,
}
