"""Test-time 3DGS refinement: SDS++ (single-view SD guidance) and MV-SDS++."""
from .gs_manager import (
    GaussianBuffer,
    activate,
    densify_and_prune,
    make_buffer,
    num_alive,
)
from .sds_pp import GSRefinerSDSPlusPlus, MultiviewSDSPPRefiner
