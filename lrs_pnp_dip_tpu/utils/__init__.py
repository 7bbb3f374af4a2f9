from .config import (
    PRESETS,
    SolverConfig,
    dip_1lip_preset,
    dip_preset,
    lrs_pnp_preset,
)
from .noise import get_noise

__all__ = [
    "PRESETS",
    "SolverConfig",
    "dip_1lip_preset",
    "dip_preset",
    "lrs_pnp_preset",
    "get_noise",
]
