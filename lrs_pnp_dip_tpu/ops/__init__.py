from .blocks import BlockGrid, block_grid, extract_blocks, scatter_blocks
from .shrinkage import soft_threshold
from .svt import svt, svt_gram, singular_values_gram, singular_energy_ratio
from .metrics import psnr_ref, psnr_standard, mpsnr, batch_mpsnr, mse
from .ssim import ssim, ssim_matlab
from .nlm import nlm2d, nlm_column, nlm_column_batch_fast, nlm_classic
from .bm3d import Bm3dConfig, bm3d, bm3d_prox
from .ista import pnp_ista_blocks, sparse_prox, SparseProxConfig
from .fidelity import data_fidelity_update, dual_updates
from . import proxlib

__all__ = [
    "BlockGrid",
    "block_grid",
    "extract_blocks",
    "scatter_blocks",
    "soft_threshold",
    "svt",
    "svt_gram",
    "singular_values_gram",
    "singular_energy_ratio",
    "psnr_ref",
    "psnr_standard",
    "mpsnr",
    "batch_mpsnr",
    "mse",
    "ssim",
    "ssim_matlab",
    "nlm2d",
    "nlm_column",
    "nlm_column_batch_fast",
    "nlm_classic",
    "proxlib",
    "pnp_ista_blocks",
    "sparse_prox",
    "SparseProxConfig",
    "data_fidelity_update",
    "dual_updates",
]
