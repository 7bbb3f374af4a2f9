from .blocks import BlockGrid, block_grid, extract_blocks, scatter_blocks
from .shrinkage import soft_threshold
from .svt import svt, svt_gram, singular_values_gram
from .metrics import psnr_ref, mpsnr, batch_mpsnr, mse
from .ssim import ssim
from .nlm import nlm2d, nlm_column
from .ista import pnp_ista_blocks, sparse_prox, SparseProxConfig
from .fidelity import data_fidelity_update, dual_updates

__all__ = [
    "BlockGrid",
    "block_grid",
    "extract_blocks",
    "scatter_blocks",
    "soft_threshold",
    "svt",
    "svt_gram",
    "singular_values_gram",
    "psnr_ref",
    "mpsnr",
    "batch_mpsnr",
    "mse",
    "ssim",
    "nlm2d",
    "nlm_column",
    "pnp_ista_blocks",
    "sparse_prox",
    "SparseProxConfig",
    "data_fidelity_update",
    "dual_updates",
]
