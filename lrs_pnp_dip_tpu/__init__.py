"""lrs_pnp_dip_tpu — a TPU-native low-rank + sparse plug-and-play image recovery engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
LRS-PnP / LRS-PnP-DIP / LRS-PnP-DIP(1-Lip) hyperspectral-inpainting codebase
(shuoli0708/LRS-PnP-DIP): patch-wise dictionary sparse coding solved by a
plug-and-play ISTA with an NLM denoiser, a low-rank spectral prior (SVT or a
per-image-trained Deep Image Prior network, optionally 1-Lipschitz-constrained),
and a mask-aware closed-form data-fidelity update, inside an ADMM-style outer
loop with two Lagrangian multipliers.

Design stance (TPU-first, not a port):
  * every solver stage is a pure function on static-shaped arrays,
    jit-compiled as ONE fused outer step;
  * the ragged missing-pixel row-pruning of the reference is re-expressed as
    mask-weighted ISTA (mathematically identical, MXU-friendly);
  * blocks/patches are a batch axis (`vmap`/`shard_map`), bands a sharding axis;
  * the low-rank prox runs via Gram + eigh (B×B) instead of tall-skinny LAPACK
    SVD, and distributes with a single `psum`;
  * DIP training is a `lax.while_loop` with a windowed-variance early-stop
    state machine, compiled once per network architecture.

Package layout:
  data/      .mat IO, canonical HSI layout, mask + dictionary generation
  ops/       numerical operators: blocks (im2col), shrinkage, SVT, NLM,
             PnP-ISTA, data-fidelity update, metrics (PSNR/SSIM)
  models/    DIP network zoo (skip, UNet, Lipschitz-UNet, ResNet, deep
             decoder, texture nets, 3D UNet, attention blocks)
  solvers/   the ADMM engine, DIP trainer, early stopping
  parallel/  mesh / sharding / collective helpers
  utils/     config, checkpointing, logging, profiling, visualization
"""

__version__ = "0.1.0"

from .api import inpaint, inpaint_scene  # noqa: E402  (one-call user API)

__all__ = ["inpaint", "inpaint_scene"]
