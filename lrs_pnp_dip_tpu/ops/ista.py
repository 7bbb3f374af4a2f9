"""Patch-wise dictionary sparse coding via plug-and-play ISTA.

Reference semantics (``main_LRS_PnP_DIP_pro.py:185-207, 363-402``;
``main_LRS_PnP.py:131-149``; MATLAB ``pnp_ista.m``/``ista.m``): for each
overlapping block, rows corresponding to missing pixels are *deleted* from
both the block vector and the dictionary, then ISTA runs for ``Nit``
iterations:

    gradient = x + H^T (y - H x) / alpha
    x        = NLM(gradient, h = T [* 0.1])      (instead of soft-threshold)

with ``T = lambda / (2 alpha)`` and the reconstruction using the FULL
dictionary: ``Phi_z = D @ x``.

TPU-first reformulation — masked ISTA
-------------------------------------
Row deletion produces ragged shapes, which is hostile to XLA.  But for
``H = D[kept_rows]`` we have exactly

    H^T H = D^T diag(m) D      and      H^T y = D^T (m * y)

so the pruned-row ISTA gradient equals the masked gradient
``x + D^T (m * (y - D x)) / alpha`` with static shapes.  The two step-size
conventions are likewise computed over kept rows only:

  * ``trace4``   (DIP variants, ``main_LRS_PnP_DIP_pro.py:190``):
    ``alpha = 4 * trace(H^T H) = 4 * sum_r m_r ||D[r, :]||^2``;
  * ``specnorm`` (plain LRS-PnP, ``main_LRS_PnP.py:134``; MATLAB
    ``max|eig(H^T H)|``, ``main_LRS_PnP.m:113``):
    ``alpha = sigma_max(H)^2 = lambda_max(D^T diag(m) D)``, computed with
    fixed-iteration power iteration (TPU-friendly; no LAPACK).

All blocks advance together as one batched matmul pair per ISTA step —
``(nB, K) @ (K, P)`` and ``(nB, P) @ (P, K)`` land on the MXU — wrapped in a
``lax.scan`` over iterations.  The NLM denoiser is vmapped over blocks.
The block axis shards over the mesh ``patch`` axis (see
:mod:`..parallel`) exactly where the MATLAB twin used ``parfor``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Literal

import jax
import jax.numpy as jnp

from .nlm import nlm_column_batch_fast


@dataclasses.dataclass(frozen=True)
class SparseProxConfig:
    """Static configuration of the sparse-coding stage."""

    lambda_ista: float = 0.1
    n_iter: int = 100  # reference Nit: 100 (DIP variants), 80 (plain)
    alpha_mode: Literal["trace4", "specnorm"] = "trace4"
    h_scale: float = 1.0  # reference: 1.0 (DIP variants), 0.1 (plain)
    power_iters: int = 50  # for alpha_mode == "specnorm"
    patch_size: int = 3
    patch_distance: int = 3
    backend: Literal["auto", "xla", "pallas"] = "auto"
    # 'pallas' fuses the whole ISTA scan into one VMEM-resident kernel
    # (TPU only); 'auto' picks pallas on TPU, xla elsewhere.
    matmul_dtype: Literal["float32", "bfloat16"] = "float32"
    # 'bfloat16' runs the two MXU matmuls per ISTA iteration with bf16
    # inputs and f32 accumulation (2x MXU throughput on v5e).  The NLM
    # shrinkage, step sizes, and the carried coefficients stay f32.
    # Default f32 = bit-parity with the reference semantics; bf16 is the
    # measured-speed option (quality impact quantified in RESULTS.md).
    denoiser: Literal["nlm_fast", "nlm_classic", "bm3d"] = "nlm_fast"
    # 'nlm_fast': the Python reference's skimage fast-mode pairwise NLM;
    # 'nlm_classic': the MATLAB twin's NLmeansfilter (wmax self-weight) —
    # XLA backend only.


def _psum(x: jnp.ndarray, axis_name) -> jnp.ndarray:
    """Sum over a mesh axis when running inside shard_map; identity
    otherwise (the hook that makes the same ISTA body work with the
    dictionary's pixel rows sharded over the ``band`` axis)."""
    return x if axis_name is None else jax.lax.psum(x, axis_name)


def _alpha_trace4(D: jnp.ndarray, M: jnp.ndarray, axis_name=None) -> jnp.ndarray:
    """alpha_j = 4 * sum_r m_jr ||D[r,:]||^2  — per block (nB,)."""
    row_normsq = jnp.sum(D * D, axis=1)  # (P,) or (P_local,)
    return 4.0 * _psum(M @ row_normsq, axis_name)


def _alpha_specnorm(
    D: jnp.ndarray, M: jnp.ndarray, n_steps: int, axis_name=None
) -> jnp.ndarray:
    """alpha_j = lambda_max(D^T diag(m_j) D) via batched power iteration."""
    nB = M.shape[0]
    K = D.shape[1]
    # seed the carry with the same varying-axes set the loop body produces
    # (varying over patch shards, psum-invariant over the band axis), so
    # the scan carry types match under shard_map's vma tracking
    seed = _psum(jnp.sum(M, axis=1, keepdims=True), axis_name)
    v = jnp.ones((nB, K), D.dtype) / jnp.sqrt(K) + 0.0 * seed

    def body(v, _):
        u = _psum((M * (v @ D.T)) @ D, axis_name)  # (nB, K): D^T diag(m) D v
        v = u / (jnp.linalg.norm(u, axis=1, keepdims=True) + 1e-30)
        return v, None

    v, _ = jax.lax.scan(body, v, None, length=n_steps)
    u = _psum((M * (v @ D.T)) @ D, axis_name)
    return jnp.sum(v * u, axis=1)  # Rayleigh quotient (v unit-norm)


def compute_alpha(
    D: jnp.ndarray, mask_blocks: jnp.ndarray, cfg: SparseProxConfig,
    axis_name=None,
) -> jnp.ndarray:
    """Per-block ISTA step sizes (nB,) for the configured ``alpha_mode``.

    Alpha depends only on the dictionary and the (fixed) observation mask
    — NOT on the iterate — so production engines precompute it once per
    problem (``solvers.admm.make_consts``) instead of re-running the
    ``specnorm`` power iteration inside every outer iteration (round-5
    large-cube decomposition: the 50-step power iteration costs ~half the
    ISTA matmul flops per call)."""
    M = mask_blocks.astype(jnp.float32)
    D = D.astype(jnp.float32)
    if cfg.alpha_mode == "trace4":
        alpha = _alpha_trace4(D, M, axis_name)
    elif cfg.alpha_mode == "specnorm":
        alpha = _alpha_specnorm(D, M, cfg.power_iters, axis_name)
    else:
        raise ValueError(cfg.alpha_mode)
    return jnp.maximum(alpha, 1e-12)


def pnp_ista_blocks_impl(
    blocks: jnp.ndarray,
    mask_blocks: jnp.ndarray,
    D: jnp.ndarray,
    cfg: SparseProxConfig,
    axis_name=None,
    alpha=None,
) -> jnp.ndarray:
    """Masked PnP-ISTA body.  With ``axis_name`` set this runs inside a
    shard_map with the PIXEL rows of both the blocks and the dictionary
    sharded over that mesh axis: every partial matmul against D is followed
    by a psum, so each device does 1/b of the MXU work and the (nB, K)
    coefficient iterate stays band-replicated (the denoiser then runs
    identically on every band shard — cheap relative to the matmuls, see
    docs/DESIGN.md scaling model)."""
    Y = blocks.astype(jnp.float32)
    M = mask_blocks.astype(jnp.float32)
    D = D.astype(jnp.float32)
    nB, P = Y.shape
    K = D.shape[1]

    if alpha is None:
        alpha = compute_alpha(D, M, cfg, axis_name)
    else:
        alpha = jnp.maximum(alpha.astype(jnp.float32), 1e-12)
    h = cfg.h_scale * cfg.lambda_ista / (2.0 * alpha)  # per-block NLM h

    Ym = M * Y

    if cfg.denoiser == "nlm_classic":
        from .nlm import nlm_classic

        def denoise(grad):
            return jax.vmap(
                lambda g, hh: nlm_classic(g[:, None], hh)[:, 0]
            )(grad, h)
    elif cfg.denoiser == "bm3d":
        from .bm3d import Bm3dConfig, bm3d_coef_batch

        bm3d_cfg = Bm3dConfig(patch=4, stride=2, group=8, search=8, wiener=False)

        def denoise(grad):
            return bm3d_coef_batch(grad, h, bm3d_cfg)
    else:
        denoise = lambda grad: nlm_column_batch_fast(grad, h)

    mm = jnp.dtype(cfg.matmul_dtype)
    Dm = D.astype(mm)

    def body(x, _):
        pred = jax.lax.dot_general(  # x @ D^T, f32 accumulation
            x.astype(mm), Dm, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        resid = Ym - M * pred  # (nB, P) [or (nB, P_local)]
        part = jnp.dot(resid.astype(mm), Dm, preferred_element_type=jnp.float32)
        grad = x + _psum(part, axis_name) / alpha[:, None]  # (nB, K)
        x = denoise(grad)
        return x, None

    # derive the zero init from a (possibly device-varying) input so the
    # scan carry type matches under shard_map's varying-axis tracking
    x0 = jnp.zeros((nB, K), jnp.float32) + 0.0 * alpha[:, None]
    x, _ = jax.lax.scan(body, x0, None, length=cfg.n_iter)
    return x


@functools.partial(jax.jit, static_argnames=("cfg",))
def pnp_ista_blocks(
    blocks: jnp.ndarray,  # (nB, P) target blocks (of X + lambda_1/mu_1)
    mask_blocks: jnp.ndarray,  # (nB, P) 1 = observed entry
    D: jnp.ndarray,  # (P, K) dictionary
    cfg: SparseProxConfig = SparseProxConfig(),
    alpha=None,  # optional precomputed per-block step sizes (nB,)
) -> jnp.ndarray:
    """Run masked PnP-ISTA on every block; return coefficients (nB, K)."""
    return pnp_ista_blocks_impl(blocks, mask_blocks, D, cfg, alpha=alpha)


def _use_pallas(cfg: SparseProxConfig) -> bool:
    if cfg.denoiser != "nlm_fast":
        return False  # the fused kernel implements the fast-NLM path only
    if cfg.backend == "pallas":
        return True
    if cfg.backend == "xla":
        return False
    import jax

    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


def _pallas_interpret() -> bool:
    """Explicitly-requested Pallas on a non-TPU backend runs the kernel in
    interpret mode (pure-JAX emulation) instead of silently downgrading to
    the XLA scan — this is how the shard_map'd kernel path is pinned on the
    8-virtual-device CPU mesh (VERDICT r3 #8)."""
    import jax

    try:
        return jax.default_backend() in ("cpu", "gpu")
    except Exception:
        return True


def sparse_prox(
    blocks: jnp.ndarray,
    mask_blocks: jnp.ndarray,
    D: jnp.ndarray,
    cfg: SparseProxConfig = SparseProxConfig(),
    alpha=None,
) -> jnp.ndarray:
    """Full sparse-coding prox: ISTA coefficients + FULL-dictionary
    reconstruction (reference ``Phi_z[:, j] = D @ Coefs``, ``:393``).

    ``alpha``: optional precomputed per-block step sizes (see
    :func:`compute_alpha`) — mask/dictionary constants, so solvers hoist
    them out of the outer loop.  Returns reconstructed blocks (nB, P).
    """
    if _use_pallas(cfg):
        from .ista_pallas import pnp_ista_blocks_pallas

        coefs = pnp_ista_blocks_pallas(
            blocks, mask_blocks, D, cfg, interpret=_pallas_interpret(),
            alpha=alpha,
        )
    else:
        coefs = pnp_ista_blocks(blocks, mask_blocks, D, cfg, alpha=alpha)
    return coefs @ D.T
