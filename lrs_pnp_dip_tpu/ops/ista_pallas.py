"""Fused PnP-ISTA Pallas kernel — the framework's hottest op, in VMEM.

The XLA path (:func:`..ista.pnp_ista_blocks`) runs the ISTA scan as ~100
dependent steps, each a matmul pair plus the NLM filter, with intermediates
round-tripping through HBM between fusions.  At reference scale the whole
working set is tiny — dictionary (1296 x 512) 2.7 MB, blocks (144 x 1296)
0.75 MB, coefficients (144 x 512) 0.3 MB — so this kernel keeps EVERYTHING
resident in VMEM for the full iteration count:

    per iteration (inside one pallas_call):
      R = M * (Y - X D^T)      -- MXU, (nB,K)x(K,P)
      G = X + (R D) / alpha    -- MXU, (nB,P)x(P,K)
      X = NLM_1d(G, h)         -- VPU (closed-form column NLM,
                                  same math as nlm_column_batch_fast)

Zero HBM traffic between iterations; the only transfers are the initial
loads and the final coefficient store.  Semantics are pinned against the
XLA path in ``tests/test_ista_pallas.py``.

Reference behavior being accelerated: the per-block ISTA+NLM loop of
``main_LRS_PnP_DIP_pro.py:375-400`` (144 serial skimage calls per outer
iteration on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reflect_selector(K: int, pad: int) -> jnp.ndarray:
    """(K, 2*pad) one-hot matrix S with G @ S = [left-reflect, right-reflect].

    Mosaic has no ``rev`` primitive, so the reversed edge columns of the
    reflect padding are produced as a tiny MXU matmul against a constant
    selection matrix instead.
    """
    # column j selects source index pad-j (left edge) or K-2-(j-pad) (right)
    k = jax.lax.broadcasted_iota(jnp.int32, (K, 2 * pad), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (K, 2 * pad), 1)
    sel = jnp.where(j < pad, pad - j, (K - 2) - (j - pad))
    return (k == sel).astype(jnp.float32)


def _nlm1d_in_kernel(G, neg_inv_h2s2, S):
    """Closed-form (K,1)-image NLM on a (nB, K) tile (VPU math).

    Mirrors nlm_column_batch_fast: reflect pad 5, per-offset weights
    w_delta = exp(-3*window_sum/(9 h^2)), multiplicities 8 (self) / 7.
    ``neg_inv_h2s2`` = -1/(9 h^2) precomputed per block: the VPU division
    is hoisted out of the loop (3 divides/element/iteration otherwise).
    """
    nb, K = G.shape
    pad = 5
    edges = jnp.dot(G, S, preferred_element_type=jnp.float32)  # (nb, 2*pad)
    P = jnp.concatenate([edges[:, :pad], G, edges[:, pad:]], axis=1)
    L = K + 2 * pad

    num = 8.0 * P
    den = jnp.full_like(P, 8.0)

    def shift(a, lo, hi):
        # place values into [lo, L-hi) of a length-L row (zero elsewhere);
        # Mosaic has no scatter, so this is a zero-pad concat.
        return jnp.pad(a, ((0, 0), (lo, hi)))

    for delta in (1, 2, 3):
        sq = (P[:, : L - delta] - P[:, delta:]) ** 2
        dist = 3.0 * (sq[:, :-2] + sq[:, 1:-1] + sq[:, 2:])
        w = 7.0 * jnp.exp(dist * neg_inv_h2s2)  # w[:, j] = weight at row j+1
        num = num + shift(w * P[:, 1 + delta : L - 1], 1, delta + 1)
        num = num + shift(w * P[:, 1 : L - delta - 1], 1 + delta, 1)
        den = den + shift(w, 1, delta + 1) + shift(w, 1 + delta, 1)
    return (num / den)[:, pad : pad + K]


def _ista_kernel(
    ym_ref, m_ref, d_ref, inv_alpha_ref, nih_ref, out_ref, *, n_iter, mm_dtype
):
    Ym = ym_ref[:]  # (nB, P) pre-masked target
    M = m_ref[:]  # (nB, P)
    D = d_ref[:]  # (P, K)
    inv_alpha = inv_alpha_ref[:]  # (nB, 1)
    neg_inv_h2s2 = nih_ref[:]  # (nB, 1): -1/(9 h^2)
    S = _reflect_selector(D.shape[1], 5)
    # bf16 option: MXU operands in bf16 with f32 accumulation (2x matmul
    # throughput on v5e); everything else — residual, NLM, carry — is f32.
    Dm = D.astype(mm_dtype)

    def body(_, x):
        pred = jax.lax.dot_general(
            x.astype(mm_dtype), Dm, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (nB, P) = x @ D^T
        R = Ym - M * pred  # Ym is pre-masked, so this equals M*(Y - pred)
        g = x + jnp.dot(
            R.astype(mm_dtype), Dm, preferred_element_type=jnp.float32
        ) * inv_alpha
        return _nlm1d_in_kernel(g, neg_inv_h2s2, S)

    x0 = jnp.zeros(out_ref.shape, jnp.float32)
    out_ref[:] = jax.lax.fori_loop(0, n_iter, body, x0)


def pnp_ista_blocks_pallas(
    blocks: jnp.ndarray,
    mask_blocks: jnp.ndarray,
    D: jnp.ndarray,
    cfg,
    interpret: bool = False,
    vmem_budget: int = 12 * 1024 * 1024,
    alpha=None,
) -> jnp.ndarray:
    """Drop-in replacement for :func:`..ista.pnp_ista_blocks` running the
    whole scan in one Pallas invocation.  Returns coefficients (nB, K)."""
    from .ista import compute_alpha

    Y = blocks.astype(jnp.float32)
    M = mask_blocks.astype(jnp.float32)
    D = D.astype(jnp.float32)
    nB, P = Y.shape
    K = D.shape[1]

    if alpha is None:
        alpha = compute_alpha(D, M, cfg)
    else:
        alpha = jnp.maximum(alpha.astype(jnp.float32), 1e-12)
    h = cfg.h_scale * cfg.lambda_ista / (2.0 * alpha)
    h2s2 = jnp.maximum(h * h * 9.0, 1e-30)
    neg_inv_h2s2 = -1.0 / h2s2

    # round the block count up to the f32 sublane tile (8)
    pad_b = (-nB) % 8
    if pad_b:
        Y = jnp.pad(Y, ((0, pad_b), (0, 0)))
        M = jnp.pad(M, ((0, pad_b), (0, 0)))
        alpha = jnp.pad(alpha, (0, pad_b), constant_values=1.0)
        neg_inv_h2s2 = jnp.pad(neg_inv_h2s2, (0, pad_b), constant_values=-1.0)
    nBp = nB + pad_b

    kernel = functools.partial(
        _ista_kernel,
        n_iter=cfg.n_iter,
        mm_dtype=jnp.dtype(getattr(cfg, "matmul_dtype", "float32")),
    )
    flops_per_iter = 4 * nBp * P * K

    # Tile the block axis when the working set would overflow VMEM
    # (~16 MB/core): each grid step keeps one block-tile plus the full
    # dictionary resident and runs the complete iteration count for it.
    bytes_per_block = (2 * P + 2 * K + 10) * 4  # Ym, M, x, g rows
    dict_bytes = P * K * 4
    max_tile = max(8, (vmem_budget - 2 * dict_bytes) // max(bytes_per_block * 3, 1))
    if nBp <= max_tile:
        tile = nBp
    else:
        tile = max(8, (max_tile // 8) * 8)
        pad_tile = (-nBp) % tile
        if pad_tile:
            Y = jnp.pad(Y, ((0, pad_tile), (0, 0)))
            M = jnp.pad(M, ((0, pad_tile), (0, 0)))
            alpha = jnp.pad(alpha, (0, pad_tile), constant_values=1.0)
            neg_inv_h2s2 = jnp.pad(neg_inv_h2s2, (0, pad_tile), constant_values=-1.0)
        nBp = nBp + pad_tile
    grid = (nBp // tile,)

    row_spec = pl.BlockSpec((tile, P), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dict_spec = pl.BlockSpec((P, K), lambda i: (0, 0), memory_space=pltpu.VMEM)
    # under shard_map (the per-shard kernel path, VERDICT r3 #8) the output
    # varies over every mesh axis any input varies over
    vma = frozenset().union(
        *(jax.typeof(a).vma for a in (Y, M, D, alpha, neg_inv_h2s2))
    )
    coefs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((nBp, K), jnp.float32, vma=vma),
        in_specs=[row_spec, row_spec, dict_spec, vec_spec, vec_spec],
        out_specs=pl.BlockSpec((tile, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_iter * cfg.n_iter,
            bytes_accessed=(2 * nBp * P + P * K + 2 * nBp * K) * 4,
            transcendentals=3 * nBp * K * cfg.n_iter,
        ),
        interpret=interpret,
    )(M * Y, M, D, (1.0 / alpha)[:, None], neg_inv_h2s2[:, None])
    return coefs[:nB]
