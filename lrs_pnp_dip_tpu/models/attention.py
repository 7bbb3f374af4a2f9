"""Attention building blocks (model-zoo component M13).

Re-derived from reference ``models/SubLayers.py:11-135``:
scaled-dot-product attention, multi-head attention (pre-projections,
per-head attention, output projection, residual + LayerNorm),
position-wise feed-forward, and sinusoidal positional encoding.  At the
reference problem scale (<= 36x36 tokens) plain XLA attention saturates
the MXU; no flash/ring kernel is warranted (SURVEY §2.5).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


def scaled_dot_product_attention(q, k, v, temperature=None, mask=None):
    """q,k,v: (..., L, D).  Returns (out, attn)."""
    if temperature is None:
        temperature = jnp.sqrt(q.shape[-1]).astype(q.dtype)
    scores = jnp.einsum("...ld,...md->...lm", q, k) / temperature
    if mask is not None:
        scores = jnp.where(mask, scores, -1e9)
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("...lm,...md->...ld", attn, v), attn


class MultiHeadAttention(nn.Module):
    n_head: int = 8
    d_model: int = 512
    d_k: int = 64
    d_v: int = 64
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, q, k, v, mask=None, deterministic: bool = True):
        residual = q
        B, Lq, _ = q.shape
        Lk = k.shape[1]

        def proj(x, d, L):
            y = nn.Dense(self.n_head * d)(x)
            return y.reshape(B, L, self.n_head, d).transpose(0, 2, 1, 3)

        qh = proj(q, self.d_k, Lq)
        kh = proj(k, self.d_k, Lk)
        vh = proj(v, self.d_v, Lk)
        if mask is not None:
            mask = mask[:, None]  # broadcast over heads
        out, attn = scaled_dot_product_attention(qh, kh, vh, mask=mask)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, self.n_head * self.d_v)
        out = nn.Dense(self.d_model)(out)
        if self.dropout_rate > 0:
            out = nn.Dropout(self.dropout_rate)(out, deterministic=deterministic)
        out = nn.LayerNorm()(out + residual)
        return out, attn


class PositionwiseFeedForward(nn.Module):
    d_hid: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d_in = x.shape[-1]
        y = nn.relu(nn.Dense(self.d_hid)(x))
        y = nn.Dense(d_in)(y)
        if self.dropout_rate > 0:
            y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        return nn.LayerNorm()(y + x)


def sinusoid_position_encoding(n_position: int, d_hid: int) -> jnp.ndarray:
    """(1, n_position, d_hid) sinusoidal table."""
    pos = np.arange(n_position)[:, None]
    dim = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000, 2 * (dim // 2) / d_hid)
    table = np.zeros((n_position, d_hid))
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return jnp.asarray(table[None], jnp.float32)
