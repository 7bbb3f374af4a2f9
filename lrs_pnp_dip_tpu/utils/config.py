"""Configuration dataclasses and per-variant presets.

The reference has no config system — hyper-parameters are module-level
constants and variant selection is "which script you run"
(``main_LRS_PnP_DIP_pro.py:324-353``, ``main_LRS_PnP.py:217-238``).  Here
every constant lives in one frozen dataclass, with presets reproducing the
three reference entry points exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from ..ops.ista import SparseProxConfig


@dataclasses.dataclass(frozen=True)
class DipConfig:
    """DIP training hyper-parameters (reference defaults:
    ``get_DIP_out`` num_iter=5000, lr=0.1, show_every=1 and the
    EarlyStop buffer 30 / patience 60, ``main_LRS_PnP_DIP_pro.py:211-231``).

    ``compute_dtype='bfloat16'`` enables mixed precision: forward/backward
    in bf16 on the MXU, master params + Adam state + loss in f32.
    """

    num_iter: int = 5000
    learning_rate: float = 0.1
    show_every: int = 1
    buffer_size: int = 30
    patience: int = 60
    compute_dtype: str = "float32"
    es_mode: str = "exact"
    # 'exact': recompute the windowed variance over the full (30, D) ring
    #   buffer every check — the reference's order of operations;
    # 'incremental': O(D) sufficient-statistics update with periodic exact
    #   resync (see solvers/early_stop.py) — same quantity, ~8x less HBM
    #   traffic per DIP iteration at flagship scale.
    input_mode: str = "iterate"
    # 'iterate': DIP input = X + lambda_2/mu_2 (the reference's
    #   image-conditioned DIP, ``main_LRS_PnP_DIP_pro.py:412``);
    # 'noise': classic fixed-noise-input DIP (``utils/common_utils.py``
    #   get_noise heritage) — the noise is drawn once per outer iteration
    #   from the carried key.
    noise_var: float = 0.1
    return_mode: str = "last"
    # 'last': the output at the stop iteration (the reference's
    #   ``get_DIP_out`` behavior);
    # 'window_mean': the mean of the early-stop ring buffer (the last
    #   ``buffer_size`` outputs) — a noise-averaged estimate the window
    #   already pays for; typically recovers the overfitting dip between
    #   the variance minimum and the stop iteration.  No reference
    #   equivalent (quality improvement beyond the reference).


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Full configuration of one LRS-PnP(-DIP) solve."""

    variant: str = "dip"  # 'lrs_pnp' | 'dip' | 'dip_1lip'
    # ADMM / data-fidelity (reference names in comments)
    gamma: float = 0.5  # data-fidelity weight
    mu1: float = 0.1  # sparsity penalty
    mu2: float = 0.1  # low-rank penalty
    outer_iters: int = 250  # iteration_num
    block_size: int = 36  # bb
    stride: int = 36  # slidingDis
    sparse: SparseProxConfig = SparseProxConfig()
    dip: Optional[DipConfig] = DipConfig()
    # network (DIP variants)
    dip_net: str = "default"
    # 'default': skip-128 for 'dip', Lipschitz-UNet for 'dip_1lip';
    # otherwise any models.get_net key ('UNet', 'ResNet', 'deep_decoder',
    # 'texture_nets', ...) — the DIP prox then uses that architecture.
    net_width: int = 128
    ln_lambda: float = 1.0  # Lipschitz bound (1-Lip variant)
    sn_mode: str = "power"  # spectral-norm estimator
    seed: int = 0
    dtype: str = "float32"


def lrs_pnp_preset(**overrides) -> SolverConfig:
    """Classic LRS-PnP (SVT low-rank prox, no DIP) —
    reference ``main_LRS_PnP.py:217-238``: mu1 = 0.15, mu2 = 0.15*6,
    Nit = 80, 2 outer iterations, alpha = ||H||_2^2, h = T*0.1."""
    cfg = SolverConfig(
        variant="lrs_pnp",
        mu1=0.15,
        mu2=0.15 * 6,
        outer_iters=2,
        sparse=SparseProxConfig(n_iter=80, alpha_mode="specnorm", h_scale=0.1),
        dip=None,
    )
    return dataclasses.replace(cfg, **overrides)


def matlab_preset(**overrides) -> SolverConfig:
    """The MATLAB LRS-PnP twin (A12) — ``main_LRS_PnP.m:57-70`` exactly:
    gamma = 0.5, mu1 = mu2 = 0.15, 13 outer iterations, lambda = 0.1,
    Nit = 80 (``pnp_ista.m``), alpha = max|eig(H^T H)| per pruned block
    (``main_LRS_PnP.m:113``, the specnorm mode), denoiser =
    ``NLmeansfilter(gradient, 3, 3, T*0.1)`` (``pnp_ista.m:30`` — the
    classic wmax-rule NLM, not skimage's fast mode)."""
    cfg = SolverConfig(
        variant="lrs_pnp",
        gamma=0.5,
        mu1=0.15,
        mu2=0.15,
        outer_iters=13,
        sparse=SparseProxConfig(
            n_iter=80,
            alpha_mode="specnorm",
            h_scale=0.1,
            denoiser="nlm_classic",
            backend="xla",  # the fused Pallas kernel implements fast-NLM only
        ),
        dip=None,
    )
    return dataclasses.replace(cfg, **overrides)


def dip_preset(**overrides) -> SolverConfig:
    """LRS-PnP-DIP — reference ``main_LRS_PnP_DIP_pro.py:324-353``:
    mu1 = mu2 = 0.1, Nit = 100, alpha = 4*trace, 250 outer iterations,
    DIP: skip-128 net, Adam lr 0.1, <=5000 iters, ES window 30/patience 60."""
    cfg = SolverConfig(
        variant="dip",
        mu1=0.1,
        mu2=0.1,
        outer_iters=250,
        sparse=SparseProxConfig(n_iter=100, alpha_mode="trace4", h_scale=1.0),
        dip=DipConfig(),
    )
    return dataclasses.replace(cfg, **overrides)


def dip_1lip_preset(**overrides) -> SolverConfig:
    """LRS-PnP-DIP(1-Lip) — reference ``main_LRS_PnP_DIP_1-LiP.py``:
    as `dip` but with the spectral-norm-constrained UNet (ln_lambda=1)."""
    cfg = dataclasses.replace(dip_preset(), variant="dip_1lip", ln_lambda=1.0)
    return dataclasses.replace(cfg, **overrides)


def dip_tuned_preset(**overrides) -> SolverConfig:
    """LRS-PnP-DIP retuned for the framework's own trained dictionary.

    The reference's ``trained_dictionary.mat`` is a missing git-LFS blob
    (SURVEY §0); with a substitute dictionary the faithful mu balance
    over-weights the sparse prior and costs ~3 dB.  The reference itself
    marks these as to-be-tuned ("regularization parameters, they should be
    tuned to obtain the best performance", ``main_LRS_PnP_DIP_pro.py:322``).
    Sweep results (artifacts/tune.jsonl): mu1 0.1->0.01, window-mean DIP
    return, patience 150 recovers 38.8 -> ~41.8 dB on img1."""
    base = dip_preset(mu1=0.01)
    cfg = dataclasses.replace(
        base, dip=dataclasses.replace(base.dip, return_mode="window_mean", patience=150)
    )
    return dataclasses.replace(cfg, **overrides)


def dip_1lip_tuned_preset(**overrides) -> SolverConfig:
    """LRS-PnP-DIP(1-Lip) with the same retuned balance as `dip_tuned`."""
    cfg = dataclasses.replace(dip_tuned_preset(), variant="dip_1lip", ln_lambda=1.0)
    return dataclasses.replace(cfg, **overrides)


def dip_fast_preset(**overrides) -> SolverConfig:
    """Production throughput preset: `dip_tuned` quality with every MXU
    path in bfloat16 — the sparse-prox matmuls
    (``SparseProxConfig.matmul_dtype``) and the DIP forward/backward
    (``DipConfig.compute_dtype``), f32 accumulation/master state
    throughout.  Both fast paths are quality-neutral end-to-end on the
    canonical problems (RESULTS.md bf16 table: 42.865 -> 42.887 dB on
    img1), so this is the preset to serve with when throughput matters."""
    base = dip_tuned_preset()
    cfg = dataclasses.replace(
        base,
        sparse=dataclasses.replace(base.sparse, matmul_dtype="bfloat16"),
        dip=dataclasses.replace(
            base.dip, compute_dtype="bfloat16", es_mode="incremental"
        ),
    )
    return dataclasses.replace(cfg, **overrides)


PRESETS = {
    "lrs_pnp": lrs_pnp_preset,
    "matlab": matlab_preset,
    "dip": dip_preset,
    "dip_1lip": dip_1lip_preset,
    "dip_tuned": dip_tuned_preset,
    "dip_1lip_tuned": dip_1lip_tuned_preset,
    "dip_fast": dip_fast_preset,
}
