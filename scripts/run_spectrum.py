"""Method-comparison spectrum harness (VERDICT round-1 item 8).

Mirrors the reference's committed ``results/spectrum/{DIP, DeepDecoder,
PnP-DIP, LRS-PnP-DIP-pro, LRS-PnP-DIP-1-Lip}/K.npy`` artifacts: for each
method, the recovered spectrum (all B bands) of one tracked missing pixel
is recorded along the run, so the methods' spectral-recovery behavior can
be compared on one figure.

Methods:
  * DIP          — plain deep-image-prior fit on the masked scene
  * DeepDecoder  — the under-parameterized decoder fit
  * PnP-DIP      — ADMM with the DIP prox + data fidelity only
                   (no sparsity, no explicit low-rank term)
  * LRS-PnP-DIP  — the flagship solver (faithful preset)
  * LRS-PnP-DIP-1-Lip — the Lipschitz-constrained variant

    python scripts/run_spectrum.py [--cpu] [--methods a,b,...]
                                   [--outdir artifacts/spectrum]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pick_tracked_pixel(sample) -> int:
    """First missing pixel in row-major order — a hole the methods must
    hallucinate, the interesting case for spectral recovery."""
    flat = np.asarray(sample.mask).reshape(-1)
    missing = np.flatnonzero(flat == 0)
    return int(missing[0]) if missing.size else 0


def _nets(bands: int, small: bool):
    """(model, input_shape_fn) per fit-style method.  The skip net is
    image-shaped noise-in/image-out; the DeepDecoder upsamples x2 per
    stage, so its input starts at H/2^stages."""
    from lrs_pnp_dip_tpu.models import Skip, dip_skip_128
    from lrs_pnp_dip_tpu.models.deep_decoder import DeepDecoder

    if small:
        skip = Skip(num_output_channels=bands, channels_down=(8, 8),
                    channels_up=(8, 8), channels_skip=(4, 4), pad="reflection")
        dec = DeepDecoder(num_output_channels=bands, channels=(16, 16))
    else:
        skip = dip_skip_128(bands)
        dec = DeepDecoder(num_output_channels=bands, channels=(64, 64))
    n_up = 2
    return (
        (skip, lambda H, W, B: (1, H, W, B)),
        (dec, lambda H, W, B: (1, H >> n_up, W >> n_up, 64 if not small else 16)),
    )


def trace_fit(model, sample, pixel, n_iter, record_every, lr=0.01, seed=0,
              input_shape=None):
    """Plain DIP/DeepDecoder training with a per-``record_every`` spectrum
    trace of the tracked pixel (masked-MSE loss, fixed noise input —
    the classic DIP inpainting recipe, reference ``include/fit.py``)."""
    import jax
    import jax.numpy as jnp
    import optax

    H, W, B = sample.shape
    key = jax.random.PRNGKey(seed)
    k_init, k_noise = jax.random.split(key)
    net_input = 0.1 * jax.random.uniform(
        k_noise, (1, H, W, B) if input_shape is None else input_shape
    )
    target = jnp.asarray(sample.noisy)[None]
    mask = jnp.asarray(sample.mask)[None, ..., None]

    variables = model.init(k_init, net_input)
    params = variables["params"]
    model_state = {k: v for k, v in variables.items() if k != "params"}
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, **model_state}, net_input,
            mutable=list(model_state.keys()),
        )
        return jnp.mean(((out - target) * mask) ** 2), out

    @jax.jit
    def step(p, o):
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss, out

    spectra, iters = [], []
    out = None
    for i in range(n_iter):
        params, opt_state, loss, out = step(params, opt_state)
        if (i + 1) % record_every == 0 or i == n_iter - 1:
            cube = np.asarray(out[0])
            spectra.append(cube.reshape(-1, B)[pixel])
            iters.append(i + 1)
    return np.asarray(spectra), np.asarray(iters), np.asarray(out[0])


def trace_pnp_dip(sample, pixel, outer_iters, dip_cfg=None, seed=0,
                  gamma=0.5, mu2=0.1):
    """PnP-DIP: the ADMM skeleton with ONLY the DIP prox and the
    closed-form fidelity update (no sparse-coding stage, no SVT) —
    X = (gamma*MtY + mu2*U - lambda2) / (gamma*MtM + mu2)."""
    import jax
    import jax.numpy as jnp

    from lrs_pnp_dip_tpu.data.io import matricize
    from lrs_pnp_dip_tpu.models import dip_skip_128
    from lrs_pnp_dip_tpu.solvers.dip import DipConfig, make_dip_fit

    H, W, B = sample.shape
    if dip_cfg is None:
        dip_cfg = DipConfig()
    net = dip_skip_128(B)
    fit = jax.jit(make_dip_fit(net, dip_cfg))

    Y = jnp.asarray(matricize(sample.noisy))
    M = jnp.asarray(np.repeat(np.asarray(sample.mask).reshape(-1, 1), B, axis=1))
    target = jnp.asarray(sample.noisy)[None]
    mask4 = jnp.asarray(sample.mask)[None, ..., None]
    X = Y
    lam2 = jnp.zeros_like(Y)
    key = jax.random.PRNGKey(seed)

    spectra, iters = [], []
    for itr in range(outer_iters):
        key, sub = jax.random.split(key)
        dip_in = (X + lam2 / mu2).reshape(H, W, B)[None]
        res = fit(sub, dip_in, target, mask4)
        U = res.out[0].reshape(-1, B)
        X = (gamma * M * Y + mu2 * U - lam2) / (gamma * M + mu2)
        lam2 = lam2 + mu2 * (X - U)
        spectra.append(np.asarray(X)[pixel])
        iters.append(itr + 1)
    return np.asarray(spectra), np.asarray(iters), np.asarray(X).reshape(H, W, B)


def trace_solver(sample, D, cfg, pixel):
    """Full solver (LRS-PnP-DIP / 1-Lip) with a per-outer-iteration
    spectrum trace via the run callback."""
    from lrs_pnp_dip_tpu.solvers import Solver

    solver = Solver(sample, D, cfg)
    spectra, iters = [], []

    def cb(i, state, aux):
        spectra.append(np.asarray(state.X)[pixel])
        iters.append(i + 1)

    state, hist = solver.run(callback=cb)
    return np.asarray(spectra), np.asarray(iters), solver.result_cube(state)


def run_methods(sample, D, outdir, methods, pixel=None, small=False,
                dip_iters=3000, record_every=100, outer_iters=30):
    """Run the requested methods; write <outdir>/<method>.npy (the spectrum
    trace, (n_records, B)) + <method>_iters.npy, and return the final
    spectra dict."""
    import dataclasses

    from lrs_pnp_dip_tpu.utils.config import dip_1lip_preset, dip_preset

    os.makedirs(outdir, exist_ok=True)
    pixel = pick_tracked_pixel(sample) if pixel is None else pixel
    H, W, bands = sample.shape
    (skip_net, skip_in), (dec_net, dec_in) = _nets(bands, small)
    finals = {}
    for m in methods:
        if m == "DIP":
            spec, iters, cube = trace_fit(
                skip_net, sample, pixel, dip_iters, record_every,
                input_shape=skip_in(H, W, bands),
            )
        elif m == "DeepDecoder":
            spec, iters, cube = trace_fit(
                dec_net, sample, pixel, dip_iters, record_every,
                input_shape=dec_in(H, W, bands),
            )
        elif m == "PnP-DIP":
            spec, iters, cube = trace_pnp_dip(sample, pixel, outer_iters)
        elif m in ("LRS-PnP-DIP", "LRS-PnP-DIP-1-Lip"):
            preset = dip_preset if m == "LRS-PnP-DIP" else dip_1lip_preset
            cfg = preset(outer_iters=outer_iters)
            spec, iters, cube = trace_solver(sample, D, cfg, pixel)
        else:
            raise ValueError(f"unknown method {m}")
        np.save(os.path.join(outdir, f"{m}.npy"), spec)
        np.save(os.path.join(outdir, f"{m}_iters.npy"), iters)
        finals[m] = spec[-1]
        print(f"[spectrum] {m}: {spec.shape[0]} records -> {outdir}/{m}.npy")
    return finals, pixel


def save_figure(sample, finals, pixel, outdir):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    B = sample.shape[2]
    fig, ax = plt.subplots(figsize=(8, 4.5))
    if sample.clean is not None:
        clean_spec = np.asarray(sample.clean).reshape(-1, B)[pixel]
        ax.plot(clean_spec, "k--", lw=2, label="ground truth")
    for m, spec in finals.items():
        ax.plot(spec, lw=1.2, label=m)
    ax.set_xlabel("band")
    ax.set_ylabel("reflectance")
    ax.set_title(f"Recovered spectrum at missing pixel #{pixel}")
    ax.legend(fontsize=8)
    path = os.path.join(outdir, "comparison.png")
    fig.savefig(path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    print(f"[spectrum] figure -> {path}")


ALL_METHODS = ["DIP", "DeepDecoder", "PnP-DIP", "LRS-PnP-DIP", "LRS-PnP-DIP-1-Lip"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--methods", default=",".join(ALL_METHODS))
    ap.add_argument("--outdir", default=os.path.join("artifacts", "spectrum"))
    ap.add_argument("--outer-iters", type=int, default=40)
    ap.add_argument("--dip-iters", type=int, default=3000)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from lrs_pnp_dip_tpu.data.io import load_reference_sample, reference_data_available
    from lrs_pnp_dip_tpu.data.masks import synthetic_sample

    if reference_data_available():
        sample = load_reference_sample("img1", "mask1")
    else:
        sample = synthetic_sample(36, 36, 128, missing=0.1, seed=0)
    dict_path = os.path.join("artifacts", "dictionary_36x36_k512.npz")
    if os.path.exists(dict_path):
        D = np.load(dict_path)["dictionary"].astype(np.float32)
    else:
        # no shipped artifact on this checkout: learn a mask-aware
        # dictionary from the sample's own observed pixels so the harness
        # runs anywhere (VERDICT r2 weak #6)
        from lrs_pnp_dip_tpu.data.dictionary import (
            extract_training_patches,
            learn_dictionary,
        )

        print("[spectrum] no dictionary artifact; learning one from the "
              "sample's observed pixels ...")
        patches, mask_patches = extract_training_patches(
            [sample.noisy], 36, stride=2, masks=[sample.mask]
        )
        D = np.asarray(
            learn_dictionary(patches, n_atoms=256, n_outer=10,
                             mask_patches=mask_patches),
            np.float32,
        )

    finals, pixel = run_methods(
        sample, D, args.outdir, args.methods.split(","),
        dip_iters=args.dip_iters, outer_iters=args.outer_iters,
    )
    save_figure(sample, finals, pixel, args.outdir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
