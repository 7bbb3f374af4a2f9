"""Run the assembled MATLAB-twin experiment (A12, ``main_LRS_PnP.m:4-202``).

Reproduces the original MATLAB LRS-PnP experiment end-to-end: a
Chikusei-style 36x36x128 crop (synthetic stand-in — the reference's
``Chikusei.mat`` is a missing git-LFS blob), sigma=0.12 gaussian noise,
the hand-built strip masks (66 dead pixels), and 13 ADMM iterations with
mu1 = mu2 = 0.15, Nit = 80, per-block specnorm alpha and the classic
``NLmeansfilter`` denoiser.

    python scripts/run_matlab_twin.py [--cpu] [--dictionary PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU")
    ap.add_argument("--dictionary", default=None, help=".npz with a 'dictionary'")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--out", default=os.path.join("artifacts", "runs", "matlab_twin.jsonl")
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from lrs_pnp_dip_tpu.data.dictionary import extract_training_patches, learn_dictionary
    from lrs_pnp_dip_tpu.data.io import matricize
    from lrs_pnp_dip_tpu.data.masks import matlab_twin_sample
    from lrs_pnp_dip_tpu.ops.metrics import mpsnr
    from lrs_pnp_dip_tpu.solvers import Solver
    from lrs_pnp_dip_tpu.utils.config import matlab_preset

    sample = matlab_twin_sample(seed=args.seed)
    if args.dictionary:
        D = np.load(args.dictionary)["dictionary"].astype(np.float32)
    else:
        # the MATLAB run loads its (lost) trained dictionary; train a
        # substitute on the observed pixels of this scene (self-supervised,
        # mask-aware — no ground-truth access)
        patches, mask_patches = extract_training_patches(
            [sample.noisy], 36, stride=4, masks=[sample.mask]
        )
        D = learn_dictionary(patches, n_atoms=256, seed=0, mask_patches=mask_patches)
    cfg = matlab_preset()
    import jax.numpy as jnp

    inp = float(mpsnr(jnp.asarray(sample.clean), jnp.asarray(sample.noisy)))
    print(f"[matlab_twin] input MPSNR {inp:.3f} dB "
          f"(mask kills {int((sample.mask == 0).sum())} of 1296 pixels)")

    solver = Solver(sample, D, cfg)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    rows = []

    def cb(i, state, aux):
        row = {"iter": i, "mpsnr": float(aux.mpsnr), "ssim": float(aux.ssim)}
        rows.append(row)
        print(f"[matlab_twin] iter {i + 1:2d}/13  MPSNR {row['mpsnr']:.3f}  "
              f"SSIM {row['ssim']:.4f}")

    state, hist = solver.run(callback=cb)
    with open(args.out, "w") as f:
        f.write(json.dumps({"meta": {"preset": "matlab", "seed": args.seed,
                                     "input_mpsnr": inp}}) + "\n")
        for row in rows:
            f.write(json.dumps(row) + "\n")
    best = max(r["mpsnr"] for r in rows)
    print(f"[matlab_twin] best MPSNR {best:.3f} dB (input {inp:.3f}, "
          f"gain {best - inp:+.3f}); trajectory -> {args.out}")
    return 0 if best > inp else 1


if __name__ == "__main__":
    sys.exit(main())
