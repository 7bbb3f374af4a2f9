"""Generate the reference-style ``results/`` artifact tree.

Mirrors the reference's committed outputs (SURVEY §4): per-iteration
figure panels per sample (``results/<variant>/sample_<img>/<k>.png``
with MPSNR/MSSIM rendered in the figure), the recovered-spectrum ``.npy``
per iteration (``results/spectrum/<variant>/<k>.npy``), and the final
convergence figure.

Usage:
  python scripts/make_results.py --variant dip --image img1 --mask mask1 \
      --iters 30 --out results_tree
"""

import argparse
import faulthandler
import os
import signal
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
faulthandler.register(signal.SIGUSR1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", choices=["lrs_pnp", "dip", "dip_1lip"], default="dip")
    ap.add_argument("--image", default="img1")
    ap.add_argument("--mask", default="mask1")
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--atoms", type=int, default=512)
    ap.add_argument("--out", default="results_tree")
    ap.add_argument("--panel-every", type=int, default=1)
    ap.add_argument("--pixel", type=int, nargs=2, default=(18, 18))
    args = ap.parse_args()

    from lrs_pnp_dip_tpu.data.dictionary import load_trained_dictionary
    from lrs_pnp_dip_tpu.data.io import load_reference_sample
    from lrs_pnp_dip_tpu.solvers import Solver
    from lrs_pnp_dip_tpu.utils.config import PRESETS
    from lrs_pnp_dip_tpu.utils.viz import (
        save_convergence_figure,
        save_iteration_panel,
        save_spectrum,
    )

    sample = load_reference_sample(args.image, args.mask)
    D = load_trained_dictionary(args.atoms)
    cfg = PRESETS[args.variant]()
    solver = Solver(sample, D, cfg)

    panel_dir = os.path.join(args.out, args.variant, f"sample_{args.image}")
    spec_dir = os.path.join(args.out, "spectrum", args.variant)
    os.makedirs(panel_dir, exist_ok=True)
    os.makedirs(spec_dir, exist_ok=True)
    h, w, b = sample.shape

    def cb(i, state, aux):
        print(f"iter {i}: MPSNR {float(aux.mpsnr):.3f}", flush=True)
        if i % args.panel_every == 0:
            save_iteration_panel(
                os.path.join(panel_dir, f"{i}.png"), sample, solver, state, aux
            )
            cube = np.asarray(state.X).reshape(h, w, b)
            save_spectrum(os.path.join(spec_dir, f"{i}.npy"), cube, tuple(args.pixel))

    state, hist = solver.run(n_iters=args.iters, callback=cb)
    save_convergence_figure(
        os.path.join(args.out, args.variant, f"convergence_{args.image}.png"),
        hist["x_dist"], hist["l1_dist"], hist["l2_dist"], hist["mpsnr"],
    )
    print(f"final MPSNR {hist['mpsnr'][-1]:.3f} (best {hist['best_mpsnr']:.3f})")


if __name__ == "__main__":
    main()
