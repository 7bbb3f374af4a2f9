"""Run a solver variant on a reference image and report MPSNR/MSSIM.

The framework's equivalent of the reference's three entry-point scripts
(``main_LRS_PnP.py`` / ``main_LRS_PnP_DIP_pro.py`` /
``main_LRS_PnP_DIP_1-LiP.py``), with a real CLI instead of hard-coded
paths.

Usage:
  python scripts/run_reference.py --variant dip --image img1 --mask mask1 \
      --iters 40 [--log out.jsonl] [--panels results_dir] [--ensemble 8]
"""

import argparse
import faulthandler
import json
import os
import signal
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> dumps stacks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--variant",
        choices=["lrs_pnp", "matlab", "dip", "dip_1lip",
                 "dip_tuned", "dip_1lip_tuned", "dip_fast"],
        default="dip",
        help="any utils.config.PRESETS key (faithful, tuned, or fast)",
    )
    ap.add_argument("--image", default="img1")
    ap.add_argument("--mask", default="mask1")
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--atoms", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ensemble", type=int, default=0, metavar="N",
                    help="run an N-seed ensemble (seeds seed..seed+N-1) and "
                    "report the ensemble-mean quality")
    ap.add_argument("--ens-chunk", type=int, default=25,
                    help="outer iterations per ensemble dispatch "
                    "(run_chunked); 0 = host-stepped run() fallback")
    ap.add_argument("--log", default=None, help="jsonl metrics output")
    ap.add_argument("--panels", default=None, help="dir for per-iter PNG panels")
    ap.add_argument("--checkpoint", default=None, help="orbax checkpoint dir")
    args = ap.parse_args()

    from lrs_pnp_dip_tpu.data.dictionary import load_trained_dictionary
    from lrs_pnp_dip_tpu.data.io import load_reference_sample
    from lrs_pnp_dip_tpu.solvers import Solver
    from lrs_pnp_dip_tpu.utils.config import PRESETS

    sample = load_reference_sample(args.image, args.mask)
    D = load_trained_dictionary(args.atoms)
    cfg = PRESETS[args.variant](seed=args.seed)

    # input metrics on host (numpy) — keeps the device path to one program
    c, n = sample.clean.astype(np.float64), sample.noisy.astype(np.float64)
    band_mse = ((c - n) ** 2).mean(axis=(0, 1))
    inp_mpsnr = float(np.mean(10 * np.log10(255.0 / np.sqrt(band_mse))))
    print(f"{sample.name}: input MPSNR {inp_mpsnr:.3f}")

    if args.ensemble:
        from lrs_pnp_dip_tpu.solvers import SeedEnsembleSolver

        seeds = list(range(args.seed, args.seed + args.ensemble))
        ens = SeedEnsembleSolver(sample, D, cfg, seeds)
        t0 = time.time()
        if args.ens_chunk > 0:
            state, hist = ens.run_chunked(args.iters, chunk=args.ens_chunk)
        else:
            state, hist = ens.run(args.iters)
        em = np.asarray(hist["ens_mpsnr"])
        best_i = int(np.nanargmax(em))
        spread = ens.spread(hist)
        print(f"done in {time.time()-t0:.1f}s: ensemble-mean best MPSNR "
              f"{em[best_i]:.3f} (iter {best_i}, ssim "
              f"{float(np.asarray(hist['ens_ssim'])[best_i]):.4f}); per-seed "
              f"best mean {spread['mean']:.3f} +- {spread['std']:.3f} "
              f"(max {spread['max']:.3f})")
        if args.log:
            with open(args.log, "a") as f:
                for i in range(len(em)):
                    f.write(json.dumps({
                        "iter": i, "ens_mpsnr": float(em[i]),
                        "mpsnr": np.asarray(hist["mpsnr"])[i].tolist()}) + "\n")
        return

    solver = Solver(sample, D, cfg)
    ckpt = None
    start_state = None
    if args.checkpoint:
        from lrs_pnp_dip_tpu.utils.checkpoint import SolverCheckpointer

        ckpt = SolverCheckpointer(args.checkpoint)
        start_state = ckpt.restore()
        if start_state is not None:
            print(f"resumed from iteration {int(start_state.itr)}")
    logf = open(args.log, "a") if args.log else None
    panels = None
    if args.panels:
        from lrs_pnp_dip_tpu.utils.viz import save_iteration_panel

        os.makedirs(args.panels, exist_ok=True)
        panels = args.panels

    t_start = time.time()
    last = {"t": t_start}

    def cb(i, state, aux):
        now = time.time()
        rec = {
            "iter": i,
            "mpsnr": float(aux.mpsnr),
            "ssim": float(aux.ssim),
            "dip_iters": int(aux.dip_iters),
            "sec": round(now - last["t"], 3),
        }
        last["t"] = now
        print(
            f"iter {i:3d}  MPSNR {rec['mpsnr']:.3f}  MSSIM {rec['ssim']:.4f}  "
            f"dip_iters {rec['dip_iters']:4d}  {rec['sec']:.2f}s"
        )
        if logf:
            logf.write(json.dumps(rec) + "\n")
            logf.flush()
        if panels:
            save_iteration_panel(
                os.path.join(panels, f"{i}.png"), sample, solver, state, aux
            )
        if ckpt is not None:
            ckpt.save(int(state.itr), state)

    state, hist = solver.run(n_iters=args.iters, state=start_state, callback=cb)
    dt = time.time() - t_start
    print(
        f"done in {dt:.1f}s: final MPSNR {hist['mpsnr'][-1]:.3f} "
        f"(best {hist['best_mpsnr']:.3f})  MSSIM {hist['ssim'][-1]:.4f}"
    )
    if logf:
        logf.close()


if __name__ == "__main__":
    main()
