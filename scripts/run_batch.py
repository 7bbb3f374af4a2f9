"""Batched recovery of all reference images x masks in one vmapped engine.

The reference's "batch" workflow was manually editing data paths and
re-running scripts per image (``main_LRS_PnP.py:170-183``).  Here all
problems advance in lockstep through one compiled step
(:class:`lrs_pnp_dip_tpu.solvers.batch.BatchedSolver`).

Usage:
  python scripts/run_batch.py --variant dip --iters 40 \
      [--images img1,img2,...] [--masks mask1,...] [--log out.jsonl]
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
faulthandler.register(signal.SIGUSR1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", choices=["lrs_pnp", "dip", "dip_1lip"], default="dip")
    ap.add_argument("--images", default="img1,img2,img3,img4,img5")
    ap.add_argument("--masks", default=None,
                    help="comma list; default = each image's own baked-in mask")
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--atoms", type=int, default=512)
    ap.add_argument("--log", default=None)
    args = ap.parse_args()

    from lrs_pnp_dip_tpu.data.dictionary import load_trained_dictionary
    from lrs_pnp_dip_tpu.data.io import load_reference_pair, load_reference_sample
    from lrs_pnp_dip_tpu.solvers.batch import BatchedSolver
    from lrs_pnp_dip_tpu.utils.config import PRESETS

    images = args.images.split(",")
    if args.masks is None:
        samples = [load_reference_pair(i) for i in images]
    else:
        masks = args.masks.split(",")
        samples = [load_reference_sample(i, m) for i in images for m in masks]
    names = [s.name for s in samples]
    D = load_trained_dictionary(args.atoms)
    cfg = PRESETS[args.variant]()
    solver = BatchedSolver(samples, D, cfg)
    logf = open(args.log, "a") if args.log else None

    t0 = time.time()

    def cb(i, state, aux):
        m = np.asarray(aux.mpsnr)
        s = np.asarray(aux.ssim)
        print(
            f"iter {i:3d}  " + "  ".join(
                f"{n}:{mi:.2f}/{si:.3f}" for n, mi, si in zip(names, m, s)
            ),
            flush=True,
        )
        if logf:
            logf.write(json.dumps({
                "iter": i, "mpsnr": m.tolist(), "ssim": s.tolist(),
                "names": names,
            }) + "\n")
            logf.flush()

    state, hist = solver.run(n_iters=args.iters, callback=cb)
    dt = time.time() - t0
    best = hist["mpsnr"].max(axis=0)
    print(f"done in {dt:.1f}s")
    for n, b, last_m, last_s in zip(
        names, best, hist["mpsnr"][-1], hist["ssim"][-1]
    ):
        print(f"{n}: final MPSNR {last_m:.3f} (best {b:.3f})  MSSIM {last_s:.4f}")
    if logf:
        logf.close()


if __name__ == "__main__":
    main()
