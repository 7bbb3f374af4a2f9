"""Round-3 follow-on TPU experiments (run AFTER scripts/tpu_round3.py).

Three targeted additions on top of the main round-3 measurement session:

  tuned_dict — the tuned presets combined with the per-image dictionaries
               trained by the gap phase (cached in artifacts/dicts_r3/).
               The round-1/2 tuned table loses to the reference's figure
               on exactly one cell (img4: 41.102 vs 41.167 dB); the 'self'
               dictionary (mask-aware, trained only on the test scene's
               OBSERVED pixels — no ground-truth access) and the 'loo'
               dictionary (K-SVD on the other four clean crops — never the
               test image) are both leak-free ways to specialise the
               sparse prior per scene.
  bf16       — quality validation of the bf16-MXU fast paths: one faithful
               DIP run with (a) the sparse prox matmuls in bfloat16
               (SparseProxConfig.matmul_dtype) and (b) additionally the
               DIP net in mixed precision (DipConfig.compute_dtype).
               Supports the bench's bf16 kernel variant with end-to-end
               evidence that the fast path is quality-neutral.
  ceiling    — sparse-stage reconstruction ceilings for the tuned-dict
               problems (summary cross-check for the tuned_dict runs).

Usage:  python -u scripts/tpu_round3b.py [--phases tuned_dict,bf16]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from tpu_round3 import (  # noqa: E402  (reuse the session helpers + resume)
    ART,
    RUNS,
    _sparse_stage_mpsnr,
    _summary,
    _train_dict,
    log,
    run_solver,
    start_wedge_watchdog,
)


def phase_tuned_dict():
    from lrs_pnp_dip_tpu.data.io import load_reference_pair
    from lrs_pnp_dip_tpu.utils.config import PRESETS

    for img in ("img4", "img5"):
        sample = load_reference_pair(img)
        for kind in ("self", "loo"):
            try:
                D = _train_dict(kind, img)
            except Exception as e:
                log(f"dict {kind}/{img} FAILED: {type(e).__name__}: {e}")
                continue
            for variant in ("dip_tuned", "dip_1lip_tuned"):
                tag = f"{variant}_dict_{kind}_{img}"
                try:
                    best = run_solver(tag, sample, D, PRESETS[variant](), 250)
                    _summary({tag: best})
                except Exception as e:
                    log(f"{tag} FAILED: {type(e).__name__}: {e}")


def phase_bf16():
    from lrs_pnp_dip_tpu.data.dictionary import load_trained_dictionary
    from lrs_pnp_dip_tpu.data.io import load_reference_pair
    from lrs_pnp_dip_tpu.utils.config import dip_preset

    D = load_trained_dictionary(512)
    sample = load_reference_pair("img1")
    base = dip_preset()
    variants = {
        "bf16sparse": dataclasses.replace(
            base, sparse=dataclasses.replace(base.sparse, matmul_dtype="bfloat16")
        ),
        "bf16full": dataclasses.replace(
            base,
            sparse=dataclasses.replace(base.sparse, matmul_dtype="bfloat16"),
            dip=dataclasses.replace(base.dip, compute_dtype="bfloat16"),
        ),
    }
    for name, cfg in variants.items():
        tag = f"dip_{name}_img1"
        try:
            best = run_solver(tag, sample, D, cfg, 250)
            _summary({tag: best})
        except Exception as e:
            log(f"{tag} FAILED: {type(e).__name__}: {e}")


def phase_ceiling():
    """Decompose the ~34.7-35.1 dB sparse-stage ceiling measured by the
    gap phase (flat across shipped/self/loo/ORACLE dictionaries): is it a
    dictionary-expressiveness cap or the ISTA shrinkage floor at the
    reference's operating point (lambda=0.1, NLM h=T,
    ``main_LRS_PnP_DIP_pro.py:190-199``)?

      (a) lambda sweep with the oracle dictionary — if the ceiling rises as
          lambda -> 0, the cap is shrinkage, and NO dictionary at the
          reference's lambda could express the scene better;
      (b) atoms = the clean patches themselves (perfectly expressive
          "dictionary" at K = n_patches) at the faithful lambda;
      (c) K sweep of oracle K-SVD dictionaries (512 vs 1024 vs 2048).
    """
    import dataclasses as dc

    from lrs_pnp_dip_tpu.data.dictionary import extract_training_patches
    from lrs_pnp_dip_tpu.data.io import load_reference_pair
    from lrs_pnp_dip_tpu.utils.config import dip_preset

    path = os.path.join(RUNS, "dict_ceiling.json")
    ceilings = {}
    if os.path.exists(path):
        with open(path) as f:
            ceilings = json.load(f)

    def record(key, D, cfg_sparse, sample):
        if key in ceilings:
            return
        try:
            ceil = _sparse_stage_mpsnr(sample, D, cfg_sparse, sample.clean)
            ceilings[key] = {"clean_input_mpsnr": ceil}
            with open(path, "w") as f:
                json.dump(ceilings, f, indent=1)
            log(f"ceiling {key}: clean-input {ceil:.3f} dB")
        except Exception as e:
            log(f"ceiling {key} FAILED: {type(e).__name__}: {e}")

    base = dip_preset().sparse
    for img in ("img4", "img5"):
        sample = load_reference_pair(img)
        oracle = _train_dict("oracle", img)
        # (a) lambda sweep, oracle dictionary
        for lam in (0.03, 0.01, 0.001):
            record(f"{img}/oracle_lam{lam}", oracle,
                   dc.replace(base, lambda_ista=lam), sample)
        # (b) perfectly expressive dictionary: the clean patches themselves
        patches = extract_training_patches([sample.clean], 36, stride=1)
        atoms = patches / np.maximum(np.linalg.norm(patches, axis=0), 1e-8)
        record(f"{img}/cleanpatches_lam0.1", atoms.astype(np.float32),
               base, sample)
        record(f"{img}/cleanpatches_lam0.01", atoms.astype(np.float32),
               dc.replace(base, lambda_ista=0.01), sample)
        # (c) K sweep of oracle K-SVD dictionaries
        for k in (1024, 2048):
            try:
                D = _train_dict("oracle", img, n_atoms=k)
            except Exception as e:
                log(f"dict oracle-k{k}/{img} FAILED: {type(e).__name__}: {e}")
                continue
            record(f"{img}/oracle_k{k}", D, base, sample)


def phase_convergence():
    """Round-3b finding: the sparse-stage ceiling (~34.7 dB on img4) is
    IDENTICAL for every dictionary and every lambda — so it is neither a
    dictionary-expressiveness nor a shrinkage cap.  Remaining suspect: ISTA
    convergence.  The reference's step rule alpha = 4*trace(H^T H) = 4K for
    unit-norm atoms (``main_LRS_PnP_DIP_pro.py:190``) shrinks the step as
    the dictionary grows, so 100 iterations converge far less at K=512 than
    at small K.  Test: (a) ceiling vs n_iter at K=512, (b) ceiling vs K at
    the faithful operating point, (c) full faithful solves with the best
    small-K dictionaries (leak-free 'self' variant included).
    """
    import dataclasses as dc

    from lrs_pnp_dip_tpu.data.io import load_reference_pair
    from lrs_pnp_dip_tpu.utils.config import PRESETS, dip_preset

    path = os.path.join(RUNS, "dict_ceiling.json")
    ceilings = {}
    if os.path.exists(path):
        with open(path) as f:
            ceilings = json.load(f)

    def record(key, D, cfg_sparse, sample):
        if key in ceilings:
            return
        try:
            ceil = _sparse_stage_mpsnr(sample, D, cfg_sparse, sample.clean)
            ceilings[key] = {"clean_input_mpsnr": ceil}
            with open(path, "w") as f:
                json.dump(ceilings, f, indent=1)
            log(f"ceiling {key}: clean-input {ceil:.3f} dB")
        except Exception as e:
            log(f"ceiling {key} FAILED: {type(e).__name__}: {e}")

    base = dip_preset().sparse
    samples = {img: load_reference_pair(img) for img in ("img4", "img5")}
    # (a) convergence sweep at K=512 (oracle dict, faithful step rule)
    oracle4 = _train_dict("oracle", "img4")
    for n in (400, 1600):
        record(f"img4/oracle_nit{n}", oracle4, dc.replace(base, n_iter=n),
               samples["img4"])
    # specnorm step rule (the plain-LRS variant's alpha = ||H||^2,
    # main_LRS_PnP.py:134 — much larger steps than 4*trace)
    record("img4/oracle_specnorm", oracle4,
           dc.replace(base, alpha_mode="specnorm"), samples["img4"])
    # (b) K sweep at the faithful operating point
    small = {}
    for img in ("img4", "img5"):
        for kind in ("oracle", "self"):
            for k in (64, 128, 256):
                try:
                    small[(img, kind, k)] = _train_dict(kind, img, n_atoms=k)
                except Exception as e:
                    log(f"dict {kind}-k{k}/{img} FAILED: {type(e).__name__}: {e}")
                    continue
                record(f"{img}/{kind}_k{k}", small[(img, kind, k)], base,
                       samples[img])
    # (c) full faithful solves — only where the ceiling actually moved
    # (>= +1 dB over the K=512 ceiling), and only the best K per (img, kind)
    base_ceiling = {"img4": 34.78, "img5": 35.09}
    for img in ("img4", "img5"):
        for kind in ("self", "oracle"):
            best_k, best_c = None, base_ceiling[img] + 1.0
            for k in (64, 128, 256):
                rec = ceilings.get(f"{img}/{kind}_k{k}")
                if rec and rec["clean_input_mpsnr"] >= best_c:
                    best_k, best_c = k, rec["clean_input_mpsnr"]
            if best_k is None:
                log(f"convergence: no small-K {kind} dictionary lifts the "
                    f"{img} ceiling by >=1 dB; skipping full solves")
                continue
            D = small[(img, kind, best_k)]
            for variant in ("dip", "dip_1lip"):
                tag = f"{variant}_dict_{kind}k{best_k}_{img}"
                try:
                    best = run_solver(tag, samples[img], D,
                                      PRESETS[variant](), 250)
                    _summary({tag: best})
                except Exception as e:
                    log(f"{tag} FAILED: {type(e).__name__}: {e}")


PHASES = {
    "tuned_dict": phase_tuned_dict,
    "bf16": phase_bf16,
    "ceiling": phase_ceiling,
    "convergence": phase_convergence,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phases", default="tuned_dict,bf16,ceiling")
    args = ap.parse_args()
    start_wedge_watchdog()
    os.makedirs(RUNS, exist_ok=True)
    import jax

    log(f"=== round-3b TPU session start (devices: {jax.devices()}) ===")
    for name in args.phases.split(","):
        log(f"--- phase {name} ---")
        import time

        t0 = time.time()
        try:
            PHASES[name]()
        except Exception as e:
            import traceback

            log(f"phase {name} FAILED: {type(e).__name__}: {e}")
            traceback.print_exc()
        log(f"--- phase {name} done in {time.time()-t0:.0f}s ---")
    log("=== round-3b TPU session done ===")


if __name__ == "__main__":
    main()
