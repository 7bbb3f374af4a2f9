"""Round-3 TPU measurement session — one long-lived process, serial phases.

Everything TPU-side for the round runs inside this single process (the
axon tunnel grants the chip exclusively per process, CLAUDE.md), with a
wedge watchdog and per-phase resume.  Phases:

  quality  — re-run the FULL quality suite (every preset x every canonical
             image/mask pair) on the round-2-fixed solver code into a fresh
             ``artifacts/runs_r3/`` tree (VERDICT r2 weak #2 / next #1: the
             committed table predated the find_best + mask-aware-dictionary
             fixes of commit 7c3536e).
  gap      — the img4/img5 faithful-preset gap experiments (VERDICT next
             #1): per-image dictionaries (self-supervised mask-aware,
             leave-one-out clean, and oracle clean-self), a dictionary
             reconstruction-ceiling oracle for every (image, dictionary),
             and an early-stop sweep under the faithful mu's — enough to
             close the gap or attribute it to the lost
             ``trained_dictionary.mat`` with measurements.
  spectrum — the five-method spectrum comparison at full budget on img1
             (VERDICT next #2a), mirroring the reference's committed
             ``results/spectrum/{method}/K.npy``.
  twin     — the full 13-iteration MATLAB-twin experiment (VERDICT next
             #2b; ``main_LRS_PnP.m:67,82-202``).
  heldout  — tuned presets evaluated on problems NOT used by any tuning
             sweep: fresh masks + fresh noise on the clean crops
             (VERDICT next #7).
  profile  — a jax.profiler capture of the fused ISTA kernel + one DIP
             step; measured kernel time reconciled against the analytic
             CostEstimate (VERDICT next #9) -> artifacts/profile/.

Usage:  python -u scripts/tpu_round3.py [--phases quality,gap,...]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
ART = os.path.join(ROOT, "artifacts")
RUNS = os.path.join(ART, "runs_r3")
REV = "r3"  # salt so round-2 run files are never mistaken for round-3 ones

_last_progress = [time.time()]


def log(msg):
    _last_progress[0] = time.time()
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def start_wedge_watchdog(stall_s: float = 1500.0):
    def watch():
        while True:
            time.sleep(60)
            if time.time() - _last_progress[0] > stall_s:
                print(f"[watchdog] no progress in {stall_s:.0f}s — tunnel "
                      "wedged, exiting 3", flush=True)
                os._exit(3)

    threading.Thread(target=watch, daemon=True).start()


def _stamp(cfg, D):
    import hashlib

    h = hashlib.sha256()
    h.update(REV.encode())
    h.update(repr(cfg).encode())
    h.update(np.ascontiguousarray(D, dtype=np.float32).tobytes())
    return h.hexdigest()[:16]


def _read_rows(path):
    rows, meta = [], None
    if not os.path.exists(path):
        return rows, meta
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "meta" in rec:
                meta = rec["meta"]
            else:
                rows.append(rec)
    return rows, meta


def run_solver(tag, sample, D, cfg, n_iters, out_dir=RUNS):
    """One full solve with per-iteration jsonl logging; resumable by stamp."""
    from lrs_pnp_dip_tpu.solvers import Solver

    stamp = _stamp(cfg, D)
    path = os.path.join(out_dir, f"{tag}.jsonl")
    rows, meta = _read_rows(path)
    if len(rows) >= n_iters and meta is not None and meta.get("stamp") == stamp:
        best = max(rows, key=lambda r: r["mpsnr"])
        log(f"{tag}: already complete ({len(rows)} iters), skipping")
        return best
    solver = Solver(sample, D, cfg)
    state = solver.init_state()
    best = None
    t0 = time.time()
    os.makedirs(out_dir, exist_ok=True)
    with open(path, "w") as f:
        f.write(json.dumps({"meta": {"stamp": stamp, "tag": tag, "rev": REV,
                                     "n_atoms": int(D.shape[1])}}) + "\n")
        for i in range(n_iters):
            state, aux = solver.step(state)
            rec = {"iter": i, "mpsnr": float(aux.mpsnr), "ssim": float(aux.ssim),
                   "dip_iters": int(aux.dip_iters)}
            f.write(json.dumps(rec) + "\n")
            if best is None or rec["mpsnr"] > best["mpsnr"]:
                best = rec
            if i % 50 == 0 or i == n_iters - 1:
                f.flush()
                log(f"{tag} iter {i}: MPSNR {rec['mpsnr']:.3f} "
                    f"SSIM {rec['ssim']:.4f}")
    log(f"{tag} DONE in {time.time()-t0:.0f}s: best MPSNR {best['mpsnr']:.3f} "
        f"(iter {best['iter']}) SSIM {best['ssim']:.4f}")
    return best


def _summary(update: dict):
    path = os.path.join(RUNS, "summary.json")
    summary = {}
    if os.path.exists(path):
        with open(path) as f:
            summary = json.load(f)
    summary.update(update)
    os.makedirs(RUNS, exist_ok=True)
    with open(path, "w") as f:
        json.dump(summary, f, indent=1)


# --------------------------------------------------------------- quality


def phase_quality():
    from lrs_pnp_dip_tpu.data.dictionary import load_trained_dictionary
    from lrs_pnp_dip_tpu.data.io import load_reference_pair
    from lrs_pnp_dip_tpu.utils.config import PRESETS

    D = load_trained_dictionary(512)
    images = ("img1", "img2", "img3", "img4", "img5")
    plan = []
    for v in ("dip", "dip_1lip", "dip_tuned", "dip_1lip_tuned"):
        for img in images:
            plan.append((v, img, 250))
    for img in images:
        plan.append(("lrs_pnp", img, 2))
    for variant, img, n in plan:
        tag = f"{variant}_{img}"
        try:
            sample = load_reference_pair(img)
            best = run_solver(tag, sample, D, PRESETS[variant](), n)
            _summary({tag: best})
        except Exception as e:
            log(f"{tag} FAILED: {type(e).__name__}: {e}")


# ------------------------------------------------------------------ gap


def _train_dict(kind, img, n_atoms=512, seed=0):
    """Train one experiment dictionary; cached under artifacts/dicts_r3/."""
    from lrs_pnp_dip_tpu.data.dictionary import (
        extract_training_patches,
        learn_dictionary,
    )
    from lrs_pnp_dip_tpu.data.io import (
        REFERENCE_IMAGES,
        load_reference_pair,
        load_reference_sample,
    )

    cache = os.path.join(ART, "dicts_r3", f"{kind}_{img}_k{n_atoms}.npz")
    if os.path.exists(cache):
        return np.load(cache)["dictionary"].astype(np.float32)
    t0 = time.time()
    if kind == "self":
        # Self-supervised: mask-aware learning on the OBSERVED pixels of the
        # test scene itself (no ground-truth access — the legitimate setting).
        s = load_reference_pair(img)
        patches, mask_patches = extract_training_patches(
            [s.noisy], 36, stride=1, masks=[s.mask]
        )
        D = learn_dictionary(patches, n_atoms=n_atoms, lam=0.02, n_outer=30,
                             sparse_iters=40, seed=seed, mask_patches=mask_patches)
    elif kind == "loo":
        # Leave-one-out: K-SVD on the other four CLEAN crops (clean data of
        # the same scene family, but never the test image — leak-free).
        cubes = [load_reference_sample(other, "mask1").clean
                 for other in REFERENCE_IMAGES if other != img]
        patches = extract_training_patches(cubes, 36, stride=1)
        D = learn_dictionary(patches, n_atoms=n_atoms, lam=0.02, n_outer=30,
                             sparse_iters=40, seed=seed, method="ksvd")
    elif kind == "oracle":
        # Attribution only: K-SVD on the test image's own clean cube — an
        # upper bound on what ANY dictionary of this size could do here.
        cubes = [load_reference_sample(img, "mask1").clean]
        patches = extract_training_patches(cubes, 36, stride=1)
        D = learn_dictionary(patches, n_atoms=n_atoms, lam=0.02, n_outer=30,
                             sparse_iters=40, seed=seed, method="ksvd")
    else:
        raise ValueError(kind)
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    np.savez_compressed(cache, dictionary=np.asarray(D, np.float32))
    log(f"dict {kind}/{img}: trained in {time.time()-t0:.0f}s "
        f"({D.shape[0]}x{D.shape[1]})")
    return np.asarray(D, np.float32)


def _sparse_stage_mpsnr(sample, D, cfg_sparse, input_cube):
    """Reconstruction quality of the sparse stage ALONE: code ``input_cube``
    blocks (with the real observation mask) and measure the scattered
    reconstruction against the clean cube.  With ``input_cube = clean`` this
    is the dictionary's reconstruction CEILING for this scene — the solver
    can never recover detail the dictionary cannot represent (VERDICT r2:
    'run the oracle experiment to bound the dictionary loss')."""
    import jax.numpy as jnp

    from lrs_pnp_dip_tpu.data.io import matricize, unmatricize
    from lrs_pnp_dip_tpu.ops.blocks import block_grid, extract_blocks, scatter_blocks
    from lrs_pnp_dip_tpu.ops.ista import sparse_prox
    from lrs_pnp_dip_tpu.ops.metrics import mpsnr

    H, W, B = sample.shape
    grid = block_grid((H * W, B), 36, 36)
    Y = jnp.asarray(matricize(input_cube))
    mask2d = jnp.asarray(
        np.broadcast_to(sample.mask.reshape(-1, 1), (H * W, B)).copy()
    )
    mask_blocks = extract_blocks(mask2d, grid)
    blocks = extract_blocks(Y, grid)
    phi = sparse_prox(blocks, mask_blocks, jnp.asarray(D), cfg_sparse)
    recon = scatter_blocks(phi, grid) / grid.weight()
    return float(mpsnr(jnp.asarray(sample.clean), unmatricize(recon, H, W)))


def phase_gap():
    from lrs_pnp_dip_tpu.data.dictionary import load_trained_dictionary
    from lrs_pnp_dip_tpu.data.io import load_reference_pair
    from lrs_pnp_dip_tpu.utils.config import DipConfig, dip_preset

    ceiling_path = os.path.join(RUNS, "dict_ceiling.json")
    ceilings = {}
    if os.path.exists(ceiling_path):
        with open(ceiling_path) as f:
            ceilings = json.load(f)

    shipped = load_trained_dictionary(512)
    cfg = dip_preset()
    for img in ("img4", "img5"):
        sample = load_reference_pair(img)
        dicts = {"shipped": shipped}
        for kind in ("self", "loo", "oracle"):
            try:
                dicts[kind] = _train_dict(kind, img)
            except Exception as e:
                log(f"dict {kind}/{img} FAILED: {type(e).__name__}: {e}")
        # (a) reconstruction-ceiling oracle per dictionary
        for kind, D in dicts.items():
            key = f"{img}/{kind}"
            if key not in ceilings:
                try:
                    ceil = _sparse_stage_mpsnr(sample, D, cfg.sparse, sample.clean)
                    noisy_rec = _sparse_stage_mpsnr(sample, D, cfg.sparse, sample.noisy)
                    ceilings[key] = {"clean_input_mpsnr": ceil,
                                     "noisy_input_mpsnr": noisy_rec}
                    with open(ceiling_path, "w") as f:
                        json.dump(ceilings, f, indent=1)
                    log(f"ceiling {key}: clean-input {ceil:.3f} dB, "
                        f"noisy-input {noisy_rec:.3f} dB")
                except Exception as e:
                    log(f"ceiling {key} FAILED: {type(e).__name__}: {e}")
        # (b) faithful-preset runs with each candidate dictionary
        for kind in ("self", "loo", "oracle"):
            if kind not in dicts:
                continue
            tag = f"dip_dict_{kind}_{img}"
            try:
                best = run_solver(tag, sample, dicts[kind], cfg, 250)
                _summary({tag: best})
            except Exception as e:
                log(f"{tag} FAILED: {type(e).__name__}: {e}")
        # (c) early-stop sweep under the FAITHFUL mu's (shipped dictionary):
        # separates 'ES return policy' loss from 'dictionary' loss.
        for es_tag, patience, ret in (("pat150", 150, "last"),
                                      ("wmean", 60, "window_mean")):
            tag = f"dip_es_{es_tag}_{img}"
            cfg_es = dataclasses.replace(
                cfg, dip=dataclasses.replace(
                    DipConfig(), patience=patience, return_mode=ret))
            try:
                best = run_solver(tag, sample, shipped, cfg_es, 250)
                _summary({tag: best})
            except Exception as e:
                log(f"{tag} FAILED: {type(e).__name__}: {e}")
        # (d) faithful run with the best self-supervised dictionary AND the
        # 1-Lip variant, for the like-for-like table
        if "self" in dicts:
            from lrs_pnp_dip_tpu.utils.config import dip_1lip_preset

            tag = f"dip_1lip_dict_self_{img}"
            try:
                best = run_solver(tag, sample, dicts["self"], dip_1lip_preset(), 250)
                _summary({tag: best})
            except Exception as e:
                log(f"{tag} FAILED: {type(e).__name__}: {e}")


# ------------------------------------------------------------- spectrum


def phase_spectrum():
    from run_spectrum import ALL_METHODS, run_methods, save_figure

    from lrs_pnp_dip_tpu.data.dictionary import load_trained_dictionary
    from lrs_pnp_dip_tpu.data.io import load_reference_pair

    sample = load_reference_pair("img1")
    D = load_trained_dictionary(512)
    outdir = os.path.join(ART, "spectrum")
    done = [m for m in ALL_METHODS
            if os.path.exists(os.path.join(outdir, f"{m}.npy"))]
    todo = [m for m in ALL_METHODS if m not in done]
    log(f"spectrum: done={done} todo={todo}")
    if todo:
        run_methods(sample, D, outdir, todo, dip_iters=3000, record_every=100,
                    outer_iters=40)
    finals = {m: np.load(os.path.join(outdir, f"{m}.npy"))[-1]
              for m in ALL_METHODS
              if os.path.exists(os.path.join(outdir, f"{m}.npy"))}
    from run_spectrum import pick_tracked_pixel

    save_figure(sample, finals, pick_tracked_pixel(sample), outdir)


# ----------------------------------------------------------------- twin


def phase_twin():
    import run_matlab_twin

    out = os.path.join(ART, "runs", "matlab_twin.jsonl")
    rows, _ = _read_rows(out)
    if len(rows) >= 13:
        log("matlab twin: already complete, skipping")
        return
    argv = sys.argv
    sys.argv = ["run_matlab_twin.py", "--out", out]
    try:
        rc = run_matlab_twin.main()
        log(f"matlab twin rc={rc}")
    finally:
        sys.argv = argv


# -------------------------------------------------------------- heldout


def phase_heldout():
    """Tuned presets on problems never seen by any tuning sweep: fresh
    bernoulli + strip masks and fresh noise over the clean crops."""
    from lrs_pnp_dip_tpu.data.dictionary import load_trained_dictionary
    from lrs_pnp_dip_tpu.data.io import HsiSample, load_reference_sample
    from lrs_pnp_dip_tpu.data.masks import bernoulli_mask, corrupt, matlab_strip_mask
    from lrs_pnp_dip_tpu.utils.config import PRESETS

    D = load_trained_dictionary(512)
    problems = []
    for img, mask_kind, seed in (("img1", "bernoulli", 101),
                                 ("img3", "strips", 202),
                                 ("img5", "bernoulli", 303)):
        clean = load_reference_sample(img, "mask1").clean
        if mask_kind == "bernoulli":
            mask = bernoulli_mask((36, 36), keep_prob=0.75, seed=seed)
        else:
            mask = matlab_strip_mask((36, 36))
        noisy = corrupt(clean, mask, noise_sigma=0.12, seed=seed + 7)
        problems.append(HsiSample(noisy=noisy, mask=mask, clean=clean,
                                  name=f"{img}+heldout_{mask_kind}{seed}"))
    for sample in problems:
        for variant in ("dip", "dip_1lip_tuned"):
            tag = f"heldout_{variant}_{sample.name.split('+')[0]}_{sample.name.split('_')[-1]}"
            try:
                best = run_solver(tag, sample, D, PRESETS[variant](), 250)
                _summary({tag: best})
            except Exception as e:
                log(f"{tag} FAILED: {type(e).__name__}: {e}")


# -------------------------------------------------------------- profile


def phase_profile():
    """jax.profiler capture of (a) the fused ISTA kernel chained scan and
    (b) one DIP fit; extract measured kernel durations from the chrome
    trace and reconcile with the analytic cost model."""
    import glob
    import gzip

    import jax
    import jax.numpy as jnp

    from lrs_pnp_dip_tpu.data.dictionary import load_trained_dictionary
    from lrs_pnp_dip_tpu.data.io import load_reference_pair, matricize
    from lrs_pnp_dip_tpu.ops.blocks import block_grid, extract_blocks
    from lrs_pnp_dip_tpu.ops.ista import SparseProxConfig, sparse_prox
    from lrs_pnp_dip_tpu.utils.profiling import trace

    sample = load_reference_pair("img1")
    D = jnp.asarray(load_trained_dictionary(512))
    Y = jnp.asarray(matricize(sample.noisy))
    grid = block_grid(Y.shape, 36, 36)
    blocks = extract_blocks(Y, grid)
    mask_blocks = (blocks != 0).astype(jnp.float32)
    cfg = SparseProxConfig(n_iter=100, alpha_mode="trace4", backend="pallas")

    chain = 20

    @jax.jit
    def chained(b, m, d):
        def body(carry, _):
            return sparse_prox(carry, m, d, cfg), ()

        out, _ = jax.lax.scan(body, b, None, length=chain)
        return out.sum()

    # warm up (compile outside the trace)
    float(np.asarray(chained(blocks, mask_blocks, D)))

    outdir = os.path.join(ART, "profile")
    os.makedirs(outdir, exist_ok=True)
    t0 = time.perf_counter()
    try:
        with trace(outdir):
            val = float(np.asarray(chained(blocks, mask_blocks, D)))
        wall = time.perf_counter() - t0
        log(f"profile: traced chained prox (chain={chain}) wall {wall:.3f}s")
    except Exception as e:
        log(f"profile: jax.profiler capture failed: {type(e).__name__}: {e}")
        wall = time.perf_counter() - t0

    rec = {"chain": chain, "wall_s_traced_call": wall,
           "n_blocks": grid.n_blocks, "n_ista": cfg.n_iter}
    # Parse the chrome trace for the DEVICE-lane top-level module event.
    # The device timeline is the process whose process_name metadata starts
    # with '/device:'; the whole chained scan appears there as one
    # 'jit_chained(...)' module event (with 'while'/'closed_call' children —
    # name-substring matching on child fusions measures the wrong thing,
    # which is how the first capture printed a 13,000% "MFU").
    module_us = None
    for tj in glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                        recursive=True):
        try:
            with gzip.open(tj, "rt") as f:
                data = json.load(f)
            evs = data.get("traceEvents", [])
            device_pids = {
                ev["pid"] for ev in evs
                if ev.get("ph") == "M" and ev.get("name") == "process_name"
                and str(ev.get("args", {}).get("name", "")).startswith("/device:")
            }
            for ev in evs:
                if (ev.get("ph") == "X" and ev.get("pid") in device_pids
                        and ev.get("name", "").startswith("jit_chained")):
                    module_us = max(module_us or 0.0, float(ev.get("dur", 0)))
        except Exception as e:
            log(f"profile: could not parse {tj}: {e}")
    if module_us:
        per_prox_s = module_us / 1e6 / chain
        P, K = 1296, 512
        flops = 4.0 * grid.n_blocks * P * K * cfg.n_iter
        mfu = flops / per_prox_s / 197e12
        rec["device_module_ms"] = module_us / 1e3
        rec["measured_prox_ms"] = per_prox_s * 1e3
        # plausibility gate (VERDICT r2 weak #1 class): a measured MFU must
        # be a fraction of peak; refuse to record nonsense.
        if 0.0 < mfu < 1.0:
            rec["measured_mfu_vs_bf16_peak"] = mfu
            log(f"profile: measured {rec['measured_prox_ms']:.3f} ms/prox -> "
                f"MFU {mfu*100:.1f}% of bf16 peak (device-lane module event)")
        else:
            rec["invalid_mfu_rejected"] = mfu
            log(f"profile: implausible MFU {mfu*100:.1f}% rejected "
                "(trace parse mismatch); not recording measured_mfu")
    else:
        log("profile: no device-lane module event found in trace "
            "(remote-tunnel backend may not export device timelines); "
            "keeping wall-clock record only")
    with open(os.path.join(outdir, "measured.json"), "w") as f:
        json.dump(rec, f, indent=1)


PHASES = {
    "quality": phase_quality,
    "gap": phase_gap,
    "spectrum": phase_spectrum,
    "twin": phase_twin,
    "heldout": phase_heldout,
    "profile": phase_profile,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phases", default="quality,gap,spectrum,twin,heldout,profile")
    args = ap.parse_args()
    start_wedge_watchdog()
    os.makedirs(RUNS, exist_ok=True)
    import jax

    log(f"=== round-3 TPU session start (devices: {jax.devices()}) ===")
    for name in args.phases.split(","):
        log(f"--- phase {name} ---")
        t0 = time.time()
        try:
            PHASES[name]()
        except Exception as e:
            import traceback

            log(f"phase {name} FAILED: {type(e).__name__}: {e}")
            traceback.print_exc()
        log(f"--- phase {name} done in {time.time()-t0:.0f}s ---")
    log("=== round-3 TPU session done ===")


if __name__ == "__main__":
    main()
