"""Round-5 TPU measurement session — one long-lived process, serial phases.

Everything TPU-side runs inside this single process (the axon tunnel
grants the chip exclusively per process; remote-compile caching is
per-process, CLAUDE.md), with a wedge watchdog and per-phase resume.

Phases:

  ab   — same-session A/B of the ensemble engines (VERDICT r4 #4 done
         criterion): 8-seed faithful ``dip`` on img3, 100 outer
         iterations, host-stepped ``SeedEnsembleSolver.run`` (one dispatch
         per iteration + a second for ensemble metrics) vs
         ``run_chunked`` (one lax.scan of K iterations per dispatch,
         ensemble metrics in the body).  Both warm (compile excluded).
         -> artifacts/runs_r5/ens_ab.json
  pro  — closing/bounding the two PRo rows (VERDICT r4 #5): 8 MORE seeds
         (8..15) of faithful ``dip`` on img2/img3 at 250 iterations
         (combined with the 8 seeds of artifacts/runs_r4/ensemble.json
         -> a 16-seed faithful max), plus the faithful preset with
         ``return_mode='window_mean'`` (8 seeds) as a disclosed
         estimator candidate.  -> artifacts/runs_r5/pro_rows.json

Usage:  python -u scripts/tpu_round5.py [--phases ab,pro]
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
RUNS = os.path.join(ART, "runs_r5")

_last_progress = [time.time()]


def log(msg):
    _last_progress[0] = time.time()
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def start_wedge_watchdog(stall_s: float = float(os.environ.get("R5_STALL", "2400"))):
    def watch():
        while True:
            time.sleep(60)
            if time.time() - _last_progress[0] > stall_s:
                print(f"[watchdog] no progress in {stall_s:.0f}s — tunnel "
                      "wedged, exiting 3", flush=True)
                os._exit(3)

    threading.Thread(target=watch, daemon=True).start()


def _load_json(path):
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def _save_json(path, rec):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)


def _ens_chunked_with_fallback(ens, n_iters, chunks=(10, 5, 2)):
    """run_chunked with decreasing chunk sizes; a chunk program is
    ~chunk x the single vmapped step (the known remote-compiler crash mode
    is the 250x program, commit b32ecc5) — fall back if a size fails."""
    last_err = None
    for chunk in chunks:
        try:
            t0 = time.time()
            final, hist = ens.run_chunked(n_iters, chunk=chunk)
            return final, hist, chunk, time.time() - t0
        except Exception as e:  # compile crash / worker restart
            last_err = e
            log(f"run_chunked(chunk={chunk}) failed: {type(e).__name__}: {e}; "
                f"trying smaller chunk")
    raise last_err


# ------------------------------------------------------------------- ab


def phase_ab():
    from lrs_pnp_dip_tpu.data.dictionary import load_trained_dictionary
    from lrs_pnp_dip_tpu.data.io import load_reference_pair
    from lrs_pnp_dip_tpu.solvers import SeedEnsembleSolver
    from lrs_pnp_dip_tpu.utils.config import PRESETS

    out_path = os.path.join(RUNS, "ens_ab.json")
    rec = _load_json(out_path)
    if "stepped" in rec and "chunked" in rec:
        log(f"ab: cached (stepped {rec['stepped']['wall_s']}s vs "
            f"chunked {rec['chunked']['wall_s']}s)")
        return

    D = load_trained_dictionary(512)
    sample = load_reference_pair("img3")
    cfg = PRESETS["dip"]()
    n_iters = int(os.environ.get("R5_AB_ITERS", "100"))
    seeds = list(range(8))
    ens = SeedEnsembleSolver(sample, D, cfg, seeds)

    # --- host-stepped first (the known-safe path; also warms the single
    # vmapped step + ens-metrics executables) -------------------------
    if "stepped" not in rec:
        log("ab: warming host-stepped engine (compile) ...")
        ens.run(1)
        log("ab: timing host-stepped run ...")
        t0 = time.time()
        final, hist = ens.run(n_iters)
        wall = time.time() - t0
        em = np.asarray(hist["ens_mpsnr"])
        rec["stepped"] = {
            "n_iters": n_iters,
            "n_seeds": len(seeds),
            "wall_s": round(wall, 1),
            "s_per_outer_iter": round(wall / n_iters, 3),
            "ens_best_mpsnr": float(np.nanmax(em)),
        }
        _save_json(out_path, rec)
        log(f"ab stepped: {wall:.1f}s ({wall/n_iters:.2f} s/outer-iter), "
            f"ens best {np.nanmax(em):.3f}")

    # --- chunked ------------------------------------------------------
    if "chunked" not in rec:
        chunk0 = int(os.environ.get("R5_AB_CHUNK", "10"))
        log(f"ab: warming chunked engine (compile, chunk={chunk0}) ...")
        _, _, chunk, warm_wall = _ens_chunked_with_fallback(
            ens, chunk0, chunks=(chunk0, 5, 2)
        )
        log(f"ab: chunked warmed (chunk={chunk}, first call {warm_wall:.0f}s); "
            "timing ...")
        t0 = time.time()
        final, hist = ens.run_chunked(n_iters, chunk=chunk)
        wall = time.time() - t0
        em = np.asarray(hist["ens_mpsnr"])
        rec["chunked"] = {
            "n_iters": n_iters,
            "n_seeds": len(seeds),
            "chunk": chunk,
            "wall_s": round(wall, 1),
            "s_per_outer_iter": round(wall / n_iters, 3),
            "ens_best_mpsnr": float(np.nanmax(em)),
        }
        _save_json(out_path, rec)
        log(f"ab chunked: {wall:.1f}s ({wall/n_iters:.2f} s/outer-iter), "
            f"ens best {np.nanmax(em):.3f}")

    if "stepped" in rec and "chunked" in rec:
        sp = rec["stepped"]["wall_s"] / max(rec["chunked"]["wall_s"], 1e-9)
        rec["_speedup_chunked_vs_stepped"] = round(sp, 3)
        _save_json(out_path, rec)
        log(f"ab: chunked is {sp:.2f}x the host-stepped engine")


# ------------------------------------------------------------------ pro


def phase_pro():
    from lrs_pnp_dip_tpu.data.dictionary import load_trained_dictionary
    from lrs_pnp_dip_tpu.data.io import load_reference_pair
    from lrs_pnp_dip_tpu.solvers import SeedEnsembleSolver
    from lrs_pnp_dip_tpu.utils.config import PRESETS

    out_path = os.path.join(RUNS, "pro_rows.json")
    rec = _load_json(out_path)
    D = load_trained_dictionary(512)
    n_iters = 250

    jobs = []
    for img in ("img2", "img3"):
        jobs.append((f"dip_{img}_seeds8to15", img, "faithful", list(range(8, 16))))
        jobs.append((f"dip_wm_{img}_seeds0to7", img, "window_mean", list(range(8))))

    for key, img, mode, seeds in jobs:
        if key in rec:
            log(f"{key}: cached (max {rec[key]['per_seed_best_max']:.3f})")
            continue
        sample = load_reference_pair(img)
        cfg = PRESETS["dip"]()
        if mode == "window_mean":
            cfg = dataclasses.replace(
                cfg, dip=dataclasses.replace(cfg.dip, return_mode="window_mean")
            )
        t0 = time.time()
        try:
            ens = SeedEnsembleSolver(sample, D, cfg, seeds)
            final, hist, chunk, _ = _ens_chunked_with_fallback(ens, n_iters)
        except Exception as e:
            log(f"{key} chunked FAILED ({type(e).__name__}: {e}); "
                "host-stepped fallback")
            try:
                ens = SeedEnsembleSolver(sample, D, cfg, seeds)
                final, hist = ens.run(n_iters)
                chunk = 0
            except Exception as e2:
                log(f"{key} FAILED entirely: {type(e2).__name__}: {e2}")
                continue
        wall = time.time() - t0
        m = np.asarray(hist["mpsnr"])  # (n_iters, n_seeds)
        em = np.asarray(hist["ens_mpsnr"])
        per_seed_best = np.nanmax(m, axis=0)
        rec[key] = {
            "img": img,
            "mode": mode,
            "seeds": seeds,
            "n_iters": n_iters,
            "chunk": chunk,
            "per_seed_best": [round(float(v), 3) for v in per_seed_best],
            "per_seed_best_max": float(np.max(per_seed_best)),
            "per_seed_best_mean": round(float(np.mean(per_seed_best)), 3),
            "ens_best_mpsnr": float(np.nanmax(em)),
            "ens_best_iter": int(np.nanargmax(em)),
            "wall_s": round(wall, 1),
        }
        _save_json(out_path, rec)
        log(f"{key}: per-seed max {np.max(per_seed_best):.3f} "
            f"(mean {np.mean(per_seed_best):.3f}), ens best "
            f"{np.nanmax(em):.3f}; wall {wall:.0f}s (chunk={chunk})")

    # 16-seed faithful aggregate (r4 seeds 0-7 + r5 seeds 8-15)
    r4 = _load_json(os.path.join(ART, "runs_r4", "ensemble.json"))
    ref_figs = {"img2": 40.569, "img3": 40.795}
    agg = {}
    for img in ("img2", "img3"):
        r4k = f"ens_dip_{img}"
        r5k = f"dip_{img}_seeds8to15"
        if r4k in r4 and r5k in rec:
            max16 = max(r4[r4k]["per_seed_best_max"],
                        rec[r5k]["per_seed_best_max"])
            agg[img] = {
                "faithful_16seed_max": round(max16, 3),
                "ref_figure": ref_figs[img],
                "delta_vs_ref": round(max16 - ref_figs[img], 3),
                "window_mean_8seed_max": rec.get(
                    f"dip_wm_{img}_seeds0to7", {}
                ).get("per_seed_best_max"),
            }
    if agg:
        rec["_aggregate_16seed"] = agg
        _save_json(out_path, rec)
        for img, a in agg.items():
            log(f"PRo {img}: 16-seed faithful max {a['faithful_16seed_max']} "
                f"vs ref {a['ref_figure']} ({a['delta_vs_ref']:+.3f}); "
                f"window-mean 8-seed max {a['window_mean_8seed_max']}")


def phase_hunt():
    """Extended faithful seed hunt on the PRo rows (cheapest remaining
    path to crossing them): more 8-seed batches of the faithful ``dip``
    preset, by default seeds 16-31 on img3 (residual -0.043, per-seed
    std ~0.16 -> ~2%/seed crossing odds) and 16-23 on img2.  Spec via
    ``R5_HUNT=img3:16:32,img2:16:24``.  Appends to pro_rows.json and
    refreshes the aggregate over ALL measured seeds."""
    from lrs_pnp_dip_tpu.data.dictionary import load_trained_dictionary
    from lrs_pnp_dip_tpu.data.io import load_reference_pair
    from lrs_pnp_dip_tpu.solvers import SeedEnsembleSolver
    from lrs_pnp_dip_tpu.utils.config import PRESETS

    out_path = os.path.join(RUNS, "pro_rows.json")
    rec = _load_json(out_path)
    D = load_trained_dictionary(512)
    spec = os.environ.get("R5_HUNT", "img3:16:32,img2:16:24")
    jobs = []
    for part in spec.split(","):
        img, lo, hi = part.split(":")
        for start in range(int(lo), int(hi), 8):
            seeds = list(range(start, min(start + 8, int(hi))))
            jobs.append((f"dip_{img}_seeds{seeds[0]}to{seeds[-1]}", img, seeds))

    for key, img, seeds in jobs:
        if key in rec:
            log(f"{key}: cached (max {rec[key]['per_seed_best_max']:.3f})")
            continue
        sample = load_reference_pair(img)
        cfg = PRESETS["dip"]()
        t0 = time.time()
        try:
            ens = SeedEnsembleSolver(sample, D, cfg, seeds)
            final, hist, chunk, _ = _ens_chunked_with_fallback(ens, 250)
        except Exception as e:
            log(f"{key} FAILED: {type(e).__name__}: {e}")
            continue
        wall = time.time() - t0
        m = np.asarray(hist["mpsnr"])
        per_seed_best = np.nanmax(m, axis=0)
        rec[key] = {
            "img": img,
            "mode": "faithful",
            "seeds": seeds,
            "n_iters": 250,
            "chunk": chunk,
            "per_seed_best": [round(float(v), 3) for v in per_seed_best],
            "per_seed_best_max": float(np.max(per_seed_best)),
            "per_seed_best_mean": round(float(np.mean(per_seed_best)), 3),
            "ens_best_mpsnr": float(np.nanmax(np.asarray(hist["ens_mpsnr"]))),
            "wall_s": round(wall, 1),
        }
        _save_json(out_path, rec)
        log(f"{key}: per-seed max {np.max(per_seed_best):.3f} "
            f"(bests {[round(float(v),2) for v in per_seed_best]}); "
            f"wall {wall:.0f}s")

    # refresh aggregate over ALL faithful seeds measured anywhere
    r4 = _load_json(os.path.join(ART, "runs_r4", "ensemble.json"))
    ref_figs = {"img2": 40.569, "img3": 40.795}
    agg = rec.get("_aggregate_16seed", {})
    for img, ref in ref_figs.items():
        maxes = [r4.get(f"ens_dip_{img}", {}).get("per_seed_best_max", -np.inf)]
        n = r4.get(f"ens_dip_{img}", {}).get("n_seeds", 0)
        for k, v in rec.items():
            if k.startswith(f"dip_{img}_seeds") and isinstance(v, dict):
                maxes.append(v["per_seed_best_max"])
                n += len(v.get("seeds", []))
        best = float(max(maxes))
        agg[img] = dict(agg.get(img, {}))
        agg[img].update({
            "faithful_allseed_max": round(best, 3),
            "n_faithful_seeds": n,
            "ref_figure": ref,
            "delta_vs_ref": round(best - ref, 3),
        })
        log(f"PRo {img}: faithful max over {n} seeds = {best:.3f} vs ref "
            f"{ref} ({best - ref:+.3f})")
    rec["_aggregate_16seed"] = agg
    _save_json(out_path, rec)


PHASES = {"ab": phase_ab, "pro": phase_pro, "hunt": phase_hunt}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phases", default="ab,pro")
    args = ap.parse_args()
    start_wedge_watchdog()
    os.makedirs(RUNS, exist_ok=True)
    import jax

    log(f"=== round-5 TPU session start (devices: {jax.devices()}) ===")
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
    log("=== round-5 TPU session done ===")


if __name__ == "__main__":
    main()
