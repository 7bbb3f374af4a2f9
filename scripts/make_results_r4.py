"""Render the round-4 evidence tables as markdown.

Reads the round-3 quality record (``artifacts/runs_r3/summary.json``) plus
the round-4 artifacts (``artifacts/runs_r4/seed_variance.json``,
``artifacts/runs_r4/classic_nlm.json``, ``artifacts/runs_r3/
dict_ceiling.json``) and prints:

  1. the PER-VARIANT parity table — one row per committed reference figure
     (all 8: 3 PRo + 5 1-Lip, BASELINE.md rows 2-9), variant-matched
     against the faithful and tuned presets (VERDICT r3 next #2 / weak #2);
  2. the seed-variance table for the faithful presets on the dense-mask
     problems (VERDICT r3 next #1);
  3. the classic-NLM ceiling cross-check (VERDICT r3 next #3 / weak #1).

    python scripts/make_results_r4.py

Reference-sample <-> repo-problem mapping (verified in round 3 by reading
the committed PNGs: reference ``sample_img3``'s clean panel is
``clean_img4`` + ``fourth_mask``): reference sample_imgK = repo img(K+1).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
R3 = os.path.join(ROOT, "artifacts", "runs_r3")
R4 = os.path.join(ROOT, "artifacts", "runs_r4")

# The 8 committed reference figures (BASELINE.md; figure-embedded numbers,
# final-iteration PNG per sample dir). Keyed by (variant, repo img).
REF_FIGURES = [
    # (ref variant, ref sample dir, repo img, mpsnr, ssim)
    ("dip", "PRo/sample_img0", "img1", 42.422, 0.9436),
    ("dip", "PRo/sample_img1", "img2", 40.569, 0.9102),
    ("dip", "PRo/sample_img2", "img3", 40.795, 0.8879),
    ("dip_1lip", "1-Lip/sample_img0", "img1", 41.896, 0.9256),
    ("dip_1lip", "1-Lip/sample_img1", "img2", 40.702, 0.8965),
    ("dip_1lip", "1-Lip/sample_img2", "img3", 41.280, 0.8851),
    ("dip_1lip", "1-Lip/sample_img3", "img4", 41.167, 0.9223),
    ("dip_1lip", "1-Lip/sample_img4", "img5", 39.173, 0.8668),
]


def load(path, default=None):
    if not os.path.exists(path):
        return default
    with open(path) as f:
        return json.load(f)


def main():
    summary = load(os.path.join(R3, "summary.json"))
    seeds = load(os.path.join(R4, "seed_variance.json"), {})
    classic = load(os.path.join(R4, "classic_nlm.json"), {})
    ceilings = load(os.path.join(R3, "dict_ceiling.json"), {})
    if not summary:
        print("no runs_r3/summary.json", file=sys.stderr)
        return 1

    # ---------------------------------------------- per-variant parity
    print("## Per-variant parity vs all 8 committed reference figures\n")
    print("| Ref figure (variant / sample) | Ref MPSNR / SSIM | "
          "Faithful (same variant) | Seed spread (8 seeds) | "
          "Tuned (same variant) | Best beats ref? |")
    print("|---|---|---|---|---|---|")
    wins_faithful = wins_tuned = wins_best = 0
    for variant, ref_dir, img, ref_m, ref_s in REF_FIGURES:
        faith = summary.get(f"{variant}_{img}")
        tuned = summary.get(f"{variant}_tuned_{img}")
        spread = seeds.get("_aggregate", {}).get(f"{variant}_{img}")
        faith_c = f"{faith['mpsnr']:.3f} / {faith['ssim']:.3f}" if faith else "—"
        tuned_c = f"{tuned['mpsnr']:.3f} / {tuned['ssim']:.3f}" if tuned else "—"
        spread_c = (
            f"{spread['mean']:.2f} ± {spread['std']:.2f} (max {spread['max']:.2f})"
            if spread else "—"
        )
        cand = [x for x in (
            faith and faith["mpsnr"],
            tuned and tuned["mpsnr"],
            spread and spread["max"],
        ) if x]
        best = max(cand) if cand else float("nan")
        verdict = "**yes**" if best > ref_m else f"no ({best - ref_m:+.2f})"
        wins_best += best > ref_m
        wins_faithful += bool(faith and max(
            faith["mpsnr"], spread["max"] if spread else -1e9) > ref_m)
        wins_tuned += bool(tuned and tuned["mpsnr"] > ref_m)
        print(f"| {ref_dir} | {ref_m:.3f} / {ref_s:.4f} | {faith_c} | "
              f"{spread_c} | {tuned_c} | {verdict} |")
    print(f"\nSame-variant record: faithful (incl. max over seeds) beats the "
          f"committed figure on **{wins_faithful}/8**; tuned on "
          f"**{wins_tuned}/8**; best-of-presets on **{wins_best}/8**.\n")

    # ---------------------------------------------------- seed variance
    if seeds.get("_aggregate"):
        print("## Seed variance of the faithful presets (250 iters/run)\n")
        print("| Variant / problem | n | mean | std | min | max | Ref figure |")
        print("|---|---|---|---|---|---|---|")
        ref_by_key = {f"{v}_{img}": m for v, _, img, m, _ in REF_FIGURES}
        for key, a in sorted(seeds["_aggregate"].items()):
            ref = ref_by_key.get(key)
            ref_c = f"{ref:.3f}" if ref else "—"
            print(f"| {key} | {a['n']} | {a['mean']:.3f} | {a['std']:.3f} | "
                  f"{a['min']:.3f} | {a['max']:.3f} | {ref_c} |")
        print()

    # ------------------------------------------------ ensemble estimator
    ens = load(os.path.join(R4, "ensemble.json"), {})
    if ens:
        print("## Seed-ensemble estimator (ensemble-mean cube, 8 seeds)\n")
        print("| Variant / problem | ens-mean best MPSNR / SSIM (iter) | "
              "per-seed best mean / max | Ref figure (same variant where "
              "committed) |")
        print("|---|---|---|---|")
        ref_by = {("dip_1lip", img): m for v, _, img, m, _ in REF_FIGURES
                  if v == "dip_1lip"}
        ref_by.update({("dip", img): m for v, _, img, m, _ in REF_FIGURES
                       if v == "dip"})
        for key, r in sorted(ens.items()):
            if not isinstance(r, dict):
                continue
            base_variant = "dip_1lip" if "1lip" in r["variant"] else "dip"
            ref = ref_by.get((base_variant, r["img"]))
            print(f"| {r['variant']} {r['img']} | {r['ens_best_mpsnr']:.3f} / "
                  f"{r['ens_ssim_at_best']:.4f} (it {r['ens_best_iter']}) | "
                  f"{r['per_seed_best_mean']:.3f} / {r['per_seed_best_max']:.3f} | "
                  f"{f'{ref:.3f}' if ref else '—'} |")
        print()

    # ------------------------------------------------ fastpath A/B
    fastpath = load(os.path.join(R4, "fastpath.json"), {})
    if "dip_tuned" in fastpath and "dip_fast" in fastpath:
        print("## `dip_fast` production preset — same-session A/B (img1, "
              "250 iters)\n")
        print("| Preset | best MPSNR / SSIM (iter) | warm wall (s) |")
        print("|---|---|---|")
        for v in ("dip_tuned", "dip_fast"):
            r = fastpath[v]
            print(f"| {v} | {r['best_mpsnr']:.3f} / {r['ssim_at_best']:.4f} "
                  f"(it {r['best_iter']}) | {r['wall_s_warm']:.1f} |")
        print(f"\nWarm-run speedup **{fastpath['_speedup_warm']:.2f}x** at "
              f"quality delta {fastpath['_quality_delta_db']:+.3f} dB "
              f"(bf16 MXU paths + incremental early stop).\n")

    # ------------------------------------------------ classic-NLM check
    if classic:
        print("## Sparse-stage ceiling under the classic-NLM spec\n")
        print("| Problem | ceiling (fast NLM, skimage spec) | "
              "ceiling (classic NLM, NLmeansfilter spec) | shipped-dict "
              "ceiling (r3) |")
        print("|---|---|---|---|")
        for img in ("img4", "img5"):
            r3c = ceilings.get(f"{img}/shipped", {}).get("clean_input_mpsnr")
            fast = classic.get(f"ceiling_{img}_fast")
            cls = classic.get(f"ceiling_{img}_classic")
            print(f"| {img} | {fast:.3f} | {cls:.3f} | "
                  f"{r3c:.3f} |" if fast and cls and r3c else f"| {img} | — | — | — |")
        if "dip_img4_classic_best" in classic:
            print(f"\nFaithful `dip` solve on img4 under the classic spec: "
                  f"best {classic['dip_img4_classic_best']:.3f} dB "
                  f"(iter {classic['dip_img4_classic_best_iter']}, "
                  f"ssim {classic['dip_img4_classic_ssim']:.4f}).")
    return 0


if __name__ == "__main__":
    sys.exit(main())
