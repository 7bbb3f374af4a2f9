"""Render the round-3 measurement record as markdown tables.

Reads ``artifacts/runs_r3/summary.json`` (+ ``dict_ceiling.json``,
``artifacts/runs/matlab_twin.jsonl``, ``artifacts/spectrum``) and prints
the RESULTS.md tables, so the committed tables are mechanically
regenerable from the committed artifacts:

    python scripts/make_results_r3.py
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
RUNS = os.path.join(ROOT, "artifacts", "runs_r3")

REF_FIGURES = {  # BASELINE.md (figure-embedded numbers, reference results/)
    "img1": (42.422, 0.9436),
    "img2": (40.569, 0.9102),
    "img3": (40.795, 0.8879),
    "img4": (41.167, 0.9223),
    "img5": (39.173, 0.8668),
}
INPUT_MPSNR = {"img1": 33.074, "img2": 32.715, "img3": 32.326,
               "img4": 32.363, "img5": 32.143}


def load(name, default=None):
    path = os.path.join(RUNS, name)
    if not os.path.exists(path):
        return default
    with open(path) as f:
        return json.load(f)


def fmt(rec, with_iter=False):
    if rec is None:
        return "—"
    s = f"{rec['mpsnr']:.3f} / {rec['ssim']:.3f}"
    if with_iter:
        s += f" (it {rec['iter']})"
    return s


def main():
    summary = load("summary.json")
    if not summary:
        print("no summary.json yet", file=sys.stderr)
        return 1

    print("## Quality (round-3 re-runs on the fixed solver)\n")
    print("| Problem | Input | LRS-PnP (2 it) | DIP faithful | 1-Lip faithful "
          "| DIP tuned | 1-Lip tuned | Ref figure |")
    print("|---|---|---|---|---|---|---|---|")
    for img in ("img1", "img2", "img3", "img4", "img5"):
        cells = [f"{INPUT_MPSNR[img]:.3f}"]
        for v in ("lrs_pnp", "dip", "dip_1lip", "dip_tuned", "dip_1lip_tuned"):
            cells.append(fmt(summary.get(f"{v}_{img}")))
        ref = REF_FIGURES[img]
        cells.append(f"{ref[0]:.3f} / {ref[1]:.3f}")
        print(f"| {img} | " + " | ".join(cells) + " |")

    print("\n## img4/img5 dictionary-gap experiments (faithful mu's)\n")
    print("| Problem | shipped dict | self (mask-aware, no GT) | "
          "LOO clean | oracle clean-self | ES pat150 | ES wmean |")
    print("|---|---|---|---|---|---|---|")
    for img in ("img4", "img5"):
        row = [fmt(summary.get(f"dip_{img}"))]
        for kind in ("self", "loo", "oracle"):
            row.append(fmt(summary.get(f"dip_dict_{kind}_{img}")))
        for es in ("pat150", "wmean"):
            row.append(fmt(summary.get(f"dip_es_{es}_{img}")))
        print(f"| {img} | " + " | ".join(row) + " |")

    ceil = load("dict_ceiling.json")
    if ceil:
        print("\n### Sparse-stage ceiling predicts the faithful result "
              "(clean cube coded at the faithful operating point)\n")
        print("| Problem | ceiling (shipped dict) | faithful best (dip/1lip) "
              "| faithful − ceiling | Ref figure |")
        print("|---|---|---|---|---|")
        for img in ("img1", "img2", "img3", "img4", "img5"):
            rec = ceil.get(f"{img}/shipped")
            if not rec:
                continue
            c = rec["clean_input_mpsnr"]
            best = max(
                (summary.get(f"{v}_{img}") or {"mpsnr": float("-inf")})["mpsnr"]
                for v in ("dip", "dip_1lip")
            )
            print(f"| {img} | {c:.2f} | {best:.2f} | +{best-c:.2f} | "
                  f"{REF_FIGURES[img][0]:.2f} |")

        core = ("shipped", "self", "loo", "oracle")
        print("\n### Ceiling invariance on img4/img5 (nothing moves it)\n")
        print("| Problem | " + " | ".join(core)
              + " | λ 0.1→0.001 | K 64→2048 | Nit 100→1600 | ‖H‖² step |")
        print("|---|" + "---|" * (len(core) + 4))
        for img in ("img4", "img5"):
            row = []
            for kind in core:
                rec = ceil.get(f"{img}/{kind}")
                row.append(f"{rec['clean_input_mpsnr']:.2f}" if rec else "—")

            def span(pred):
                vals = [v["clean_input_mpsnr"] for k, v in ceil.items()
                        if k.startswith(f"{img}/") and pred(k.split("/")[1])]
                return (f"{min(vals):.2f}–{max(vals):.2f}" if len(vals) > 1
                        else (f"{vals[0]:.2f}" if vals else "—"))

            row.append(span(lambda s: s.startswith("oracle_lam")))
            row.append(span(lambda s: ("_k" in s and s.split("_k")[-1].isdigit())))
            row.append(span(lambda s: s.startswith("oracle_nit")))
            rec = ceil.get(f"{img}/oracle_specnorm")
            row.append(f"{rec['clean_input_mpsnr']:.2f}" if rec else "—")
            print(f"| {img} | " + " | ".join(row) + " |")

    tuned_dict = {k: v for k, v in summary.items()
                  if "_tuned_dict_" in k or k.startswith("dip_tuned_dict_")
                  or k.startswith("dip_1lip_tuned_dict_")}
    if tuned_dict:
        print("\n## Tuned presets with leak-free per-image dictionaries "
              "(round 3b)\n")
        print("| Problem | dict | DIP tuned | 1-Lip tuned |")
        print("|---|---|---|---|")
        for img in ("img4", "img5"):
            for kind in ("self", "loo"):
                a = summary.get(f"dip_tuned_dict_{kind}_{img}")
                b = summary.get(f"dip_1lip_tuned_dict_{kind}_{img}")
                if a or b:
                    print(f"| {img} | {kind} | {fmt(a, with_iter=True)} | "
                          f"{fmt(b, with_iter=True)} |")

    bf16 = {k: v for k, v in summary.items() if "_bf16" in k}
    if bf16:
        print("\n## bf16 fast-path quality (faithful DIP preset, img1)\n")
        print("| Path | best MPSNR / SSIM |")
        print("|---|---|")
        f32 = summary.get("dip_img1")
        if f32:
            print(f"| f32 baseline | {fmt(f32, with_iter=True)} |")
        for k in sorted(bf16):
            label = {"dip_bf16sparse_img1": "bf16 sparse-prox matmuls",
                     "dip_bf16full_img1": "bf16 sparse + mixed-precision DIP"}.get(k, k)
            print(f"| {label} | {fmt(bf16[k], with_iter=True)} |")

    heldout = {k: v for k, v in summary.items() if k.startswith("heldout_")}
    if heldout:
        print("\n## Held-out validation (fresh masks + fresh noise, "
              "never seen by any sweep)\n")
        print("| Problem | variant | best MPSNR / SSIM |")
        print("|---|---|---|")
        for k in sorted(heldout):
            _, variant, img, mask = (k.split("_", 1)[0],) + tuple(
                k.split("_", 1)[1].rsplit("_", 2)
            )
            print(f"| {img}+{mask} | {variant} | {fmt(heldout[k], with_iter=True)} |")

    twin = os.path.join(ROOT, "artifacts", "runs", "matlab_twin.jsonl")
    if os.path.exists(twin):
        rows = []
        for line in open(twin):
            rec = json.loads(line)
            if "meta" in rec:
                meta = rec["meta"]
            else:
                rows.append(rec)
        if rows:
            best = max(rows, key=lambda r: r["mpsnr"])
            print(f"\n## MATLAB twin (13 iters, mu1=mu2=0.15, strip mask): "
                  f"input {meta.get('input_mpsnr', float('nan')):.3f} dB -> "
                  f"best {best['mpsnr']:.3f} dB (iter {best['iter']})")

    spect = os.path.join(ROOT, "artifacts", "spectrum")
    if os.path.isdir(spect):
        done = sorted(f[:-4] for f in os.listdir(spect)
                      if f.endswith(".npy") and not f.endswith("_iters.npy"))
        if done:
            print(f"\n## Spectrum artifacts: {', '.join(done)} "
                  f"(artifacts/spectrum/, + comparison.png)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
