"""Render the round-5 measurement tables from committed artifacts.

Regenerates the RESULTS.md round-5 sections:
  * ensemble-engine A/B (host-stepped vs chunked scan) from
    artifacts/runs_r5/ens_ab.json
  * PRo-row closing table (16-seed faithful max + window-mean estimator)
    from artifacts/runs_r5/pro_rows.json + artifacts/runs_r4/ensemble.json
  * large-cube per-stage decomposition from artifacts/bench_full.json

Usage: python scripts/make_results_r5.py
"""

import json
import os

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
ART = os.path.join(ROOT, "artifacts")


def _load(*parts):
    path = os.path.join(ART, *parts)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def main():
    ab = _load("runs_r5", "ens_ab.json")
    if "stepped" in ab and "chunked" in ab:
        s, c = ab["stepped"], ab["chunked"]
        print("## Ensemble engine A/B (same session, faithful dip on img3, "
              f"{s['n_seeds']} seeds x {s['n_iters']} iters)\n")
        print("| Engine | wall | s/outer-iter | dispatches |")
        print("|---|---|---|---|")
        print(f"| host-stepped `run` | {s['wall_s']:.1f} s | "
              f"{s['s_per_outer_iter']:.2f} | {2 * s['n_iters']} |")
        print(f"| chunked scan `run_chunked(chunk={c['chunk']})` | "
              f"{c['wall_s']:.1f} s | {c['s_per_outer_iter']:.2f} | "
              f"{-(-c['n_iters'] // c['chunk'])} |")
        print(f"\nchunked = {ab['_speedup_chunked_vs_stepped']:.2f}x the "
              "host-stepped engine; the chunk-10 program compiles where the "
              "scan-of-250 crashed the remote compiler (commit b32ecc5).\n")

    pro = _load("runs_r5", "pro_rows.json")
    agg = pro.get("_aggregate_16seed", {})
    if agg:
        print("## PRo rows: extended faithful seed study\n")
        print("| Ref figure | Ref MPSNR | faithful max (n seeds) | "
              "window-mean 8-seed max | residual |")
        print("|---|---|---|---|---|")
        names = {"img2": "PRo/sample_img1", "img3": "PRo/sample_img2"}
        for img, a in agg.items():
            best = a.get("faithful_allseed_max", a.get("faithful_16seed_max"))
            n = a.get("n_faithful_seeds", 16)
            wm = a.get("window_mean_8seed_max")
            print(f"| {names.get(img, img)} | {a['ref_figure']} | "
                  f"{best} ({n}) | {round(wm, 3) if wm else '—'} | "
                  f"{best - a['ref_figure']:+.3f} |")
        print()

    full = _load("bench_full.json")
    ws = full.get("large_cube", {}).get("whole_scene_144", {})
    if ws.get("stages"):
        print("## Large-cube (144x144x128) per-stage decomposition\n")
        print(f"s/outer-iter: {ws['s_per_outer_iter']}  "
              f"(block-iters/s: {ws['block_iters_per_sec']:,})\n")
        print("| Stage | device ms |")
        print("|---|---|")
        for name, s in ws["stages"].items():
            print(f"| {name} | {s['device_ms']} |")
        print(f"| (accounted) | {ws.get('stages_accounted_ms')} |")
        print(f"| (unaccounted vs outer iter) | {ws.get('stages_unaccounted_ms')} |")
        print(f"\nsparse stage achieved TF/s: "
              f"{ws.get('sparse_stage_achieved_tflops')}")


if __name__ == "__main__":
    main()
