"""Regenerate the DIP-trajectory table in RESULTS.md from a run jsonl."""
import argparse, json, sys

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("jsonl")
    ap.add_argument("--every", type=int, default=5)
    args = ap.parse_args()
    rows = []
    for l in open(args.jsonl):
        try:
            rec = json.loads(l)
        except json.JSONDecodeError:
            continue  # truncated tail line
        if "meta" not in rec:
            rows.append(rec)
    print("| Outer iter | MPSNR | MSSIM | DIP iters |")
    print("|---|---|---|---|")
    for r in rows:
        if r["iter"] % args.every == 0 or r is rows[-1]:
            print(f"| {r['iter']} | {r['mpsnr']:.2f} | {r['ssim']:.4f} | {r['dip_iters']} |")
    best = max(rows, key=lambda r: r["mpsnr"])
    print(f"\nbest: iter {best['iter']}  MPSNR {best['mpsnr']:.3f}  MSSIM {best['ssim']:.4f}")

if __name__ == "__main__":
    main()
