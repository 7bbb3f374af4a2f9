"""Scaling-efficiency benchmark for the sharded solver stages.

Measures the two distributed stages over growing ``patch``-axis meshes:

  * sparse-coding prox — ``shard_map`` over the block axis (the
    embarrassingly-parallel axis the MATLAB twin covered with ``parfor``,
    ``main_LRS_PnP.m:100``); per-shard the fused Pallas kernel on TPU.
  * distributed SVT — local Gramian + one ``psum`` of the BxB matrix +
    replicated eigh + local spectral filter (parallel/collectives.py).

Weak scaling (default): the per-device problem is held constant
(``--blocks-per-device``), so ideal scaling is flat time / linear
throughput; efficiency_N = throughput_N / (N * throughput_1).
Strong scaling (``--mode strong``): total problem fixed at
``--blocks-per-device * max(devices)``.

On a real pod slice run it as-is (mesh over all local+remote devices via
``jax.distributed``).  On this 1-chip/CPU dev box, ``--platform cpu``
validates the harness on a virtual device mesh (NOTE: virtual CPU devices
share 2 physical cores here, so efficiency beyond 2 "devices" is bounded
by the host, not the collectives — the numbers are a harness check, not a
hardware measurement).

Appends one JSON line per (stage, N) to artifacts/contention_study.jsonl
(labeled ``host_oversubscribed`` on a virtual CPU mesh — such runs are a
harness/contention check, never a scaling-efficiency claim; the committed
scaling evidence is the analytic model + HLO contract in docs/DESIGN.md §6
and ``tests/test_scaling_model.py``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ROOT = os.path.join(os.path.dirname(__file__), "..")
OUT = os.path.join(ROOT, "artifacts", "contention_study.jsonl")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=(None, "cpu", "tpu"))
    ap.add_argument("--virtual-devices", type=int, default=8)
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--blocks-per-device", type=int, default=288)
    ap.add_argument("--rows-per-device", type=int, default=10368)
    ap.add_argument("--bands", type=int, default=128)
    ap.add_argument("--n-iter", type=int, default=100, help="ISTA iterations")
    ap.add_argument("--mode", default="weak", choices=("weak", "strong"))
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    if args.platform == "cpu":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual_devices}"
        )

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from lrs_pnp_dip_tpu.data import random_dictionary
    from lrs_pnp_dip_tpu.ops.ista import SparseProxConfig
    from lrs_pnp_dip_tpu.parallel import make_mesh
    from lrs_pnp_dip_tpu.parallel.collectives import (
        make_distributed_svt,
        make_sharded_sparse_prox,
    )

    dev_counts = [int(x) for x in args.devices.split(",")]
    avail = jax.devices()
    dev_counts = [n for n in dev_counts if n <= len(avail)]
    log(f"platform={avail[0].platform}, devices available={len(avail)}, "
        f"testing N={dev_counts}, mode={args.mode}")

    bb2 = 36 * 36
    D = jnp.asarray(random_dictionary(bb2, 512, seed=0))
    rng = np.random.default_rng(0)
    maxN = max(dev_counts)

    def time_fn(fn, *fn_args, reps):
        r = fn(*fn_args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*fn_args)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / reps

    results = {"sparse": {}, "svt": {}}
    for n in dev_counts:
        mesh = make_mesh({"patch": n}, devices=avail[:n])
        scale = n if args.mode == "weak" else maxN
        n_blocks = args.blocks_per_device * scale
        n_rows = args.rows_per_device * scale

        blocks = jnp.asarray(
            rng.standard_normal((n_blocks, bb2)).astype(np.float32)
        )
        mask = (rng.random((n_blocks, bb2)) > 0.1).astype(np.float32)
        cfg = SparseProxConfig(n_iter=args.n_iter, alpha_mode="trace4")
        prox = jax.jit(make_sharded_sparse_prox(mesh, cfg, "patch"))
        t_sparse = time_fn(prox, blocks, jnp.asarray(mask), D, reps=args.reps)
        thr_sparse = n_blocks * args.n_iter / t_sparse
        results["sparse"][n] = (t_sparse, thr_sparse)

        X = jnp.asarray(
            rng.standard_normal((n_rows, args.bands)).astype(np.float32)
        )
        svt = jax.jit(make_distributed_svt(mesh, "patch"))
        t_svt = time_fn(svt, X, 0.5, reps=args.reps)
        thr_svt = n_rows * args.bands / t_svt
        results["svt"][n] = (t_svt, thr_svt)

        log(
            f"N={n}: sparse {t_sparse*1e3:8.2f} ms ({thr_sparse:,.0f} blk-it/s) | "
            f"svt {t_svt*1e3:7.2f} ms ({thr_svt/1e6:,.1f} Melem/s)"
        )

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        for stage, by_n in results.items():
            n1 = min(by_n)
            _, thr1 = by_n[n1]
            for n, (t, thr) in sorted(by_n.items()):
                if args.mode == "weak":
                    eff = thr / (thr1 * n / n1)
                else:
                    eff = (thr / thr1) / (n / n1)
                rec = {
                    "stage": stage,
                    "mode": args.mode,
                    "platform": avail[0].platform,
                    # virtual CPU devices share the host's physical cores:
                    # such runs measure core contention, not collectives
                    "host_oversubscribed": avail[0].platform == "cpu",
                    "n_devices": n,
                    "secs_per_call": round(t, 6),
                    "throughput": round(thr, 1),
                    "efficiency_vs_1dev": round(eff, 4),
                }
                f.write(json.dumps(rec) + "\n")
                log(f"{stage} N={n}: efficiency {eff:.1%}")


if __name__ == "__main__":
    main()
