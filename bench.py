"""Benchmark harness — prints ONE JSON line with the headline metric and
writes the full measurement record to ``artifacts/bench_full.json``.

Headline: PnP-ISTA block-iterations/sec of the sparse-coding prox (the
reference's dominant hot loop: 144 blocks x Nit ISTA steps x NLM per outer
iteration, run serially on CPU in the reference,
``main_LRS_PnP_DIP_pro.py:375-400``).  ``vs_baseline`` is the speedup of
this chip over the same optimized code on the host CPU (BASELINE.json
target: >= 5x per chip vs CPU).

Round-2 redesign (VERDICT items 1 + 10):

* The headline is measured as pure DEVICE time — R chained prox
  applications inside one ``lax.scan`` (one dispatch), so the per-call
  tunnel/dispatch overhead of this environment (~5 ms per host->device
  round trip) no longer contaminates the number.  The round-1 3.5x spread
  (8.4 M vs 2.4 M block-iters/s) was exactly this: 1.8 ms of device work
  measured behind a 4-6 ms dispatch path.  Both numbers are now recorded
  separately (``device_ms`` vs ``dispatch_ms``).
* Alongside the microkernel the harness times the reference's OTHER hot
  loop (the DIP prox, ``main_LRS_PnP_DIP_pro.py:409-420``): per-Adam-step
  time on the skip-128 net, a full LRS-PnP-DIP outer iteration, and a
  10-iteration ``run_scanned`` sustained throughput.
* An MFU estimate for the fused Pallas kernel from its analytic cost
  model (``ops/ista_pallas.py`` CostEstimate) vs the chip's bf16 peak.
* Every record carries run metadata (device, reps, per-rep times, std),
  and the full record is kept in ``artifacts/bench_full.json``.

Usage:  python bench.py [--quick] [--skip-cpu] [--watchdog SECONDS]
Headline JSON goes to stdout; everything else to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

import numpy as np

_ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")
_LAST_RESULT = os.path.join(_ART, "bench_last.json")
_FULL_RESULT = os.path.join(_ART, "bench_full.json")

# v5e MXU peak (bf16 FMA); the kernels run f32, so this is a conservative
# utilization denominator — reported as such, not as a hardware claim.
_BF16_PEAK_FLOPS = {"TPU v5 lite": 197e12, "TPU v5e": 197e12}
_DEFAULT_PEAK = 197e12


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _force(x) -> float:
    """Fetch a device SCALAR to the host — the only reliable sync on the
    axon tunnel backend, where ``jax.block_until_ready`` returns while the
    execution is still queued (discovered diagnosing the round-1 bench
    variance: 'device times' of microseconds for milliseconds of MXU work).
    Every timed closure must therefore reduce its result to a scalar."""
    v = np.asarray(x)
    assert v.size == 1, f"timed fns must return a scalar, got shape {v.shape}"
    return float(v.reshape(()))


def _timed_reps(fn, *args, warmup=2, reps=3):
    """Call fn reps times (after warmup), syncing each via a scalar fetch;
    returns list of seconds.  Each sample includes one host round-trip —
    amortize it with chained work when measuring device throughput."""
    for _ in range(warmup):
        _force(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(fn(*args))
        times.append(time.perf_counter() - t0)
    return times


def _stats(times):
    return {
        "reps": len(times),
        "min_ms": round(min(times) * 1e3, 4),
        "median_ms": round(statistics.median(times) * 1e3, 4),
        "mean_ms": round(statistics.mean(times) * 1e3, 4),
        "std_ms": round(statistics.pstdev(times) * 1e3, 4),
        "times_ms": [round(t * 1e3, 4) for t in times],
    }


def _watchdog(seconds: int):
    """If the TPU tunnel wedges (a known failure mode of this environment:
    host->device executions hang forever), emit the last real measurement
    recorded on this hardware instead of hanging the driver."""

    def fire():
        if os.path.exists(_LAST_RESULT):
            with open(_LAST_RESULT) as f:
                rec = json.load(f)
            rec["note"] = "tpu tunnel wedged; last recorded measurement"
            print(json.dumps(rec), flush=True)
        else:
            print(
                json.dumps(
                    {
                        "metric": "pnp_ista_block_iters_per_sec",
                        "value": 0.0,
                        "unit": "block_iters/s",
                        "vs_baseline": 0.0,
                        "note": "tpu tunnel wedged; no cached measurement",
                    }
                ),
                flush=True,
            )
        os._exit(3)

    import threading

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def _problem():
    """The reference flagship problem: 36x36x128 cube, 144 blocks of 1296
    pixels, Nit=100, K=512 atoms (``main_LRS_PnP_DIP_pro.py:306,340-341``)."""
    from lrs_pnp_dip_tpu.data import random_dictionary
    from lrs_pnp_dip_tpu.data.io import (
        load_reference_sample,
        matricize,
        reference_data_available,
    )
    from lrs_pnp_dip_tpu.data.masks import synthetic_sample

    if reference_data_available():
        sample = load_reference_sample("img1", "mask1")
    else:
        sample = synthetic_sample(36, 36, 128, missing=0.05)
    dict_path = os.path.join(_ART, "dictionary_36x36_k512.npz")
    if os.path.exists(dict_path):
        D = np.load(dict_path)["dictionary"].astype(np.float32)
    else:
        D = random_dictionary(36 * 36, 512, seed=0)
    Y = np.asarray(matricize(sample.noisy), np.float32)
    return sample, Y, D


def bench_sparse_prox(device, Y, D, n_ista, chain, reps, matmul_dtype="float32"):
    """Sparse prox on one device: device time (scan-chained, one dispatch)
    and single-call dispatch time.

    Validity guard (round-3; VERDICT r2 weak #1): the chained measurement is
    only meaningful when the chained call dominates the tunnel round-trip —
    otherwise ``min(times_chain) - roundtrip`` clamps toward zero and the
    reported throughput is garbage (bench_r2_run1.log printed 3.8e9
    block-iters/s at 5142% MFU with rc=0 exactly this way, chain=20 vs a
    24 ms round-trip).  The chain length now auto-doubles until
    ``min(times_chain) >= 3 * roundtrip``; if that cannot be reached the
    harness raises instead of emitting a number.
    """
    import jax
    import jax.numpy as jnp

    from lrs_pnp_dip_tpu.ops.blocks import block_grid, extract_blocks
    from lrs_pnp_dip_tpu.ops.ista import SparseProxConfig, sparse_prox

    backend = "pallas" if device.platform not in ("cpu", "gpu") else "xla"
    cfg = SparseProxConfig(n_iter=n_ista, alpha_mode="trace4", backend=backend,
                           matmul_dtype=matmul_dtype)
    grid = block_grid(Y.shape, 36, 36)
    Yd = jax.device_put(jnp.asarray(Y), device)
    Dd = jax.device_put(jnp.asarray(D), device)
    blocks = extract_blocks(Yd, grid)
    mask_blocks = (blocks != 0).astype(jnp.float32)

    single = jax.jit(lambda b, m, d: sparse_prox(b, m, d, cfg).sum())

    # one dispatch + scalar-fetch round trip, measured FIRST so the chain
    # length can be validated against it
    noop = jax.jit(lambda x: x + 1.0)
    x0 = jax.device_put(jnp.float32(1.0), device)
    roundtrip_s = min(_timed_reps(noop, x0, warmup=2, reps=max(3, reps)))

    def make_chained(length):
        # device-time: R chained proxes in ONE dispatch; each iteration's
        # input depends on the previous output, so nothing can be elided,
        # and the final sum() is the scalar the timing loop fetches to sync.
        def chained(b, m, d):
            def body(carry, _):
                return sparse_prox(carry, m, d, cfg), ()

            out, _ = jax.lax.scan(body, b, None, length=length)
            return out.sum()

        return jax.jit(chained)

    compile_s = None
    times_chain = None
    for _ in range(7):  # up to 2^6 growth
        chained_j = make_chained(chain)
        t0 = time.perf_counter()
        _force(chained_j(blocks, mask_blocks, Dd))
        dt = time.perf_counter() - t0
        compile_s = dt if compile_s is None else compile_s
        times_chain = _timed_reps(
            chained_j, blocks, mask_blocks, Dd, warmup=0, reps=reps
        )
        if min(times_chain) >= max(3.0 * roundtrip_s, 0.1):
            break
        _log(
            f"[bench] chained call ({min(times_chain)*1e3:.1f} ms) does not "
            f"dominate the round-trip ({roundtrip_s*1e3:.1f} ms); "
            f"doubling chain {chain} -> {chain * 2}"
        )
        chain *= 2
    else:
        raise RuntimeError(
            f"chained measurement never dominated the tunnel round-trip "
            f"({roundtrip_s*1e3:.1f} ms) even at chain={chain}; refusing to "
            "emit a garbage throughput number"
        )

    times_single = _timed_reps(single, blocks, mask_blocks, Dd, warmup=1, reps=reps)

    device_s = (min(times_chain) - roundtrip_s) / chain
    n_blocks = grid.n_blocks
    rec = {
        "roundtrip_ms": round(roundtrip_s * 1e3, 4),
        "backend": cfg.backend,
        "platform": device.platform,
        "device_kind": getattr(device, "device_kind", device.platform),
        "n_blocks": n_blocks,
        "n_ista": n_ista,
        "chain_length": chain,
        "compile_s": round(compile_s, 2),
        "device_ms": round(device_s * 1e3, 4),
        "dispatch_ms": _stats(times_single),
        "chained": _stats(times_chain),
        "block_iters_per_sec": round(n_blocks * n_ista / device_s, 1),
    }
    # MFU from the Pallas kernel's analytic cost model: the two MXU
    # matmuls per ISTA iteration, 4*nB*P*K flops each iteration
    # (ops/ista_pallas.py CostEstimate).
    P, K = D.shape
    flops = 4.0 * n_blocks * P * K * n_ista
    achieved = flops / device_s
    peak = _BF16_PEAK_FLOPS.get(rec["device_kind"], _DEFAULT_PEAK)
    rec["achieved_tflops"] = round(achieved / 1e12, 3)
    rec["mfu_vs_bf16_peak"] = round(achieved / peak, 4)
    return rec


def _measured_mfu():
    """Profiler-measured MFU from the round-3 capture
    (``scripts/tpu_round3.py phase_profile`` -> artifacts/profile/measured.json):
    device kernel durations from a jax.profiler chrome trace, against the
    same analytic flop count.  None when no capture exists — the analytic
    ``mfu_vs_bf16_peak`` stays clearly labeled as a cost-model estimate."""
    path = os.path.join(_ART, "profile", "measured.json")
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            rec = json.load(f)
        v = rec.get("measured_mfu_vs_bf16_peak")
        if v is None or not (0.0 < float(v) < 1.0):
            # a measured MFU outside (0, 1) is a trace-parse artifact,
            # never a real number — refuse to propagate it
            return None
        return round(float(v), 4)
    except Exception:
        return None


def bench_dip(sample, reps, quick):
    """The DIP prox (hot loop #2, ``main_LRS_PnP_DIP_pro.py:409-420``):
    per-Adam-step device time on the skip-128 net, decomposed into

      * the production ``while_loop`` fit (early-stop bookkeeping carried,
        patience set to never fire so the step count is exact), and
      * a bare fixed-iteration ``lax.scan`` of forward+backward+Adam with
        NO early-stop machinery

    so the while_loop/ES overhead is a regression-sensitive number of its
    own (VERDICT r3 #10 — the 10.7 outer-iters/s flagship embeds ~219 ES
    iterations; a regression could previously hide inside it)."""
    import jax
    import jax.numpy as jnp
    import optax

    from lrs_pnp_dip_tpu.models import dip_skip_128
    from lrs_pnp_dip_tpu.solvers.dip import DipConfig, make_dip_fit

    n_steps = 50 if quick else 200
    cfg = DipConfig(
        num_iter=n_steps,
        learning_rate=0.1,
        buffer_size=30,
        patience=10 * n_steps,  # never fires
    )
    model = dip_skip_128(sample.shape[2])
    fit_fn = make_dip_fit(model, cfg)
    fit = jax.jit(lambda k, xi, t, m: fit_fn(k, xi, t, m).loss)
    x = jnp.asarray(sample.noisy)[None]  # (1, H, W, B)
    mask = jnp.asarray(sample.mask)[None, ..., None]
    key = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    _force(fit(key, x, x, mask))
    compile_s = time.perf_counter() - t0
    times = _timed_reps(fit, key, x, x, mask, warmup=1, reps=reps)
    per_step_ms = min(times) / n_steps * 1e3

    # fixed-iteration scan: same math (fresh init, Adam on masked MSE),
    # zero early-stop state — the floor the while_loop is compared against
    opt = optax.adam(cfg.learning_rate)

    def _loss(p, ms, xi, t, m):
        vs = {"params": p, **ms}
        if ms:
            out, new = model.apply(vs, xi, mutable=list(ms))
        else:
            out, new = model.apply(vs, xi), {}
        return jnp.mean((t * m - out * m) ** 2), new

    def _scan_fit(k, xi, t, m):
        variables = model.init(k, xi)
        params = variables["params"]
        mstate = {kk: v for kk, v in variables.items() if kk != "params"}
        opt_state = opt.init(params)

        def body(carry, _):
            p, ms, os_ = carry
            (loss, new), g = jax.value_and_grad(_loss, has_aux=True)(
                p, ms, xi, t, m
            )
            upd, os_ = opt.update(g, os_, p)
            return (optax.apply_updates(p, upd), new, os_), loss

        _, losses = jax.lax.scan(
            body, (params, mstate, opt_state), None, length=n_steps
        )
        return losses[-1]

    scan_fit = jax.jit(_scan_fit)
    t0 = time.perf_counter()
    _force(scan_fit(key, x, x, mask))
    scan_compile_s = time.perf_counter() - t0
    scan_times = _timed_reps(scan_fit, key, x, x, mask, warmup=1, reps=reps)
    scan_step_ms = min(scan_times) / n_steps * 1e3

    # incremental early stop: the same f32 while_loop with the O(D)
    # sufficient-statistics variance (es_mode='incremental') instead of
    # the full 2-pass window reduction — isolates how much of the
    # while_loop-vs-scan overhead is ES HBM traffic.
    inc_cfg = DipConfig(
        num_iter=n_steps,
        learning_rate=0.1,
        buffer_size=30,
        patience=10 * n_steps,
        es_mode="incremental",
    )
    inc_fit_fn = make_dip_fit(model, inc_cfg)
    inc_fit = jax.jit(lambda k, xi, t, m: inc_fit_fn(k, xi, t, m).loss)
    _force(inc_fit(key, x, x, mask))
    inc_times = _timed_reps(inc_fit, key, x, x, mask, warmup=1, reps=reps)
    inc_step_ms = min(inc_times) / n_steps * 1e3

    # mixed-precision production fit: the same while_loop with
    # ``compute_dtype='bfloat16'`` (params + activations in bf16, f32 loss
    # and Adam state).  End-to-end quality-neutral (RESULTS.md bf16 table),
    # so its speedup over the f32 fit is pure headroom — measured here as
    # its own regression-sensitive number.
    bf16_cfg = DipConfig(
        num_iter=n_steps,
        learning_rate=0.1,
        buffer_size=30,
        patience=10 * n_steps,
        compute_dtype="bfloat16",
    )
    bf16_fit_fn = make_dip_fit(model, bf16_cfg)
    bf16_fit = jax.jit(lambda k, xi, t, m: bf16_fit_fn(k, xi, t, m).loss)
    _force(bf16_fit(key, x, x, mask))
    bf16_times = _timed_reps(bf16_fit, key, x, x, mask, warmup=1, reps=reps)
    bf16_step_ms = min(bf16_times) / n_steps * 1e3

    return {
        "net": "skip-128",
        "n_steps": n_steps,
        "compile_s": round(compile_s, 2),
        "fit": _stats(times),
        "adam_step_ms": round(per_step_ms, 4),
        "adam_steps_per_sec": round(n_steps / min(times), 1),
        "scan_compile_s": round(scan_compile_s, 2),
        "fit_scan": _stats(scan_times),
        "adam_step_scan_ms": round(scan_step_ms, 4),
        "while_loop_overhead_pct": round(
            (per_step_ms - scan_step_ms) / scan_step_ms * 100.0, 2
        ),
        "adam_step_bf16_ms": round(bf16_step_ms, 4),
        "bf16_speedup": round(per_step_ms / max(bf16_step_ms, 1e-9), 3),
        "adam_step_inc_es_ms": round(inc_step_ms, 4),
        "inc_es_overhead_pct": round(
            (inc_step_ms - scan_step_ms) / scan_step_ms * 100.0, 2
        ),
    }


def bench_sharded_prox(device, Y, D, n_ista, chain, reps):
    """The shard_map'd sparse prox on a 1-device {patch} mesh — the fused
    Pallas kernel must run PER SHARD under the mesh (no silent downgrade to
    the XLA scan, VERDICT r3 #8): the measured device time must match the
    meshless kernel's."""
    import jax
    import jax.numpy as jnp

    from lrs_pnp_dip_tpu.ops.blocks import block_grid, extract_blocks
    from lrs_pnp_dip_tpu.ops.ista import SparseProxConfig
    from lrs_pnp_dip_tpu.parallel import make_mesh, make_sharded_sparse_prox

    backend = "pallas" if device.platform not in ("cpu", "gpu") else "xla"
    cfg = SparseProxConfig(n_iter=n_ista, alpha_mode="trace4", backend=backend)
    mesh = make_mesh({"patch": 1}, devices=[device])
    prox = make_sharded_sparse_prox(mesh, cfg, "patch")
    grid = block_grid(Y.shape, 36, 36)
    Yd = jax.device_put(jnp.asarray(Y), device)
    Dd = jax.device_put(jnp.asarray(D), device)
    blocks = extract_blocks(Yd, grid)
    mask_blocks = (blocks != 0).astype(jnp.float32)

    noop = jax.jit(lambda x: x + 1.0)
    x0 = jax.device_put(jnp.float32(1.0), device)
    roundtrip_s = min(_timed_reps(noop, x0, warmup=2, reps=max(3, reps)))

    def make_chained(length):
        def chained(b, m, d):
            def body(carry, _):
                return prox(carry, m, d), ()

            out, _ = jax.lax.scan(body, b, None, length=length)
            return out.sum()

        return jax.jit(chained)

    # chain auto-doubling, same as the meshless stage (VERDICT r4 #2: a
    # guard that aborts its own measurement instead of adapting left
    # sharded_prox_device_ms null in BENCH_r04)
    compile_s = None
    times = None
    for _ in range(7):
        chained_j = make_chained(chain)
        t0 = time.perf_counter()
        _force(chained_j(blocks, mask_blocks, Dd))
        dt = time.perf_counter() - t0
        compile_s = dt if compile_s is None else compile_s
        times = _timed_reps(chained_j, blocks, mask_blocks, Dd, warmup=0, reps=reps)
        if min(times) >= max(3.0 * roundtrip_s, 0.1):
            break
        _log(
            f"[bench] sharded-prox chain ({min(times)*1e3:.1f} ms) does not "
            f"dominate the round-trip ({roundtrip_s*1e3:.1f} ms); "
            f"doubling chain {chain} -> {chain * 2}"
        )
        chain *= 2
    else:
        raise RuntimeError(
            f"sharded-prox chain never dominated the round-trip "
            f"({roundtrip_s*1e3:.1f} ms) even at chain={chain}; refusing to "
            "emit a garbage throughput number"
        )
    device_s = (min(times) - roundtrip_s) / chain
    return {
        "backend": cfg.backend,
        "mesh": "{patch: 1}",
        "chain_length": chain,
        "compile_s": round(compile_s, 2),
        "device_ms": round(device_s * 1e3, 4),
        "chained": _stats(times),
        "block_iters_per_sec": round(grid.n_blocks * n_ista / device_s, 1),
    }


def _chained_stage_ms(fn, carry0, chain, reps, roundtrip_s, min_window_s=0.1):
    """Device time per application of ``fn`` (a carry -> carry function),
    measured as a chain of ``chain`` dependent applications in ONE
    ``lax.scan`` dispatch; auto-doubles the chain until it dominates the
    tunnel round-trip AND fills an absolute ``min_window_s`` timing window.

    The absolute floor matters: the tunnel's per-dispatch latency DRIFTS
    between the round-trip calibration and the stage measurement (bench
    run 4 measured sub-ms stages at 22-49 ms because a low calibrated
    round-trip let millisecond chains pass the 3x rule while live latency
    had risen) — a >=100 ms window bounds that error at ~25%/spike and
    the min-over-reps discards isolated spikes entirely."""
    import jax
    import jax.numpy as jnp

    def make(length):
        def chained(c):
            out, _ = jax.lax.scan(lambda x, _: (fn(x), ()), c, None, length=length)
            return sum(jnp.sum(l) for l in jax.tree.leaves(out))

        return jax.jit(chained)

    for _ in range(14):  # stages can be ~0.1 ms vs a ~25 ms tunnel trip
        j = make(chain)
        _force(j(carry0))  # compile + warm
        times = _timed_reps(j, carry0, warmup=0, reps=reps)
        if min(times) >= max(3.0 * roundtrip_s, min_window_s):
            return (min(times) - roundtrip_s) / chain * 1e3, chain
        chain *= 2
    raise RuntimeError("stage chain never dominated the round-trip")


def bench_large_cube_stages(solver, D, n_ista, reps, roundtrip_s):
    """Per-stage device decomposition of the 144^2 outer iteration
    (VERDICT r4 weak #2: the 16x block-iters/s collapse vs the 36^2
    problem was unexplained and unattributed).  Each stage is measured as
    its own chained on-device scan at the full 144x144x128 geometry."""
    import jax
    import jax.numpy as jnp

    from lrs_pnp_dip_tpu.ops.blocks import block_grid, extract_blocks, scatter_blocks
    from lrs_pnp_dip_tpu.ops.ista import _alpha_specnorm, sparse_prox
    from lrs_pnp_dip_tpu.ops.metrics import mpsnr
    from lrs_pnp_dip_tpu.ops.ssim import ssim
    from lrs_pnp_dip_tpu.ops.svt import svt_gram

    consts = solver.consts
    cfg = solver.config
    h, w, b = solver.sample.shape
    grid = block_grid((h * w, b), cfg.block_size, cfg.stride)
    X0 = consts.Y
    blocks0 = extract_blocks(X0, grid)
    M = consts.mask_blocks
    Dd = consts.D
    stages = {}

    def stage(name, fn, carry0, chain=2):
        try:
            ms, used = _chained_stage_ms(fn, carry0, chain, reps, roundtrip_s)
        except Exception as e:  # one failed stage must not lose the rest
            _log(f"[bench]   stage {name} FAILED: {type(e).__name__}: {e}")
            stages[name] = {"error": f"{type(e).__name__}: {e}"}
            return
        stages[name] = {"device_ms": round(ms, 3), "chain": used}
        _log(f"[bench]   stage {name}: {ms:.2f} ms")

    # ISTA iterations only (the MXU work; carry = reconstructed blocks;
    # alpha passed precomputed, as the solver engine now does)
    stage(
        "sparse_ista",
        lambda blk: sparse_prox(blk, M, Dd, cfg.sparse, alpha=consts.alpha),
        blocks0,
    )
    # alpha power iteration alone (what the consts hoist saves per
    # iteration; tiny carry keeps the scan honest)
    stage(
        "alpha_specnorm",
        # M + 1e-25*s: numerically M (1e-25 is below f32 ulp of 1.0) but a
        # real data dependency, so LICM cannot hoist the power iteration
        lambda s: 1e-20
        * jnp.sum(_alpha_specnorm(Dd, M + 1e-25 * s, cfg.sparse.power_iters))
        + s,
        jnp.float32(1.0),
    )
    # extract + scatter round trip (the block-layout traffic)
    stage(
        "extract_scatter",
        lambda X: scatter_blocks(extract_blocks(X, grid), grid) / grid.weight(),
        X0,
    )
    # SVT via Gram/eigh
    stage("svt", lambda Z: svt_gram(Z, 1.0 / cfg.mu2), X0)
    # in-loop metrics (MPSNR + SSIM on the full cube)
    def metrics_stage(X):
        cube = X.reshape(h, w, b)
        return X * (1.0 + 1e-20 * (mpsnr(consts.clean, cube) + ssim(consts.clean, cube)))

    stage("metrics_mpsnr_ssim", metrics_stage, X0)
    return stages


def _bench_dip_es_large(sample, reps, n_steps=20):
    """Per-Adam-step time of the skip-128 DIP fit on the (1,144,144,128)
    tile with the exact vs incremental early-stop evaluator."""
    import jax
    import jax.numpy as jnp

    from lrs_pnp_dip_tpu.models import dip_skip_128
    from lrs_pnp_dip_tpu.solvers.dip import DipConfig, make_dip_fit

    model = dip_skip_128(sample.shape[2])
    x = jnp.asarray(sample.noisy)[None]
    mask = jnp.asarray(sample.mask)[None, ..., None]
    key = jax.random.PRNGKey(0)
    out = {"n_steps": n_steps, "shape": f"1x{sample.shape[0]}x{sample.shape[1]}x{sample.shape[2]}"}
    times = {}
    for mode in ("exact", "incremental"):
        cfg = DipConfig(
            num_iter=n_steps, learning_rate=0.1, buffer_size=30,
            patience=10 * n_steps, es_mode=mode,
        )
        fit = jax.jit(lambda k, xi, t, m, _f=make_dip_fit(model, cfg): _f(k, xi, t, m).loss)
        _force(fit(key, x, x, mask))
        times[mode] = min(_timed_reps(fit, key, x, x, mask, warmup=1, reps=max(2, reps // 2)))
    out["adam_step_exact_ms"] = round(times["exact"] / n_steps * 1e3, 3)
    out["adam_step_inc_ms"] = round(times["incremental"] / n_steps * 1e3, 3)
    out["inc_speedup"] = round(times["exact"] / max(times["incremental"], 1e-9), 3)
    return out


def bench_large_cube(D, reps, quick):
    """First-class large-cube throughput (VERDICT r3 #6): a 144x144x128
    whole-scene LRS-PnP outer iteration (16x the reference problem, 2,304
    blocks) measured as an on-device ``run_scanned``, plus a per-stage
    decomposition of that iteration (VERDICT r4 weak #2), plus a
    288x288x128 tile-streamed solve through
    :func:`solvers.tiled.solve_tiled` — the 'arbitrary HxWxB from day one'
    design goal, driver-captured."""
    import jax
    import jax.numpy as jnp

    from lrs_pnp_dip_tpu.data.masks import synthetic_sample
    from lrs_pnp_dip_tpu.ops.blocks import block_grid
    from lrs_pnp_dip_tpu.ops.ista import SparseProxConfig
    from lrs_pnp_dip_tpu.solvers import Solver
    from lrs_pnp_dip_tpu.utils.config import lrs_pnp_preset

    n_ista = 100
    cfg = lrs_pnp_preset(
        outer_iters=2,
        sparse=SparseProxConfig(n_iter=n_ista, alpha_mode="specnorm", h_scale=0.1),
    )
    rec = {}

    # --- whole-scene 144x144x128, one on-device scan -------------------
    hw = 144
    sample = synthetic_sample(hw, hw, 128, missing=0.05, seed=0)
    grid = block_grid((hw * hw, 128), 36, 36)
    solver = Solver(sample, D, cfg)
    # long enough that a ~25-40 ms (and volatile) tunnel round-trip can't
    # contaminate the per-iter figure: at n=5 the r5 first capture read
    # 36 ms/iter for what n=40 shows is ~15 ms/iter
    n_scan = 8 if quick else 40
    noop = jax.jit(lambda x: x + 1.0)
    roundtrip_s = min(
        _timed_reps(noop, jnp.float32(1.0), warmup=2, reps=max(3, reps))
    )
    state = solver.init_state()
    t0 = time.perf_counter()
    state, hist = solver.run_scanned(n_scan, state=state)
    float(np.asarray(hist["mpsnr"])[-1])
    compile_s = time.perf_counter() - t0
    walls = []
    for _ in range(max(2, reps // 2)):
        t0 = time.perf_counter()
        state, hist = solver.run_scanned(n_scan, state=state)
        float(np.asarray(hist["mpsnr"])[-1])
        walls.append(time.perf_counter() - t0)
    per_iter = max(min(walls) - roundtrip_s, 1e-9) / n_scan
    if min(walls) < 3.0 * roundtrip_s:
        raise RuntimeError(
            f"large-cube scan ({min(walls)*1e3:.1f} ms) does not dominate "
            f"the round-trip ({roundtrip_s*1e3:.1f} ms)"
        )
    P, K = D.shape
    sparse_flops = 4.0 * grid.n_blocks * P * K * n_ista
    rec["whole_scene_144"] = {
        "shape": f"{hw}x{hw}x128",
        "n_blocks": grid.n_blocks,
        "compile_s": round(compile_s, 2),
        "scan_iters": n_scan,
        "s_per_outer_iter": round(per_iter, 4),
        "block_iters_per_sec": round(grid.n_blocks * n_ista / per_iter, 1),
        # sparse-stage flops over the WHOLE outer-iteration time — a lower
        # bound on chip utilization, labeled as such (the r4 field divided
        # stage flops by whole-iteration time under a stage-sounding name)
        "outer_iter_tflops_lower_bound": round(sparse_flops / per_iter / 1e12, 3),
        "mpsnr_after": round(float(np.asarray(hist["mpsnr"])[-1]), 3),
    }
    try:
        stages = bench_large_cube_stages(solver, D, n_ista, reps, roundtrip_s)
        rec["whole_scene_144"]["stages"] = stages
        ista_ms = stages.get("sparse_ista", {}).get("device_ms")
        if ista_ms:
            # the TRUE sparse-stage utilization, from its own device time
            rec["whole_scene_144"]["sparse_stage_achieved_tflops"] = round(
                sparse_flops / (ista_ms / 1e3) / 1e12, 3
            )
        timed = [s["device_ms"] for s in stages.values() if "device_ms" in s]
        if len(timed) == len(stages):
            accounted = sum(timed)
            rec["whole_scene_144"]["stages_accounted_ms"] = round(accounted, 2)
            rec["whole_scene_144"]["stages_unaccounted_ms"] = round(
                per_iter * 1e3 - accounted, 2
            )
    except Exception as e:  # decomposition is additive — keep the headline
        _log(f"[bench] large-cube stage decomposition failed: "
             f"{type(e).__name__}: {e}")

    # --- DIP early-stop evaluators at tile scale ------------------------
    # At 36^2 the ES cost is latency-dominated and 'incremental' measures
    # neutral (r5); at 144^2 the window is 30 x 2.65M floats = 318 MB, so
    # the 'exact' evaluator streams ~2x that from HBM per DIP iteration
    # while 'incremental' touches O(D).  This field measures the regime
    # the incremental mode exists for.
    if not quick:
        try:
            rec["dip_es_144"] = _bench_dip_es_large(sample, reps)
            d = rec["dip_es_144"]
            _log(
                f"[bench] 144^2 DIP Adam step: exact-ES {d['adam_step_exact_ms']:.2f} ms "
                f"vs incremental-ES {d['adam_step_inc_ms']:.2f} ms "
                f"({d['inc_speedup']:.2f}x)"
            )
        except Exception as e:
            _log(f"[bench] 144^2 DIP ES comparison failed: {type(e).__name__}: {e}")

    # --- tile-streamed 288x288x128 through solve_tiled ------------------
    if not quick:
        from lrs_pnp_dip_tpu.data.masks import bernoulli_mask, corrupt
        from lrs_pnp_dip_tpu.solvers.tiled import solve_tiled

        hw2 = 288
        big = synthetic_sample(hw2, hw2, 128, missing=0.0, seed=1)
        mask = bernoulli_mask((hw2, hw2), keep_prob=0.95, seed=2)
        noisy = corrupt(big.clean, mask, noise_sigma=0.12, seed=3)
        n_tiles = (hw2 // 144) ** 2
        t0 = time.perf_counter()
        out = solve_tiled(
            noisy, mask, D, cfg, tile_shape=(144, 144), tile_batch=1, n_iters=2
        )
        wall = time.perf_counter() - t0
        assert np.isfinite(out).all()
        # warm pass: same executables (jit cache), so this is the
        # sustained scene-streaming rate without the one-time compile
        t0 = time.perf_counter()
        out = solve_tiled(
            noisy, mask, D, cfg, tile_shape=(144, 144), tile_batch=1, n_iters=2
        )
        warm = time.perf_counter() - t0
        rec["tile_streamed_288"] = {
            "shape": f"{hw2}x{hw2}x128",
            "tile": "144x144",
            "n_tiles": n_tiles,
            "outer_iters": 2,
            "wall_s_includes_compile": round(wall, 3),
            "wall_s_warm": round(warm, 3),
            "s_per_tile_iter_warm": round(warm / (n_tiles * 2), 4),
        }
    return rec


def bench_outer(sample, D, reps, quick):
    """Full LRS-PnP-DIP outer iteration (sparse prox + DIP + X update +
    duals + metrics) and sustained run_scanned throughput."""
    import jax

    from lrs_pnp_dip_tpu.solvers import Solver
    from lrs_pnp_dip_tpu.utils.config import dip_preset

    cfg = dip_preset()
    solver = Solver(sample, D, cfg)
    state = solver.init_state()

    t0 = time.perf_counter()
    st, aux = solver.step(state)
    dip_iters = int(np.asarray(aux.dip_iters))  # forces completion
    compile_s = time.perf_counter() - t0
    times = _timed_reps(lambda s: solver.step(s)[0].X.sum(), state, warmup=1, reps=reps)

    n_scan = 5 if quick else 10
    t0 = time.perf_counter()
    final, hist = solver.run_scanned(n_scan, state=state)  # hist fetch syncs
    scan_compile_plus_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    final, hist = solver.run_scanned(n_scan, state=state)
    scan_s = time.perf_counter() - t0

    # fast-path variant: the SAME faithful preset (same ES patience, so
    # DIP iteration counts stay comparable) with the two MXU/HBM fast
    # paths on — bf16 DIP compute + incremental early stop.  Sustained
    # s/outer-iter vs the faithful number = end-to-end fast-path speedup.
    import dataclasses

    fast_cfg = dataclasses.replace(
        cfg,
        dip=dataclasses.replace(
            cfg.dip, compute_dtype="bfloat16", es_mode="incremental"
        ),
    )
    fast_solver = Solver(sample, D, fast_cfg)
    fast_state = fast_solver.init_state()
    fast_solver.run_scanned(n_scan, state=fast_state)  # compile + warm
    t0 = time.perf_counter()
    _, fast_hist = fast_solver.run_scanned(n_scan, state=fast_state)
    fast_scan_s = time.perf_counter() - t0

    return {
        "variant": "dip (faithful preset)",
        "compile_s": round(compile_s, 2),
        "outer_iter": _stats(times),
        "dip_iters_first_step": dip_iters,
        "scan_iters": n_scan,
        "scan_first_s": round(scan_compile_plus_run, 2),
        "scan_s": round(scan_s, 3),
        "outer_iters_per_sec_sustained": round(n_scan / scan_s, 3),
        "sustained_s_per_outer_iter": round(scan_s / n_scan, 3),
        "final_mpsnr": float(np.asarray(hist["mpsnr"])[-1]),
        "fastpath": {
            "dip": "bf16 compute + incremental ES (same patience)",
            "scan_s": round(fast_scan_s, 3),
            "outer_iters_per_sec_sustained": round(n_scan / fast_scan_s, 3),
            "sustained_s_per_outer_iter": round(fast_scan_s / n_scan, 3),
            "speedup_vs_faithful": round(scan_s / max(fast_scan_s, 1e-9), 3),
            "final_mpsnr": float(np.asarray(fast_hist["mpsnr"])[-1]),
        },
    }


class _MicroOnly(Exception):
    pass


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="fewer timing reps")
    p.add_argument("--skip-cpu", action="store_true", help="skip the CPU comparator")
    p.add_argument(
        "--watchdog", type=int, default=2400,
        help="seconds before wedge fallback (a full run with cold remote "
        "compiles measures 13-18 min; 1500 s left no slack for a slow "
        "tunnel session)",
    )
    p.add_argument(
        "--micro-only",
        action="store_true",
        help="sparse-prox microkernel only (CPU smoke tests; the DIP/outer "
        "stages are far too slow on a 2-vCPU host)",
    )
    args = p.parse_args()
    wd = _watchdog(args.watchdog)

    import jax

    reps = 2 if args.quick else 4
    chain = 10 if args.quick else 50
    n_ista = 100

    sample, Y, D = _problem()
    main_dev = jax.devices()[0]
    on_accel = main_dev.platform not in ("cpu", "gpu")

    full = {
        "jax": jax.__version__,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "device": str(main_dev),
        "device_kind": getattr(main_dev, "device_kind", main_dev.platform),
        "quick": args.quick,
    }

    _log(f"[bench] sparse prox on {main_dev.platform} "
         f"(chain={chain}, reps={reps}) ...")
    sp = bench_sparse_prox(main_dev, Y, D, n_ista, chain, reps)
    full["sparse_prox"] = sp
    _log(
        f"[bench] sparse prox on {main_dev.platform}: {sp['device_ms']:.2f} ms device "
        f"({sp['block_iters_per_sec']:,.0f} block-ISTA iters/s, "
        f"{sp['achieved_tflops']:.1f} TF/s = {sp['mfu_vs_bf16_peak']*100:.1f}% of bf16 peak); "
        f"single-call {sp['dispatch_ms']['min_ms']:.2f} ms, "
        f"tunnel round-trip {sp['roundtrip_ms']:.2f} ms"
    )

    if on_accel:
        try:
            _log("[bench] sparse prox bf16-MXU variant ...")
            sp16 = bench_sparse_prox(
                main_dev, Y, D, n_ista, sp["chain_length"], reps,
                matmul_dtype="bfloat16",
            )
            full["sparse_prox_bf16"] = sp16
            speedup = sp["device_ms"] / max(sp16["device_ms"], 1e-9)
            _log(
                f"[bench] bf16 matmuls: {sp16['device_ms']:.2f} ms device "
                f"({sp16['block_iters_per_sec']:,.0f} block-ISTA iters/s, "
                f"{speedup:.2f}x vs f32)"
            )
        except Exception as e:  # additive measurement — never lose the headline
            _log(f"[bench] bf16 variant failed: {type(e).__name__}: {e}")

    vs_baseline = 1.0
    if not args.skip_cpu:
        try:
            cpu_dev = jax.devices("cpu")[0]
            if cpu_dev != main_dev:
                _log("[bench] sparse prox on host cpu ...")
                sp_cpu = bench_sparse_prox(
                    cpu_dev, Y, D, n_ista, chain=2, reps=max(2, reps // 2)
                )
                full["sparse_prox_cpu"] = sp_cpu
                vs_baseline = sp_cpu["device_ms"] / sp["device_ms"]
                _log(
                    f"[bench] sparse prox on cpu: {sp_cpu['device_ms']:.2f} ms -> "
                    f"speedup {vs_baseline:.2f}x"
                )
        except RuntimeError as e:
            _log(f"[bench] no cpu baseline: {e}")

    try:
        if args.micro_only:
            _log("[bench] --micro-only: skipping end-to-end stages")
            raise _MicroOnly
        _log("[bench] shard_map'd sparse prox ({patch:1} mesh) ...")
        try:
            full["sharded_prox"] = bench_sharded_prox(
                main_dev, Y, D, n_ista, sp["chain_length"], reps
            )
            ratio = full["sharded_prox"]["device_ms"] / max(sp["device_ms"], 1e-9)
            _log(
                f"[bench] sharded prox: {full['sharded_prox']['device_ms']:.2f} ms "
                f"device ({ratio:.2f}x the meshless kernel — "
                f"{'no downgrade' if ratio < 1.5 else 'DOWNGRADE SUSPECTED'})"
            )
        except Exception as e:
            _log(f"[bench] sharded prox failed: {type(e).__name__}: {e}")
        _log("[bench] DIP prox (skip-128 Adam steps, while_loop vs scan) ...")
        full["dip"] = bench_dip(sample, reps=max(2, reps // 2), quick=args.quick)
        _log(
            f"[bench] DIP Adam step: {full['dip']['adam_step_ms']:.3f} ms while_loop "
            f"vs {full['dip']['adam_step_scan_ms']:.3f} ms bare scan "
            f"(while_loop overhead {full['dip']['while_loop_overhead_pct']:+.1f}%, "
            f"incremental-ES {full['dip']['adam_step_inc_es_ms']:.3f} ms = "
            f"{full['dip']['inc_es_overhead_pct']:+.1f}%); "
            f"bf16 fit {full['dip']['adam_step_bf16_ms']:.3f} ms "
            f"({full['dip']['bf16_speedup']:.2f}x)"
        )
        _log("[bench] full LRS-PnP-DIP outer iteration + run_scanned ...")
        full["outer"] = bench_outer(sample, D, reps=max(2, reps // 2), quick=args.quick)
        _log(
            f"[bench] outer iter: {full['outer']['outer_iter']['min_ms']:.0f} ms "
            f"(dip_iters={full['outer']['dip_iters_first_step']}); sustained "
            f"{full['outer']['sustained_s_per_outer_iter']:.3f} s/outer-iter "
            f"over a {full['outer']['scan_iters']}-iter on-device scan; "
            f"fast path {full['outer']['fastpath']['sustained_s_per_outer_iter']:.3f} "
            f"s/outer-iter ({full['outer']['fastpath']['speedup_vs_faithful']:.2f}x)"
        )
        _log("[bench] large-cube throughput (144^2 whole-scene + 288^2 tiled) ...")
        try:
            full["large_cube"] = bench_large_cube(
                D, reps=max(2, reps // 2), quick=args.quick
            )
            ws = full["large_cube"]["whole_scene_144"]
            _log(
                f"[bench] large cube 144x144x128: {ws['s_per_outer_iter']:.3f} "
                f"s/outer-iter ({ws['block_iters_per_sec']:,.0f} block-iters/s, "
                f"sparse stage {ws.get('sparse_stage_achieved_tflops', float('nan')):.1f} TF/s, "
                f"unaccounted {ws.get('stages_unaccounted_ms', float('nan')):.0f} ms)"
            )
        except Exception as e:
            _log(f"[bench] large cube failed: {type(e).__name__}: {e}")
    except _MicroOnly:
        pass
    except Exception as e:  # end-to-end stages are additive — never lose the headline
        _log(f"[bench] end-to-end stages failed: {type(e).__name__}: {e}")
        full["end_to_end_error"] = f"{type(e).__name__}: {e}"

    wd.cancel()
    result = {
        "metric": "pnp_ista_block_iters_per_sec",
        "value": sp["block_iters_per_sec"],
        "unit": "block_iters/s",
        "vs_baseline": round(vs_baseline, 3),
        "device_ms": sp["device_ms"],
        "dispatch_ms": sp["dispatch_ms"]["min_ms"],
        "mfu_vs_bf16_peak": sp["mfu_vs_bf16_peak"],
        "measured_mfu": _measured_mfu(),
        "outer_iters_per_sec": full.get("outer", {}).get(
            "outer_iters_per_sec_sustained"
        ),
        "outer_iters_per_sec_fastpath": full.get("outer", {})
        .get("fastpath", {})
        .get("outer_iters_per_sec_sustained"),
        "dip_adam_step_ms": full.get("dip", {}).get("adam_step_ms"),
        "dip_adam_step_scan_ms": full.get("dip", {}).get("adam_step_scan_ms"),
        "dip_adam_step_bf16_ms": full.get("dip", {}).get("adam_step_bf16_ms"),
        "sharded_prox_device_ms": full.get("sharded_prox", {}).get("device_ms"),
        "large_cube": {
            "s_per_outer_iter_144": full.get("large_cube", {})
            .get("whole_scene_144", {})
            .get("s_per_outer_iter"),
            "block_iters_per_sec_144": full.get("large_cube", {})
            .get("whole_scene_144", {})
            .get("block_iters_per_sec"),
            "tile_streamed_288_wall_s": full.get("large_cube", {})
            .get("tile_streamed_288", {})
            .get("wall_s_includes_compile"),
        },
        "device_kind": full["device_kind"],
        "reps": reps,
        "chain": sp["chain_length"],
    }
    full["headline"] = result
    os.makedirs(_ART, exist_ok=True)
    with open(_FULL_RESULT, "w") as f:
        json.dump(full, f, indent=1)
    if on_accel:
        with open(_LAST_RESULT, "w") as f:
            json.dump(result, f)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
