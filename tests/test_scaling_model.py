"""Mechanical validation of the analytic scaling model (docs/DESIGN.md §6).

The model states, per stage and mesh layout, exactly which collectives the
compiled program performs and how many bytes each moves.  These tests
compile every sharded stage on the virtual 8-device mesh and parse the
optimized (post-SPMD-partitioning) HLO for collective ops, asserting:

  * the patch-sharded sparse prox is collective-FREE (embarrassingly
    parallel — the claim behind its "linear speedup" row);
  * the 2-D {patch, band} sparse prox performs exactly one all-reduce
    shape class, the (nB/p, K) per-ISTA-iteration gradient psum — and
    never gathers the block tensor;
  * the patch-sharded SVT's only collective is the B×B Gram psum
    (the "64 KB per outer iter" claim at B=128);
  * the 2-D SVT adds exactly one all-gather of the (P/p, B) row-slab.

This turns DESIGN §6 from prose into a contract: if a refactor introduces
an unmodeled collective (e.g. GSPMD silently all-gathering an operand),
these tests fail.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lrs_pnp_dip_tpu.ops.ista import SparseProxConfig
from lrs_pnp_dip_tpu.parallel import (
    make_distributed_svt,
    make_distributed_svt_2d,
    make_mesh,
    make_sharded_sparse_prox,
    make_sharded_sparse_prox_2d,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

# HLO collective op kinds (sync + async-start forms)
_COLLECTIVE_RE = re.compile(
    r"(\w+)\[([\d,]*)\][^=]*\s"
    r"(all-reduce|all-gather|reduce-scatter|all-to-all|collective-permute)"
    r"(?:-start)?\("
)


def _collectives(fn, *args):
    """Compile fn(*args) and return [(kind, dtype, shape tuple), ...] for
    every collective in the optimized HLO (deduplicated per HLO line)."""
    hlo = jax.jit(fn).lower(*args).compile().as_text()
    out = []
    for line in hlo.splitlines():
        m = _COLLECTIVE_RE.search(line)
        if m and "-done(" not in line:
            dtype, shape, kind = m.group(1), m.group(2), m.group(3)
            dims = tuple(int(d) for d in shape.split(",") if d)
            out.append((kind, dtype, dims))
    return out


def _problem(nB=16, P=64, K=32, seed=0):
    rng = np.random.default_rng(seed)
    blocks = jnp.asarray(rng.standard_normal((nB, P)), jnp.float32)
    mask = jnp.asarray(rng.random((nB, P)) > 0.2, jnp.float32)
    D = jnp.asarray(rng.standard_normal((P, K)) / np.sqrt(P), jnp.float32)
    return blocks, mask, D


def test_patch_sharded_sparse_prox_is_collective_free():
    """DESIGN §6 sparse-prox row 1: `{patch: p}` → no collectives."""
    mesh = make_mesh({"patch": 8})
    cfg = SparseProxConfig(n_iter=5, backend="xla")
    prox = make_sharded_sparse_prox(mesh, cfg)
    blocks, mask, D = _problem()
    assert _collectives(prox, blocks, mask, D) == []


def test_2d_sparse_prox_single_psum_of_model_size():
    """DESIGN §6 sparse-prox row 2: `{patch: p, band: b}` → one psum class
    of the (nB/p, K) gradient partial per ISTA iteration, nothing else."""
    nB, P, K = 16, 64, 32
    mesh = make_mesh({"patch": 4, "band": 2})
    cfg = SparseProxConfig(n_iter=5, backend="xla")
    prox = make_sharded_sparse_prox_2d(mesh, cfg)
    blocks, mask, D = _problem(nB, P, K)
    colls = _collectives(prox, blocks, mask, D)
    assert colls, "2-D sparse prox must psum the gradient partials"
    kinds = {kind for kind, _, _ in colls}
    assert kinds == {"all-reduce"}, f"unmodeled collective kinds: {kinds}"
    # every all-reduce is the modeled (nB/p, K) partial — never the block
    # tensor (nB/p, P) or the full dictionary
    model_elems = (nB // 4) * K
    for kind, dtype, dims in colls:
        elems = int(np.prod(dims)) if dims else 1
        assert elems <= model_elems, (
            f"all-reduce of {dims} ({elems} elems) exceeds the modeled "
            f"(nB/p, K) = {model_elems} gradient psum"
        )
    assert any(int(np.prod(d)) == model_elems for _, _, d in colls)


def test_patch_sharded_svt_only_gram_psum():
    """DESIGN §6 SVT row 1: `{patch: p}` → one B×B Gram psum (64 KB at
    B=128), no gather of X."""
    Prows, B = 256, 16
    mesh = make_mesh({"patch": 8})
    svt = make_distributed_svt(mesh)
    X = jnp.asarray(np.random.default_rng(0).standard_normal((Prows, B)),
                    jnp.float32)
    colls = _collectives(svt, X, jnp.float32(0.1))
    kinds = {kind for kind, _, _ in colls}
    assert kinds == {"all-reduce"}, f"unmodeled collective kinds: {kinds}"
    for _, _, dims in colls:
        assert int(np.prod(dims)) <= B * B
    assert any(int(np.prod(d)) == B * B for _, _, d in colls)


def test_2d_svt_gather_plus_gram_psum():
    """DESIGN §6 SVT row 2: `{patch: p, band: b}` → one all-gather of the
    (P/p, B) row-slab over band plus the B×B psum."""
    Prows, B, p, b = 256, 16, 4, 2
    mesh = make_mesh({"patch": p, "band": b})
    svt = make_distributed_svt_2d(mesh)
    X = jnp.asarray(np.random.default_rng(0).standard_normal((Prows, B)),
                    jnp.float32)
    colls = _collectives(svt, X, jnp.float32(0.1))
    kinds = {kind for kind, _, _ in colls}
    assert kinds == {"all-reduce", "all-gather"}, (
        f"unmodeled collective kinds: {kinds}"
    )
    gathers = [dims for kind, _, dims in colls if kind == "all-gather"]
    assert len(gathers) == 1, f"model allows ONE all-gather, got {gathers}"
    assert int(np.prod(gathers[0])) == (Prows // p) * B
    reduces = [dims for kind, _, dims in colls if kind == "all-reduce"]
    for dims in reduces:
        assert int(np.prod(dims)) <= B * B
    assert any(int(np.prod(d)) == B * B for d in reduces)
