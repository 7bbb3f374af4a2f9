"""Tensor-parallel (channel-sharded) DIP training — equivalence pins
(VERDICT r2 next #8: the last open cell of the SURVEY §2.5 matrix)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lrs_pnp_dip_tpu.models import Skip
from lrs_pnp_dip_tpu.parallel import make_mesh
from lrs_pnp_dip_tpu.parallel.tensor import (
    channel_sharding_specs,
    make_tp_dip_step,
    shard_channelwise,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _net(bands=16, width=8):
    return Skip(
        num_output_channels=bands,
        channels_down=(width, width),
        channels_up=(width, width),
        channels_skip=(4, 4),
        pad="reflection",
    )


def _problem(bands=16, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, bands)).astype(np.float32))
    target = jnp.asarray(rng.standard_normal((1, 16, 16, bands)).astype(np.float32))
    mask = jnp.asarray((rng.random((1, 16, 16, 1)) > 0.2).astype(np.float32))
    return x, target, mask


def test_channel_shardings_actually_shard():
    mesh = make_mesh({"model": 4}, devices=jax.devices()[:4])
    model = _net()
    x, _, _ = _problem()
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    sharded = shard_channelwise(params, mesh)
    kernels = [
        leaf for leaf in jax.tree.leaves(sharded)
        if leaf.ndim == 4 and leaf.shape[-1] % 4 == 0
    ]
    assert kernels, "no conv kernels found"
    for k in kernels:
        assert len(k.sharding.device_set) == 4, (
            f"kernel {k.shape} not sharded: {k.sharding}"
        )


def test_tp_dip_step_matches_unsharded():
    """Three channel-sharded Adam steps == three single-device steps: GSPMD
    partitioning of the convs must be numerically exact (tolerance covers
    reduction-order drift only)."""
    import optax

    mesh = make_mesh({"model": 4}, devices=jax.devices()[:4])
    model = _net()
    x, target, mask = _problem()
    key = jax.random.PRNGKey(42)

    # --- reference: unsharded on one device ---------------------------
    variables = model.init(key, x)
    params0 = variables["params"]
    state0 = {k: v for k, v in variables.items() if k != "params"}
    opt = optax.adam(0.1)

    def loss_fn(p, ms):
        vs = {"params": p, **ms}
        if ms:
            out, new = model.apply(vs, x, mutable=list(ms))
        else:
            out, new = model.apply(vs, x), {}
        return jnp.mean((target * mask - out * mask) ** 2), (out, new)

    @jax.jit
    def ref_step(p, ms, os_):
        (loss, (out, new)), g = jax.value_and_grad(loss_fn, has_aux=True)(p, ms)
        upd, os_ = opt.update(g, os_, p)
        return optax.apply_updates(p, upd), new, os_, loss, out

    p_ref, s_ref, o_ref = params0, state0, jax.jit(opt.init)(params0)
    for _ in range(3):
        p_ref, s_ref, o_ref, loss_ref, out_ref = ref_step(p_ref, s_ref, o_ref)

    # --- tensor-parallel ----------------------------------------------
    init, step = make_tp_dip_step(model, mesh, learning_rate=0.1)
    p_tp, s_tp, o_tp = init(key, x)

    # the partitioned computation itself (loss + grads) must match tightly;
    # post-Adam params are NOT compared step-for-step because Adam's
    # m/sqrt(v) normalization amplifies reduction-order drift on
    # near-zero gradients into O(lr) parameter differences by design
    grad_ref = jax.jit(jax.grad(lambda p: loss_fn(p, state0)[0]))(params0)
    grad_tp = jax.jit(jax.grad(lambda p: loss_fn(p, s_tp)[0]))(p_tp)
    for a, b in zip(jax.tree.leaves(grad_tp), jax.tree.leaves(grad_ref)):
        scale = max(float(np.max(np.abs(np.asarray(b)))), 1e-3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4 * scale, rtol=1e-3)

    for _ in range(3):
        p_tp, s_tp, o_tp, loss_tp, out_tp = step(p_tp, s_tp, o_tp, x, target, mask)

    np.testing.assert_allclose(float(loss_tp), float(loss_ref), rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out_tp), np.asarray(out_ref), atol=2e-3, rtol=1e-2
    )


def test_tp_specs_replicate_indivisible():
    """Width not divisible by the axis -> replicated spec, never an error."""
    mesh = make_mesh({"model": 4}, devices=jax.devices()[:4])
    params = {"w": jnp.zeros((3, 3, 5, 6)), "b": jnp.zeros((7,))}
    specs = channel_sharding_specs(params, mesh)
    assert specs["w"].spec == ()  # replicated (6 % 4 != 0)
    assert specs["b"].spec == ()
