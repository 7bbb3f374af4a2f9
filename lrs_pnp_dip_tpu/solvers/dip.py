"""Per-image Deep-Image-Prior training — the DIP prox of the ADMM loop.

Reference semantics (``get_DIP_out``, ``main_LRS_PnP_DIP_pro.py:211-274``):
every outer ADMM iteration builds a FRESH network, trains it with Adam
(lr 0.1) on the masked MSE against the fixed noisy target
``mse(target * mask, out * mask)``, with the network *input* being the
current ADMM iterate ``X + lambda_2/mu_2`` (image-conditioned DIP, not
noise-input), and returns the output at the windowed-variance early stop.

TPU-first: the whole fit is ONE compiled ``lax.while_loop`` whose body is
forward + backward + Adam update + early-stop bookkeeping; the loop exits
at the stop condition without host round-trips.  Fresh-net-per-call is a
new PRNG split — same compiled computation, new init.

The reference's latent bug of returning ``None`` when early stop never
fires (SURVEY A9) is *not* reproduced: we return the final output and an
explicit ``stopped`` flag.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ..utils.config import DipConfig  # re-exported for API stability
from .early_stop import EarlyStopState, init_early_stop, update_early_stop


class DipResult(NamedTuple):
    out: jnp.ndarray  # network output at stop (N, H, W, C)
    loss: jnp.ndarray  # final masked-MSE loss
    n_iters: jnp.ndarray  # iterations actually run
    stopped: jnp.ndarray  # whether early stop fired


class _FitState(NamedTuple):
    params: Any
    model_state: Any
    opt_state: Any
    out: jnp.ndarray
    loss: jnp.ndarray
    es: EarlyStopState
    i: jnp.ndarray


def make_dip_fit(
    model: nn.Module, cfg: DipConfig = DipConfig(), param_constraint=None
):
    """Build a jit-able ``fit(key, dip_input, target, mask) -> DipResult``.

    ``dip_input``/``target``: (N, H, W, C); ``mask``: broadcastable to them
    (the observation mask; loss is computed on observed pixels only).

    ``param_constraint`` (optional): a ``pytree -> pytree`` applied to the
    freshly initialised params/model-state (e.g.
    ``parallel.tensor.make_channel_constraint`` — tensor parallelism over a
    ``model`` mesh axis).  It runs INSIDE the fit, because the fresh-per-
    outer-iteration params never exist outside the jitted step; GSPMD then
    propagates the layout through the Adam while_loop.
    """
    if cfg.return_mode not in ("last", "window_mean"):
        raise ValueError(
            f"DipConfig.return_mode must be 'last' or 'window_mean', "
            f"got {cfg.return_mode!r}"
        )
    if cfg.es_mode not in ("exact", "incremental"):
        raise ValueError(
            f"DipConfig.es_mode must be 'exact' or 'incremental', "
            f"got {cfg.es_mode!r}"
        )
    opt = optax.adam(cfg.learning_rate)
    cdtype = jnp.dtype(cfg.compute_dtype)

    def loss_fn(params, model_state, dip_input, target, mask):
        if cdtype != jnp.float32:
            params = jax.tree.map(lambda p: p.astype(cdtype), params)
            dip_input = dip_input.astype(cdtype)
        variables = {"params": params, **model_state}
        if model_state:
            out, new_state = model.apply(variables, dip_input, mutable=list(model_state))
        else:
            out, new_state = model.apply(variables, dip_input), {}
        out = out.astype(jnp.float32)
        loss = jnp.mean((target * mask - out * mask) ** 2)
        return loss, (out, new_state)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def fit(key, dip_input, target, mask) -> DipResult:
        if param_constraint is not None and hasattr(param_constraint, "inputs"):
            # channel TP: replicate the data tensors so the convs partition
            # over features, not space (see tensor.make_channel_constraint)
            dip_input = param_constraint.inputs(dip_input)
            target = param_constraint.inputs(target)
            mask = param_constraint.inputs(mask)
        variables = model.init(key, dip_input)
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}
        if param_constraint is not None:
            # the `born` variant (when provided) pins the initializer
            # outputs replicated before the channel layout, keeping the
            # constraint from back-propagating into the PRNG while_loop
            born = getattr(param_constraint, "born", param_constraint)
            params = born(params)
            model_state = born(model_state)
        opt_state = opt.init(params)
        if param_constraint is not None:
            # Adam's m/v mirror the param tree — born in the same channel
            # layout, so the while-loop carry never changes sharding
            opt_state = param_constraint(opt_state)
        out_dim = 1
        for d in target.shape:
            out_dim *= int(d)

        def cond(s: _FitState):
            return jnp.logical_and(~s.es.stop, s.i < cfg.num_iter)

        def body(s: _FitState) -> _FitState:
            (loss, (out, new_model_state)), grads = grad_fn(
                s.params, s.model_state, dip_input, target, mask
            )
            if param_constraint is not None and hasattr(param_constraint, "inputs"):
                # keep the carried output replicated: its post-loop
                # consumers (U -> the row-sharded X update) would otherwise
                # back-propagate a spatial sharding into the conv stack
                out = param_constraint.inputs(out)
            if param_constraint is not None:
                # kernel grads come out of a grad-conv whose spatial dims
                # GSPMD may tile over the data-layout axes; pin them to the
                # channel layout before they meet Adam's m/v
                grads = param_constraint(grads)
            updates, opt_state = opt.update(grads, s.opt_state, s.params)
            params = optax.apply_updates(s.params, updates)
            if param_constraint is not None:
                # re-anchor the layout every iteration: without this the
                # loop body's preferred shardings win inside the while
                # carry and SPMD inserts a replicate-then-repartition
                # ("involuntary full rematerialization") per outer step
                params = param_constraint(params)
                new_model_state = param_constraint(new_model_state)
                opt_state = param_constraint(opt_state)
            es = jax.lax.cond(
                s.i % cfg.show_every == 0,
                lambda e: update_early_stop(e, out.reshape(-1), s.i, cfg.patience),
                lambda e: e,
                s.es,
            )
            return _FitState(params, new_model_state, opt_state, out, loss, es, s.i + 1)

        init = _FitState(
            params=params,
            model_state=model_state,
            opt_state=opt_state,
            out=jnp.zeros(target.shape, jnp.float32),
            loss=jnp.asarray(jnp.inf, jnp.float32),
            es=init_early_stop(
                cfg.buffer_size, out_dim,
                incremental=cfg.es_mode == "incremental",
            ),
            i=jnp.zeros((), jnp.int32),
        )
        final = jax.lax.while_loop(cond, body, init)
        if cfg.return_mode == "window_mean":
            n_seen = jnp.minimum(final.es.count, cfg.buffer_size)
            out = jnp.where(
                n_seen > 0,
                jnp.mean(final.es.window, axis=0).reshape(target.shape)
                * (cfg.buffer_size / jnp.maximum(n_seen, 1)),
                final.out,
            )
        else:
            out = final.out
        return DipResult(
            out=out, loss=final.loss, n_iters=final.i, stopped=final.es.stop
        )

    return fit


def get_dip_out(
    model: nn.Module,
    key,
    dip_input,
    target,
    mask,
    num_iter: int = 5000,
    learning_rate: float = 0.1,
    show_every: int = 1,
) -> DipResult:
    """One-shot convenience mirroring the reference ``get_DIP_out`` call."""
    cfg = DipConfig(num_iter=num_iter, learning_rate=learning_rate, show_every=show_every)
    return jax.jit(make_dip_fit(model, cfg))(key, dip_input, target, mask)
