"""Standalone DIP trainer (model-zoo component M15).

Re-designs reference ``include/fit.py:12-141``: a generic DIP fit loop with

  * optimizer choice (adam / sgd),
  * optional *input* optimization (the noise input is a trainable leaf),
  * additive input-noise regularisation with exponential decay
    (``reg_noise_std`` multiplied by ``reg_noise_decay`` every
    ``reg_noise_decayevery`` steps),
  * exponential learning-rate decay (``exp_lr_scheduler`` equivalent via
    optax schedule),
  * loss modes: plain MSE, masked MSE, or MSE after a user measurement
    map ``apply_f``,
  * ``find_best``: keep the parameters of the lowest-loss step (the
    reference keeps a net snapshot whenever loss improves by >= 1%).

Everything runs as one ``lax.scan`` over steps — fixed length, snapshots
carried functionally (no host checkpointing mid-loop).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class FitConfig:
    num_iter: int = 5000
    lr: float = 0.01
    optimizer: str = "adam"  # 'adam' | 'sgd'
    opt_input: bool = False
    reg_noise_std: float = 0.0
    reg_noise_decay: float = 0.7
    reg_noise_decayevery: int = 100000
    lr_decay_epoch: int = 0  # 0 = constant lr
    lr_decay_rate: float = 0.65
    find_best: bool = True


class FitResult(NamedTuple):
    out: jnp.ndarray
    params: Any
    best_params: Any
    losses: jnp.ndarray
    net_input: jnp.ndarray


def find_best_update(loss, best_loss, best_params, eval_params, rel: float = 1.005):
    """Snapshot rule of reference ``include/fit.py:133``: keep the params a
    loss was computed at only when it improves the best by >= (rel-1)
    (``if best_mse > 1.005*loss.data``).  A loss merely close to the best
    must NOT overwrite the snapshot."""
    improved = loss * rel < best_loss
    best_loss = jnp.where(improved, loss, best_loss)
    best_params = jax.tree.map(
        lambda b, p: jnp.where(improved, p, b), best_params, eval_params
    )
    return best_loss, best_params


def fit(
    model: nn.Module,
    key,
    net_input: jnp.ndarray,
    target: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    apply_f: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    config: FitConfig = FitConfig(),
) -> FitResult:
    """Train a DIP net on one target. Returns final + best params."""
    cfg = config
    init_key, noise_key = jax.random.split(key)
    variables = model.init(init_key, net_input)
    params = variables["params"]
    model_state = {k: v for k, v in variables.items() if k != "params"}

    if cfg.lr_decay_epoch > 0:
        schedule = optax.exponential_decay(
            cfg.lr, cfg.lr_decay_epoch, cfg.lr_decay_rate, staircase=True
        )
    else:
        schedule = cfg.lr
    if cfg.optimizer == "adam":
        opt = optax.adam(schedule)
    elif cfg.optimizer == "sgd":
        opt = optax.sgd(schedule, momentum=0.9)
    elif cfg.optimizer == "lbfgs":
        # reference include/fit.py offered LBFGS with an Adam warmup;
        # optax.lbfgs carries its own linesearch
        opt = optax.lbfgs()
    else:
        raise ValueError(cfg.optimizer)

    leaves = {"params": params}
    if cfg.opt_input:
        leaves["net_input"] = net_input
    opt_state = opt.init(leaves)

    def loss_of(out):
        if apply_f is not None:
            out = apply_f(out)
        if mask is not None:
            return jnp.mean((out * mask - target * mask) ** 2)
        return jnp.mean((out - target) ** 2)

    def loss_fn(leaves, model_state, noise):
        inp = leaves.get("net_input", net_input) + noise
        variables = {"params": leaves["params"], **model_state}
        if model_state:
            out, new_state = model.apply(variables, inp, mutable=list(model_state))
        else:
            out, new_state = model.apply(variables, inp), {}
        return loss_of(out), (out, new_state)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(carry, i):
        leaves, model_state, opt_state, best_loss, best_params, nkey = carry
        nkey, sub = jax.random.split(nkey)
        decay_steps = i // cfg.reg_noise_decayevery
        std = cfg.reg_noise_std * (cfg.reg_noise_decay ** decay_steps.astype(jnp.float32))
        noise = std * jax.random.normal(sub, net_input.shape)
        (loss, (out, new_state)), grads = grad_fn(leaves, model_state, noise)
        eval_params = leaves["params"]  # params the loss was computed at
        if cfg.optimizer == "lbfgs":
            updates, opt_state = opt.update(
                grads, opt_state, leaves, value=loss, grad=grads,
                value_fn=lambda l: loss_fn(l, model_state, noise)[0],
            )
        else:
            updates, opt_state = opt.update(grads, opt_state, leaves)
        leaves = optax.apply_updates(leaves, updates)
        if cfg.find_best:
            best_loss, best_params = find_best_update(
                loss, best_loss, best_params, eval_params
            )
        return (leaves, new_state, opt_state, best_loss, best_params, nkey), (loss, out)

    carry0 = (leaves, model_state, opt_state, jnp.asarray(jnp.inf), params, noise_key)
    (leaves, model_state, _, _, best_params, _), (losses, outs) = jax.lax.scan(
        step, carry0, jnp.arange(cfg.num_iter)
    )
    return FitResult(
        out=outs[-1],
        params=leaves["params"],
        best_params=best_params,
        losses=losses,
        net_input=leaves.get("net_input", net_input),
    )
