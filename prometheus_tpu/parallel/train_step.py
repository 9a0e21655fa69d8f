"""pjit train-step factory: grad accumulation, EMA, mutable model state.

Replaces the reference's Lightning training loop mechanics
(DDP grad all-reduce, ``accumulate_grad_batches``, EMA update at
``base_system.py:447-460``) with one jit-compiled step: data-parallel
gradients are averaged by XLA-inserted collectives (via shardings), gradient
accumulation is a ``lax.scan`` over micro-batches, and the EMA parameter copy
is updated in the same program.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass
class TrainState:
    """Pytree train state (params + optimizer + EMA + mutable model state)."""

    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Any
    model_state: Any   # e.g. batch_stats for EMANorm

    def tree_flatten(self):
        return ((self.step, self.params, self.opt_state, self.ema_params,
                 self.model_state), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten)


def make_optimizer(learning_rate: float = 1e-5, weight_decay: float = 1e-4,
                   betas=(0.9, 0.95), grad_clip: float = 1.0,
                   lr_schedule: Callable | None = None,
                   mu_dtype=None):
    """AdamW matching the reference's optimizer config
    (``base_system.py:153-159`` + trainer grad clip).

    ``mu_dtype=jnp.bfloat16`` halves the first-moment memory — the standard
    TPU trade for fitting flagship-size towers on a 16 GB chip (the second
    moment stays fp32; update quality is unaffected at these LRs).
    """
    lr = lr_schedule if lr_schedule is not None else learning_rate
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(lr, b1=betas[0], b2=betas[1], weight_decay=weight_decay,
                    mu_dtype=mu_dtype),
    )
    return tx


def init_train_state(params, model_state, tx, ema: bool = True) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if ema else None,
        model_state=model_state,
    )


def make_train_step(
    loss_fn: Callable,
    tx,
    ema_decay: float = 0.9999,
    grad_accum: int = 1,
    donate: bool = True,
):
    """Build the jitted train step.

    ``loss_fn(params, model_state, batch, key) -> (loss, (metrics_dict,
    new_model_state))``. With ``grad_accum > 1`` the batch's leading dim must
    be ``grad_accum * micro``; micro-batches are scanned and grads averaged.
    """
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def single(params, model_state, batch, key):
        (loss, (metrics, new_state)), grads = grad_fn(params, model_state,
                                                      batch, key)
        return loss, metrics, new_state, grads

    def accumulated(params, model_state, batch, key):
        def micro(carry, inp):
            model_state, grads_acc, loss_acc = carry
            mb, mkey = inp
            (loss, (metrics, new_state)), grads = grad_fn(params, model_state,
                                                          mb, mkey)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            return (new_state, grads_acc, loss_acc + loss), metrics

        mb_batch = jax.tree.map(
            lambda x: x.reshape((grad_accum, x.shape[0] // grad_accum)
                                + x.shape[1:]), batch)
        keys = jax.random.split(key, grad_accum)
        zeros = jax.tree.map(jnp.zeros_like, params)
        (new_state, grads, loss), metrics = jax.lax.scan(
            micro, (model_state, zeros, 0.0), (mb_batch, keys))
        grads = jax.tree.map(lambda g: g / grad_accum, grads)
        metrics = jax.tree.map(lambda m: m[-1], metrics)
        return loss / grad_accum, metrics, new_state, grads

    compute = accumulated if grad_accum > 1 else single

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, batch, key):
        loss, metrics, new_model_state, grads = compute(
            state.params, state.model_state, batch, key)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if new_ema is not None:
            new_ema = jax.tree.map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                new_ema, new_params)
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
            model_state=new_model_state,
        ), metrics

    return train_step
