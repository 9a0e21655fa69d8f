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


def partition_frozen(params, frozen_mask):
    """Split a nested-dict param tree into (trainable, frozen) subtrees by a
    same-structure boolean mask (True = frozen). Both halves keep nested
    string-keyed dict structure (orbax-serializable)."""
    from flax import traverse_util

    flat_p = traverse_util.flatten_dict(params)
    flat_m = traverse_util.flatten_dict(frozen_mask)
    train = {k: v for k, v in flat_p.items() if not flat_m[k]}
    frozen = {k: v for k, v in flat_p.items() if flat_m[k]}
    return (traverse_util.unflatten_dict(train),
            traverse_util.unflatten_dict(frozen))


def merge_partitions(train_tree, frozen_tree):
    """Inverse of :func:`partition_frozen` — deep-merge two disjoint nested
    dicts back into one tree."""
    from flax import traverse_util

    flat = dict(traverse_util.flatten_dict(train_tree))
    flat.update(traverse_util.flatten_dict(frozen_tree))
    return traverse_util.unflatten_dict(flat)


def full_ema_params(params, ema_params):
    """Full variables tree: EMA values where tracked, live params elsewhere.

    With a ``frozen_mask`` train step the EMA tracks only the trainable
    subtree (the reference EMAs only the trained module,
    ``base_system.py:447-460``); consumers (validation sampling, final-ckpt
    export) overlay it onto the full params tree. Works for full-tree EMA
    too (overlay is then total)."""
    if ema_params is None:
        return params
    from flax import traverse_util

    flat = dict(traverse_util.flatten_dict(params))
    flat.update(traverse_util.flatten_dict(ema_params))
    return traverse_util.unflatten_dict(flat)


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


def init_train_state(params, model_state, tx, ema: bool = True,
                     frozen_mask=None) -> TrainState:
    """With ``frozen_mask`` (same-structure bool tree, True = frozen), the
    optimizer state and EMA cover ONLY the trainable subtree — the frozen
    towers carry no moments, no EMA copy, and no per-step update traffic
    (the reference hands only trainable params to its optimizer,
    ``mv_ldm.py:52-64`` ``requires_grad_(False)``)."""
    opt_target = params if frozen_mask is None else \
        partition_frozen(params, frozen_mask)[0]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(opt_target),
        ema_params=jax.tree.map(jnp.copy, opt_target) if ema else None,
        model_state=model_state,
    )


def make_train_step(
    loss_fn: Callable,
    tx,
    ema_decay: float = 0.9999,
    grad_accum: int = 1,
    donate: bool = True,
    frozen_mask=None,
):
    """Build the jitted train step.

    ``loss_fn(params, model_state, batch, key) -> (loss, (metrics_dict,
    new_model_state))``. With ``grad_accum > 1`` the batch's leading dim must
    be ``grad_accum * micro``; micro-batches are scanned and grads averaged.

    ``frozen_mask`` (bool tree, True = frozen; pair with the same mask in
    :func:`init_train_state`): gradients are taken w.r.t. the TRAINABLE
    subtree only — frozen towers are closed over as constants, so the
    backward never materialises their (zero) grads and the clip/Adam/EMA
    update phase touches ~T instead of ~P parameters' worth of HBM. On the
    flagship stage-2 step the frozen VAE+CLIP are ~1/3 of the tree. The
    frozen leaves pass through donation unchanged (XLA aliases them)."""
    def single(grad_fn, params, model_state, batch, key):
        (loss, (metrics, new_state)), grads = grad_fn(params, model_state,
                                                      batch, key)
        return loss, metrics, new_state, grads

    def accumulated(grad_fn, params, model_state, batch, key):
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
        if frozen_mask is None:
            opt_params, frozen = state.params, None
            loss_of = loss_fn
        else:
            opt_params, frozen = partition_frozen(state.params, frozen_mask)

            def loss_of(tp, ms, b, k):
                return loss_fn(merge_partitions(tp, frozen), ms, b, k)

        grad_fn = jax.value_and_grad(loss_of, has_aux=True)
        loss, metrics, new_model_state, grads = compute(
            grad_fn, opt_params, state.model_state, batch, key)
        updates, new_opt_state = tx.update(grads, state.opt_state, opt_params)
        new_opt_params = optax.apply_updates(opt_params, updates)
        new_ema = state.ema_params
        if new_ema is not None:
            new_ema = jax.tree.map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                new_ema, new_opt_params)
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(
            step=state.step + 1,
            params=new_opt_params if frozen is None
            else merge_partitions(new_opt_params, frozen),
            opt_state=new_opt_state,
            ema_params=new_ema,
            model_state=new_model_state,
        ), metrics

    return train_step
