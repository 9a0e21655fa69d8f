#!/usr/bin/env python
"""Decompose the flagship train-step time on the real chip (VERDICT r2 weak
#4: 38.8% MFU was unexamined). Times each sub-program separately with real
device-fetch syncs (block_until_ready is a no-op over the tunneled axon
backend) and prints one JSON line:

    forward loss only / forward+backward / full step (opt+EMA) /
    U-Net fwd alone / U-Net fwd+bwd (remat full vs dots) / VAE encode

Usage:  python tools/profile_train_step.py [--small] [--iters 4]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def sync(tree):
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "ravel")]
    jax.device_get(leaves[0].ravel()[0:1])


def timeit(fn, *args, iters=4):
    out = fn(*args)           # compile
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / iters


def record(out, key, val):
    """Record incrementally so a late OOM doesn't lose earlier numbers."""
    out[key] = val
    print(f"[profile] {key} = {val}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--sections", default="unet,vae,loss,step",
                    help="comma list of unet,vae,loss,step")
    args = ap.parse_args()
    sections = set(args.sections.split(","))

    import optax

    from bench import build_flagship
    from prometheus_tpu.models import MVLDMModel
    from prometheus_tpu.parallel import (init_train_state, make_optimizer,
                                         make_train_step)
    from prometheus_tpu.systems import MVLDMSystem
    from prometheus_tpu.utils import get_random_cameras

    pipe, init_s = build_flagship(small=args.small)
    print(f"[profile] init {init_s:.1f}s", file=sys.stderr)
    B, N = 1, 8
    img = pipe.mvldm.model.image_size
    hw = pipe.mvldm.model.latent_size
    ctx = pipe.mvldm.model.context_dim
    key = jax.random.PRNGKey(3)
    cams = jnp.tile(get_random_cameras(key, N, size=img)[None], (B, 1, 1))
    batch = {
        "images_mv": jax.random.uniform(key, (B, N, 3, img, img),
                                        jnp.bfloat16, -1, 1),
        "cameras_mv": cams,
        "depths_mv": jax.random.uniform(key, (B, N, 1, img, img),
                                        jnp.bfloat16, 0.05, 1),
        "text_emb": jax.random.normal(key, (B, 77, ctx), jnp.bfloat16) * 0.02,
        "uncond_text_emb": jnp.zeros((B, 77, ctx), jnp.bfloat16),
    }
    out = {}

    # --- U-Net alone at train shapes (per-CFG row count = B*N frames) ----
    lat = jax.random.normal(key, (B, N, 9, hw, hw), jnp.bfloat16)
    txt = batch["text_emb"]
    t = jnp.zeros((B, N))
    for policy in ("full", "dots") if "unet" in sections else ():
        model = pipe.mvldm.model.clone(use_checkpoint=True,
                                       remat_policy=policy)

        @jax.jit
        def unet_fwd(p, lat, txt, t, cams, _m=model):
            return _m.apply(p, lat, txt, t, cams,
                            method=MVLDMModel.denoise)

        @jax.jit
        def unet_fwd_bwd(p, lat, txt, t, cams, _f=unet_fwd):
            loss, g = jax.value_and_grad(
                lambda pp: (_f(pp, lat, txt, t, cams).astype(
                    jnp.float32) ** 2).mean())(p)
            return loss, g

        try:
            if policy == "full":
                record(out, "unet_fwd_ms", round(1e3 * timeit(
                    unet_fwd, pipe.mvldm_params, lat, txt, t, cams,
                    iters=args.iters), 2))
            record(out, f"unet_fwd_bwd_{policy}_ms", round(1e3 * timeit(
                unet_fwd_bwd, pipe.mvldm_params, lat, txt, t, cams,
                iters=args.iters), 2))
        except Exception as e:  # OOM for dots at flagship is information too
            record(out, f"unet_fwd_bwd_{policy}_ms",
                   f"failed: {type(e).__name__}")

    # --- VAE encode of the step's 2x8 images -----------------------------
    @jax.jit
    def vae_enc(p, images):
        return pipe.mvldm.model.apply(p, images,
                                      method=MVLDMModel.encode_image)

    if "vae" in sections:
        imgs2 = jnp.concatenate([batch["images_mv"], batch["images_mv"]], 1)
        record(out, "vae_encode_16imgs_ms", round(1e3 * timeit(
            vae_enc, pipe.mvldm_params, imgs2, iters=args.iters), 2))

    # --- loss fwd / fwd+bwd / full step ----------------------------------
    model = pipe.mvldm.model.clone(
        use_checkpoint=True,
        remat_policy=os.environ.get("BENCH_REMAT", "full"))
    system = MVLDMSystem(model=model, schedule=pipe.mvldm.schedule,
                         num_pred_views=N)

    @jax.jit
    def loss_fwd(p, b, k):
        loss, _ = system.multi_view_loss(p, k, b)
        return loss

    @jax.jit
    def loss_fwd_bwd(p, b, k):
        return jax.value_and_grad(
            lambda pp: system.multi_view_loss(pp, k, b)[0])(p)

    if "loss" in sections:
        record(out, "loss_fwd_ms", round(1e3 * timeit(
            loss_fwd, pipe.mvldm_params, batch, key, iters=args.iters), 2))
        record(out, "loss_fwd_bwd_ms", round(1e3 * timeit(
            loss_fwd_bwd, pipe.mvldm_params, batch, key, iters=args.iters), 2))

    def _frozen(path, _):
        names = [str(getattr(k, "key", getattr(k, "name", "")))
                 for k in path]
        return any(n in ("vae", "text_encoder") for n in names)

    frozen_mask = jax.tree_util.tree_map_with_path(_frozen,
                                                   pipe.mvldm_params)
    tx = make_optimizer(learning_rate=1e-5, mu_dtype=jnp.bfloat16)
    state = init_train_state(pipe.mvldm_params, {}, tx,
                             frozen_mask=frozen_mask)

    def loss_fn(p, ms, b, k):
        loss, metrics = system.multi_view_loss(p, k, b)
        return loss, (metrics, ms)

    # donate=True is the production config (undonated fp32-state steps
    # OOM the 16 GB chip); thread the returned state back through.
    if "step" in sections:
        step_fn = make_train_step(loss_fn, tx, donate=True,
                                  frozen_mask=frozen_mask)
        state, metrics = step_fn(state, batch, key)      # compile
        sync(metrics["loss"])
        t0 = time.time()
        for _ in range(args.iters):
            state, metrics = step_fn(state, batch, key)
        sync(metrics["loss"])
        record(out, "full_step_ms",
               round(1e3 * (time.time() - t0) / args.iters, 2))

    if "loop" in sections:
        # SUSTAINED-LOOP equivalent (VERDICT r4 weak #5: bench measured
        # 0.122 s/step, the 500-step run logged 0.172): key split + jitted
        # on-device synthetic batch + shard + step — exactly train.py's
        # per-step work. loop_step_ms - full_step_ms is the loop's
        # batch-plumbing cost (device time for the synthetic generator;
        # the from-disk path synthesizes nothing on device).
        from functools import partial

        from prometheus_tpu.parallel import make_mesh, shard_batch
        from train import synthetic_mv_batch

        mesh = make_mesh()
        synth_fn = jax.jit(partial(synthetic_mv_batch, B=B, N=N, img=img,
                                   ctx_dim=ctx))
        if "step" not in sections:
            step_fn = make_train_step(loss_fn, tx, donate=True,
                                      frozen_mask=frozen_mask)
        record(out, "synth_batch_ms",
               round(1e3 * timeit(synth_fn, key, iters=args.iters), 2))

        def loop_iter(st, lk):
            lk, kb, ks = jax.random.split(lk, 3)
            b = shard_batch(mesh, synth_fn(kb))
            st, m = step_fn(st, b, ks)
            return st, m, lk

        lk = jax.random.PRNGKey(11)
        # TWO warm calls: the first compiles; the second absorbs the
        # one-time recompile when the donated output state's shardings
        # replace the init state's (measured: one extra ~45 s compile on
        # the 2nd call, none after)
        state, metrics, lk = loop_iter(state, lk)
        state, metrics, lk = loop_iter(state, lk)
        sync(metrics["loss"])
        t0 = time.time()
        for _ in range(args.iters):
            state, metrics, lk = loop_iter(state, lk)
        sync(metrics["loss"])
        record(out, "loop_step_ms",
               round(1e3 * (time.time() - t0) / args.iters, 2))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
