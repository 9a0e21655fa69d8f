#!/usr/bin/env python
"""Training entry point: config composition -> system -> pjit train loop.

Parity target: ``/root/reference/train.py`` (Hydra entry, Lightning Trainer).
TPU-first redesign: one jit-compiled train step (data-parallel over a
``Mesh``, optional FSDP param sharding, grad accumulation, EMA inside the
step), Orbax checkpointing with resume-latest, thread-pooled host input
pipeline, JSONL metric logging with rank-zero gating.

Usage:
    python train.py --config prometheus_tpu/configs/config.yaml \
        [--override training.batch_size=4 image_size=128 ...] \
        [--synthetic]              # synthetic data (no datasets on disk)
        [--max_steps N] [--stage gsdecoder|mvldm|trajdit]
"""
from __future__ import annotations

import argparse
import json
import os
import time


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str,
                   default="prometheus_tpu/configs/config.yaml")
    p.add_argument("--override", nargs="*", default=[])
    p.add_argument("--stage", type=str, default="mvldm",
                   choices=["mvldm", "gsdecoder", "trajdit"])
    p.add_argument("--synthetic", action="store_true",
                   help="synthetic random batches (pipeline smoke/perf)")
    p.add_argument("--small", action="store_true",
                   help="reduced model widths (smoke)")
    p.add_argument("--max_steps", type=int, default=-1)
    p.add_argument("--ckpt_dir", type=str, default=None)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--save_every", type=int, default=1000)
    p.add_argument("--param_sharding", type=str, default="replicated",
                   choices=["replicated", "fsdp"])
    p.add_argument("--depth_teacher", type=str, default="da2",
                   choices=["da2", "luminance"],
                   help="pseudo-depth source: DepthAnything-V2 or a cheap "
                        "luminance proxy (no weights / smoke runs)")
    return p.parse_args()


def build_models(cfg, args):
    import jax.numpy as jnp

    from prometheus_tpu.models import GSDecoderModel, MVLDMModel, TrajDiTModel

    if args.small:
        mv = MVLDMModel(model_channels=32, num_head_channels=16,
                        context_dim=64, channel_mult=(1, 2), num_res_blocks=1,
                        disable_3d_attentions=(1, 0, 0, 0, 0),
                        use_checkpoint=True, clip_layers=2, clip_width=64,
                        vae_ch=32, vae_ch_mult=(1, 2), image_size=32)
        gs = GSDecoderModel(dit_hidden_size=32, dit_depth=1, dit_num_heads=4,
                            vae_ch=32, vae_ch_mult=(1, 2), max_num_images=4)
        traj = TrajDiTModel(hidden_size=32, num_blocks=1, num_heads=4)
        return mv, gs, traj
    net = cfg.algorithm.network
    mv = MVLDMModel(
        latent_channel=net.latent_channel,
        extra_latent_channel=net.extra_latent_channel,
        image_size=net.image_size,
        model_channels=net.model_channels,
        channel_mult=tuple(net.channel_mult),
        num_res_blocks=net.num_res_blocks,
        num_head_channels=net.num_head_channels,
        context_dim=net.context_dim,
        disable_3d_attentions=tuple(net.disable_3d_attentions),
        use_checkpoint=net.use_checkpoint,
        clip_layers=net.clip_layers,
        clip_width=net.clip_width,
    )
    gnet = cfg.gsdecoder.network
    gs = GSDecoderModel(
        latent_channel=gnet.latent_channel,
        extra_latent_channel=gnet.extra_latent_channel,
        use_cross_view_dit=gnet.use_cross_view_dit,
        use_ema_norm=gnet.use_ema_norm,
        dit_hidden_size=gnet.cross_view_dit.hidden_size,
        dit_depth=gnet.cross_view_dit.depth,
        dit_num_heads=gnet.cross_view_dit.num_heads,
        max_num_images=gnet.cross_view_dit.max_num_images,
    )
    traj = TrajDiTModel()
    return mv, gs, traj


def synthetic_mv_batch(key, B, N, img, ctx_dim):
    import jax
    import jax.numpy as jnp

    from prometheus_tpu.utils import get_random_cameras

    k1, k2, k3 = jax.random.split(key, 3)
    cams = jnp.tile(get_random_cameras(k1, N, size=img)[None], (B, 1, 1))
    return {
        "images_mv": jax.random.uniform(k2, (B, N, 3, img, img),
                                        minval=-1, maxval=1),
        "cameras_mv": cams,
        "depths_mv": jax.random.uniform(k3, (B, N, 1, img, img),
                                        minval=0.05, maxval=1.0),
        "text_emb": jax.random.normal(k2, (B, 77, ctx_dim)) * 0.02,
        "uncond_text_emb": jnp.zeros((B, 77, ctx_dim)),
    }


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from prometheus_tpu.checkpoint import (latest_checkpoint,
                                           restore_checkpoint, save_checkpoint)
    from prometheus_tpu.config import load_config
    from prometheus_tpu.ops.schedulers import make_schedule
    from prometheus_tpu.parallel import (TrainState, init_train_state,
                                         is_main_process, make_mesh,
                                         make_optimizer, make_train_step,
                                         shard_batch, shard_params)
    from prometheus_tpu.systems import GSDecoderSystem, MVLDMSystem
    from prometheus_tpu.models import MVLDMModel, GSDecoderModel

    cfg = load_config(args.config, overrides=args.override)
    tr = cfg.training
    mesh = make_mesh()
    n_dev = mesh.shape["data"]
    key = jax.random.PRNGKey(cfg.get("seed", 0))

    mv_model, gs_model, traj_model = build_models(cfg, args)
    img = mv_model.image_size
    hw = mv_model.latent_size
    ctx = mv_model.context_dim
    B = max(int(tr.batch_size) * n_dev // n_dev, n_dev)  # global batch
    N = int(tr.num_input_views) if not args.small else 2

    sched = make_schedule(cfg.experiment.get("scheduler_type", "vprediction"),
                          high_noise=cfg.experiment.get("high_noise_level",
                                                        False))

    if args.stage == "mvldm":
        system = MVLDMSystem(model=mv_model, schedule=sched,
                             num_pred_views=int(tr.num_pred_views)
                             if not args.small else N)
        params = mv_model.init(
            key, jnp.zeros((1, 1, 3, img, img)), jnp.zeros((1, 77), jnp.int32),
            jnp.zeros((1, 1, 9, hw, hw)), jnp.zeros((1, 77, ctx)),
            jnp.zeros((1, 1)),
            synthetic_mv_batch(key, 1, 1, img, ctx)["cameras_mv"],
            method=MVLDMModel.init_everything)
        model_state = {}

        def loss_fn(p, ms, batch, k):
            loss, metrics = system.multi_view_loss(
                p, k, batch,
                drop_pose_p=float(tr.get("drop_pose_p", 0.1)),
                drop_text_p=float(tr.get("text_to_3d_drop_text_p", 0.1)))
            return loss, (metrics, ms)

    elif args.stage == "gsdecoder":
        # render at the data resolution: GT supervision is pixelwise
        render_size = img if args.small else 256
        system = GSDecoderSystem(model=gs_model, render_size=render_size)
        variables = gs_model.init(
            key, jnp.zeros((1, 1, 3, img, img)),
            jnp.zeros((1, 1, 14, hw, hw)),
            method=GSDecoderModel.init_everything)
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}
        n_in = int(tr.get("num_input_views", 4)) if not args.small else 2
        n_novel = int(tr.get("num_novel_views", 4)) if not args.small else 2
        N = n_in + n_novel  # stage-1 batches carry input + novel views

        def loss_fn(p, ms, batch, k):
            return system.loss(p, ms, batch, k, num_input_views=n_in,
                               render_size=render_size)
    else:
        raise NotImplementedError("trajdit stage CLI wiring pending")

    tx = make_optimizer(
        learning_rate=float(tr.learning_rate),
        weight_decay=float(tr.get("weight_decay", 1e-4)),
        betas=tuple(tr.get("betas", (0.9, 0.95))),
    )
    state = init_train_state(params, model_state, tx)
    state = TrainState(state.step,
                       shard_params(state.params, mesh, args.param_sharding),
                       state.opt_state, state.ema_params, state.model_state)

    ckpt_dir = args.ckpt_dir or os.path.join(
        cfg.get("output_dir", "./workdir"), f"{args.stage}_ckpts")
    latest = latest_checkpoint(ckpt_dir)
    if latest and tr.get("resume_from_checkpoint") == "latest":
        state = restore_checkpoint(latest, target=state)
        print(f"[train] resumed from {latest}")

    accum = int(tr.get("accumulate_grad_batches", 1))
    step_fn = make_train_step(loss_fn, tx, grad_accum=accum,
                              ema_decay=float(tr.get("ema_decay", 0.9999)))

    max_steps = args.max_steps if args.max_steps > 0 else \
        int(tr.get("steps_per_epoch", 1000))
    log_path = os.path.join(ckpt_dir, "metrics.jsonl")
    os.makedirs(ckpt_dir, exist_ok=True)

    loader_iter = None
    if not args.synthetic:
        from prometheus_tpu.datasets import DataLoader
        from prometheus_tpu.datasets.builder import (build_dataset,
                                                     common_kwargs_from_group)
        from prometheus_tpu.models.clip_text import CLIPTokenizer
        from prometheus_tpu.models.depth_anything import make_depth_fn

        ds_cfg = cfg.dataset
        dataset = build_dataset(dict(ds_cfg.train),
                                common_kwargs_from_group(dict(ds_cfg)))
        loader = DataLoader(dataset, batch_size=B,
                            num_workers=int(tr.get("num_workers", 4)),
                            seed=int(cfg.get("seed", 0)))
        tokenizer = CLIPTokenizer(cfg.get("bpe_vocab"))
        if args.depth_teacher == "da2":
            depth_fn = make_depth_fn(key,
                                     weights_path=cfg.get("depth_weights"))
        else:  # luminance proxy: shape-correct, trivially cheap
            def depth_fn(images):
                lum = images.mean(axis=2, keepdims=True) * 0.5 + 0.5
                return jnp.clip(lum, 0.0, 1.0)
        uncond_ids = jnp.asarray(tokenizer([""]))

        def host_batch_to_device(raw):
            """images/cameras/text -> the loss's batch dict (pseudo-depth
            teacher + CLIP text embeddings computed on device)."""
            images = jnp.asarray(raw["images_mv"])
            ids = jnp.asarray(tokenizer(raw["text_mv"]))
            if args.stage == "mvldm":
                from prometheus_tpu.models import MVLDMModel as _M

                # state.params for this stage is the full variables dict
                text_emb = mv_model.apply(state.params, ids,
                                          method=_M.encode_text)
                uncond = mv_model.apply(
                    state.params, jnp.broadcast_to(uncond_ids, ids.shape),
                    method=_M.encode_text)
            else:
                text_emb = uncond = None
            out = {
                "images_mv": images,
                "cameras_mv": jnp.asarray(raw["cameras_mv"]),
                "depths_mv": depth_fn(images),
            }
            if text_emb is not None:
                out["text_emb"] = text_emb
                out["uncond_text_emb"] = uncond
            return out

        def gen():
            while True:
                for raw in loader:
                    yield host_batch_to_device(raw)

        loader_iter = gen()

    t_start = time.time()
    for step in range(int(state.step), max_steps):
        key, k_batch, k_step = jax.random.split(key, 3)
        if loader_iter is not None:
            batch = next(loader_iter)
        else:
            batch = synthetic_mv_batch(k_batch, B, N, img, ctx)
        batch = shard_batch(mesh, batch)
        state, metrics = step_fn(state, batch, k_step)
        if step % args.log_every == 0 and is_main_process():
            jax.block_until_ready(metrics["loss"])
            line = {"step": step,
                    "time": round(time.time() - t_start, 2),
                    **{k: float(v) for k, v in metrics.items()}}
            print(json.dumps(line), flush=True)
            with open(log_path, "a") as fp:
                fp.write(json.dumps(line) + "\n")
        if args.save_every > 0 and (step + 1) % args.save_every == 0 \
                and is_main_process():
            save_checkpoint(ckpt_dir, state, step + 1)
    if is_main_process():
        save_checkpoint(ckpt_dir, state, max_steps)
        print(f"[train] done: {max_steps} steps, ckpts in {ckpt_dir}")


if __name__ == "__main__":
    main()
