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
    p.add_argument("--val_every", type=int, default=0,
                   help="every N steps: validation sample + image-grid "
                        "snapshot (reference mv_ldm_system.py:598-661)")
    p.add_argument("--render_loss", action="store_true",
                   help="mvldm stage: add the end-to-end rendering loss "
                        "through the frozen stage-1 decoder (reference "
                        "mv_ldm_system.py:1039-1125)")
    p.add_argument("--gsdecoder_ckpt", type=str, default=None,
                   help="orbax ckpt dir with trained stage-1 decoder vars "
                        "(for --render_loss); random init if absent")
    p.add_argument("--joint_sv", action="store_true",
                   help="mvldm stage: mixed multi-view + single-view (T2I) "
                        "batches (reference training_step, "
                        "mv_ldm_system.py:112-143)")
    p.add_argument("--sp_views", action="store_true",
                   help="sequence-parallel training: shard the VIEWS over "
                        "the mesh (3D-attention K/V gathered over ICI; "
                        "activation memory / device count) — for view or "
                        "image sizes one device can't hold. Batch is NOT "
                        "multiplied by the device count in this mode")
    p.add_argument("--param_sharding", type=str, default="replicated",
                   choices=["replicated", "fsdp"])
    p.add_argument("--depth_teacher", type=str, default="da2",
                   choices=["da2", "luminance"],
                   help="pseudo-depth source: DepthAnything-V2 or a cheap "
                        "luminance proxy (no weights / smoke runs)")
    p.add_argument("--debug", action="store_true",
                   help="numerics debug: jax_debug_nans (raise at the op "
                        "that produced a NaN — the reference's "
                        "detect_anomaly analog, train.py:145) + hard "
                        "finite checks on every host batch")
    return p.parse_args()


def build_models(cfg, args):
    import jax.numpy as jnp

    from prometheus_tpu.models import GSDecoderModel, MVLDMModel, TrajDiTModel

    # reference default is bf16-mixed (base_pytorch.yaml:24): bf16 compute,
    # f32 master params == our dtype=bf16 with flax's f32 param_dtype
    prec = str(cfg.training.get("precision", "bf16-mixed"))
    dtype = jnp.bfloat16 if "bf16" in prec else jnp.float32
    if args.small:
        mv = MVLDMModel(dtype=dtype, model_channels=32, num_head_channels=16,
                        context_dim=64, channel_mult=(1, 2), num_res_blocks=1,
                        disable_3d_attentions=(1, 0, 0, 0, 0),
                        use_checkpoint=True, clip_layers=2, clip_width=64,
                        vae_ch=32, vae_ch_mult=(1, 2), image_size=32)
        gs = GSDecoderModel(dtype=dtype, dit_hidden_size=32, dit_depth=1,
                            dit_num_heads=4, vae_ch=32, vae_ch_mult=(1, 2),
                            max_num_images=4)
        traj = TrajDiTModel(dtype=dtype, hidden_size=32, num_blocks=1,
                            num_heads=4, text_dim=64)
        return mv, gs, traj
    net = cfg.algorithm.network
    mv = MVLDMModel(
        dtype=dtype,
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
        dtype=dtype,
        latent_channel=gnet.latent_channel,
        extra_latent_channel=gnet.extra_latent_channel,
        use_cross_view_dit=gnet.use_cross_view_dit,
        use_ema_norm=gnet.use_ema_norm,
        dit_hidden_size=gnet.cross_view_dit.hidden_size,
        dit_depth=gnet.cross_view_dit.depth,
        dit_num_heads=gnet.cross_view_dit.num_heads,
        max_num_images=gnet.cross_view_dit.max_num_images,
    )
    traj = TrajDiTModel(dtype=dtype)
    return mv, gs, traj


def synthetic_mv_batch(key, B, N, img, ctx_dim, sv: int = 0):
    import jax
    import jax.numpy as jnp

    from prometheus_tpu.utils import get_random_cameras

    k1, k2, k3 = jax.random.split(key, 3)
    cams = jnp.tile(get_random_cameras(k1, N, size=img)[None], (B, 1, 1))
    out = {
        "images_mv": jax.random.uniform(k2, (B, N, 3, img, img),
                                        minval=-1, maxval=1),
        "cameras_mv": cams,
        "depths_mv": jax.random.uniform(k3, (B, N, 1, img, img),
                                        minval=0.05, maxval=1.0),
        "text_emb": jax.random.normal(k2, (B, 77, ctx_dim)) * 0.02,
        "uncond_text_emb": jnp.zeros((B, 77, ctx_dim)),
    }
    if sv > 0:  # joint MV + T2I batch (reference JointDataset item)
        out["images_sv"] = jax.random.uniform(
            k3, (B, sv, 3, img, img), minval=-1, maxval=1)
        out["depths_sv"] = jax.random.uniform(
            k1, (B, sv, 1, img, img), minval=0.05, maxval=1.0)
        out["text_emb_sv"] = jax.random.normal(k1, (B, 77, ctx_dim)) * 0.02
    return out


def dummy_sv_camera(image_size: int):
    """The reference's fixed identity camera for 2-D data
    (mv_ldm_system.py:188-193: fx=fy=207.3 @ 256^2, scaled to size)."""
    import jax.numpy as jnp

    s = image_size / 256.0
    return jnp.asarray([1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0,
                        207.3 * s, 207.3 * s, 128.0 * s, 128.0 * s,
                        float(image_size), float(image_size)], jnp.float32)


def main():
    args = parse_args()
    from prometheus_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()
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
    if args.debug:
        from prometheus_tpu.utils.nan_guard import enable_nan_debug
        enable_nan_debug()
    # multi-slice (multi-node) topologies get a hybrid dcn x data mesh so
    # FSDP all-gathers stay on ICI and only the once-per-step gradient
    # reduction crosses DCN; single-slice (and the CPU test mesh) is flat
    from prometheus_tpu.parallel import make_hybrid_mesh
    n_slices = len({getattr(d, "slice_index", 0) or 0 for d in jax.devices()})
    mesh = make_hybrid_mesh() if n_slices > 1 else make_mesh()
    n_dev = mesh.devices.size
    key = jax.random.PRNGKey(cfg.get("seed", 0))

    mv_model, gs_model, traj_model = build_models(cfg, args)
    img = mv_model.image_size
    hw = mv_model.latent_size
    ctx = mv_model.context_dim
    # batch_size is per device (reference semantics: 8/GPU x 8 GPUs = 64
    # effective, mvldm_vpred_exp.yaml:17-40); the step consumes the global
    # batch = per_device * mesh * grad_accum and scans accum micro-batches
    accum = int(tr.get("accumulate_grad_batches", 1))
    B = int(tr.batch_size) * n_dev * accum  # global batch
    assert B % (n_dev * accum) == 0
    N = int(tr.num_input_views) if not args.small else 2
    if args.sp_views:
        # sequence-parallel: the mesh axis carries VIEWS, not batch — the
        # per-step batch is NOT multiplied by the device count, and N must
        # split over the mesh (memory-scaling mode for big views/images)
        if args.stage != "mvldm" or args.joint_sv or args.render_loss:
            raise SystemExit("--sp_views supports the plain mvldm stage "
                             "(no --joint_sv / --render_loss yet)")
        B = int(tr.batch_size) * accum
        if N % n_dev != 0:
            raise SystemExit(f"--sp_views needs num views ({N}) divisible "
                             f"by the device count ({n_dev})")

    sched = make_schedule(cfg.experiment.get("scheduler_type", "vprediction"),
                          high_noise=cfg.experiment.get("high_noise_level",
                                                        False))

    if args.stage == "mvldm":
        system = MVLDMSystem(model=mv_model, schedule=sched,
                             timestep_type=cfg.experiment.get(
                                 "timestep_type", "continuous"),
                             num_pred_views=int(tr.num_pred_views)
                             if not args.small else N)
        params = mv_model.init(
            key, jnp.zeros((1, 1, 3, img, img)), jnp.zeros((1, 77), jnp.int32),
            jnp.zeros((1, 1, 9, hw, hw)), jnp.zeros((1, 77, ctx)),
            jnp.zeros((1, 1)),
            synthetic_mv_batch(key, 1, 1, img, ctx)["cameras_mv"],
            method=MVLDMModel.init_everything)
        model_state = {}

        # optional end-to-end rendering loss through the frozen stage-1
        # decoder (reference rendering_loss_fn, mv_ldm_system.py:1039-1125)
        gs_system = gs_frozen_vars = None
        if args.render_loss:
            from prometheus_tpu.systems import GSDecoderSystem

            gs_frozen_vars = gs_model.init(
                key, jnp.zeros((1, 1, 3, img, img)),
                jnp.zeros((1, 1, 14, hw, hw)),
                method=GSDecoderModel.init_everything)
            if args.gsdecoder_ckpt:
                # TrainState restores as [step, params, opt, ema, state];
                # use the EMA weights (final-ckpt semantics)
                raw = restore_checkpoint(args.gsdecoder_ckpt)
                gs_frozen_vars = {"params": raw[3] if raw[3] is not None
                                  else raw[1], **raw[4]}
                print(f"[train] frozen stage-1 decoder from "
                      f"{args.gsdecoder_ckpt}")
            else:
                print("[train] WARNING: --render_loss without "
                      "--gsdecoder_ckpt renders through a random decoder")
            gs_frozen_vars = jax.lax.stop_gradient(gs_frozen_vars)
            # reference rendering_loss_fn includes LPIPS with default
            # weight 1 (mv_ldm_system.py:1083,1100-1110); experiments may
            # zero it (mvldm_vpred_exp.yaml:60 does)
            lambda_render_lpips = float(tr.get("lambda_gs_image_lpips", 1.0))
            render_lpips_fn = None
            if lambda_render_lpips:
                from prometheus_tpu.models.lpips import make_lpips_fn
                render_lpips_fn = make_lpips_fn(
                    key, weights_path=cfg.get("lpips_weights"))
                if not cfg.get("lpips_weights"):
                    print("[train] WARNING: rendering-loss LPIPS uses "
                          "random-init heads (set lpips_weights for the "
                          "converted official VGG+lin weights)")
            gs_system = GSDecoderSystem(
                model=gs_model, render_size=img if args.small else 256,
                lpips_fn=render_lpips_fn)
        sv_cam = dummy_sv_camera(img)

        def loss_fn(p, ms, batch, k):
            kw = dict(drop_pose_p=float(tr.get("drop_pose_p", 0.1)),
                      drop_text_p=float(tr.get("text_to_3d_drop_text_p", 0.1)))
            if args.sp_views:
                # sequence-parallel step: views sharded over the mesh,
                # K/V gathered at the 3D-attention sites (grads exact —
                # tests/test_view_sharded_sampler.py)
                loss, metrics = system.multi_view_loss_view_sharded(
                    mesh, p, k, batch, axis="data", **kw)
                return loss, (metrics, ms)
            loss, metrics, aux = system.multi_view_loss(
                p, k, batch, return_aux=True, **kw)
            if "images_sv" in batch:  # joint MV + T2I step
                loss_sv, m_sv = system.single_view_loss(
                    p, jax.random.fold_in(k, 1), batch, sv_cam,
                    drop_text_p=float(tr.get("text_to_2d_drop_text_p", 0.1)))
                loss = loss + float(tr.get("lambda_sv", 1.0)) * loss_sv
                metrics.update(m_sv)
            if gs_system is not None:
                loss_r, m_r = system.rendering_loss(
                    gs_system, gs_frozen_vars, aux["x0_pred"],
                    batch["cameras_mv"], batch["images_mv"],
                    batch["depths_mv"], batch["cameras_mv"],
                    rendering_size=img if args.small else 256,
                    lambda_lpips=lambda_render_lpips,
                    lambda_depth=float(tr.get("lambda_render_depth", 0.5)))
                loss = loss + float(tr.get("lambda_render", 0.1)) * loss_r
                metrics.update(m_r)
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
    else:  # trajdit: text -> camera-trajectory diffusion (reference
        # traj_dit_system.py:18-66, trained through the same harness)
        from prometheus_tpu.systems import TrajDiTSystem

        system = TrajDiTSystem(model=traj_model)
        N = traj_model.num_tokens  # batches must carry the full trajectory
        ctx = traj_model.text_dim
        params = traj_model.init(
            key, jnp.zeros((1, N, 11)), jnp.zeros((1, 77, ctx)),
            jnp.zeros((1,)))
        model_state = {}

        def loss_fn(p, ms, batch, k):
            loss = system.loss(p, k, batch["cameras_mv"], batch["text_emb"])
            return loss, ({"loss_traj": loss}, ms)

    # bf16 first moment by default: fp32 Adam moments push the flagship
    # stage-2 state to 14.5 GB of arguments and the 16 GB v5e OOMs by
    # ~210 MB at batch 1 (runbook r4 train500). bench.py has always used
    # mu_dtype=bf16; train.py must match. "f32" opts out.
    mu_dt = str(tr.get("adam_mu_dtype", "bf16"))
    tx = make_optimizer(
        learning_rate=float(tr.learning_rate),
        weight_decay=float(tr.get("weight_decay", 1e-4)),
        betas=tuple(tr.get("betas", (0.9, 0.95))),
        mu_dtype=jnp.bfloat16 if mu_dt == "bf16" else None,
    )
    frozen_mask = None
    if args.stage == "mvldm":
        # reference trains the U-Net only; VAE + CLIP text are frozen
        # (mv_ldm.py:52-64 requires_grad_(False)). The mask partitions them
        # out of the grad/optimizer/EMA path entirely: no weight-decay
        # drift, no zero-grad materialisation, no per-step update traffic.
        def _frozen(path, _):
            names = [str(getattr(k, "key", getattr(k, "name", ""))) for k in path]
            return any(n in ("vae", "text_encoder") for n in names)

        frozen_mask = jax.tree_util.tree_map_with_path(_frozen, params)
    state = init_train_state(params, model_state, tx,
                             frozen_mask=frozen_mask)
    state = TrainState(state.step,
                       shard_params(state.params, mesh, args.param_sharding),
                       state.opt_state, state.ema_params, state.model_state)

    ckpt_dir = args.ckpt_dir or os.path.join(
        cfg.get("output_dir", "./workdir"), f"{args.stage}_ckpts")
    latest = latest_checkpoint(ckpt_dir)
    if latest and tr.get("resume_from_checkpoint") == "latest":
        state = restore_checkpoint(latest, target=state)
        print(f"[train] resumed from {latest}")

    step_fn = make_train_step(loss_fn, tx, grad_accum=accum,
                              ema_decay=float(tr.get("ema_decay", 0.9999)),
                              frozen_mask=frozen_mask)

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
        # multi-host: each host's loader reads only its disjoint shard of
        # the global batch (reference DDP-sampler semantics); the global
        # device batch is assembled by shard_batch_per_host below
        from prometheus_tpu.parallel import local_batch_size
        loader = DataLoader(dataset, batch_size=local_batch_size(B),
                            num_workers=int(tr.get("num_workers", 4)),
                            seed=int(cfg.get("seed", 0))
                            + jax.process_index())
        tokenizer = CLIPTokenizer(cfg.get("bpe_vocab"))
        if args.depth_teacher == "da2":
            if not cfg.get("depth_weights"):
                raise SystemExit(
                    "--depth_teacher da2 needs converted DepthAnything-V2 "
                    "weights (set depth_weights in the config); a randomly "
                    "initialized teacher would supervise on garbage. Use "
                    "--depth_teacher luminance for smoke runs.")
            depth_fn = make_depth_fn(key,
                                     weights_path=cfg.get("depth_weights"))
        else:  # luminance proxy: shape-correct, trivially cheap
            def depth_fn(images):
                lum = images.mean(axis=2, keepdims=True) * 0.5 + 0.5
                return jnp.clip(lum, 0.0, 1.0)
        uncond_ids = jnp.asarray(tokenizer([""]))

        if args.stage == "mvldm":
            from prometheus_tpu.models import MVLDMModel as _M

            # the CLIP text tower is frozen (reference mv_ldm.py:52) — embed
            # with the restored params, jitted once, not the live train params.
            # COPY the subtree: make_train_step donates state, so closing over
            # the live buffers would dereference deleted arrays after step 0.
            frozen_text_params = jax.tree.map(
                jnp.copy,
                {"params": {"text_encoder":
                            state.params["params"]["text_encoder"]}})

            @jax.jit
            def encode_text_frozen(ids):
                return mv_model.apply(frozen_text_params, ids,
                                      method=_M.encode_text)

        def host_batch_to_device(raw):
            """images/cameras/text -> the loss's batch dict (pseudo-depth
            teacher + CLIP text embeddings computed on device)."""
            images = jnp.asarray(raw["images_mv"])
            # a dataset/model size mismatch silently quadruples attention
            # sequence lengths per octave (a 256^2 batch into a 32^2-model
            # trace tried a 1 TB attention buffer); fail with the fix instead
            if images.shape[-1] != img:
                raise SystemExit(
                    f"dataset serves {images.shape[-2]}x{images.shape[-1]} "
                    f"images but the model expects {img}x{img} — set the "
                    "config's image_size (or --override image_size=...) to "
                    "match")
            ids = jnp.asarray(tokenizer(raw["text_mv"]))
            if args.stage == "mvldm":
                text_emb = encode_text_frozen(ids)
                uncond = encode_text_frozen(
                    jnp.broadcast_to(uncond_ids, ids.shape))
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
            # joint MV + T2I batches from disk (JointDataset merging a
            # Text2ImageDataset child): the reference trains mixed batches
            # every step (mv_ldm_system.py:112-143) — pass the single-view
            # images through with teacher depths and per-image text embeds
            if args.stage == "mvldm" and "images_sv" in raw:
                images_sv = jnp.asarray(raw["images_sv"])  # (B, M, 3, H, W)
                Bs, M = images_sv.shape[:2]
                texts = raw["text_sv"]  # list of B per-item caption lists
                flat = [t for per_item in texts for t in per_item]
                ids_sv = jnp.asarray(tokenizer(flat))      # (B*M, 77)
                emb_sv = encode_text_frozen(ids_sv)
                out["images_sv"] = images_sv
                out["depths_sv"] = depth_fn(images_sv)
                out["text_emb_sv"] = emb_sv.reshape(
                    Bs, M, *emb_sv.shape[1:])
            return out

        def gen():
            while True:
                for raw in loader:
                    yield host_batch_to_device(raw)

        loader_iter = gen()

    def validation_snapshot(step, batch, state):
        """Periodic sample + image-grid snapshot
        (reference mv_ldm_system.py:598-661 logs the same artifacts)."""
        import numpy as np

        from prometheus_tpu.logging_utils import MetricLogger
        from prometheus_tpu.utils.image import make_grid, postprocess_image

        logger = validation_snapshot.logger
        if logger is None:
            logger = MetricLogger(ckpt_dir, rank_zero=is_main_process())
            validation_snapshot.logger = logger
        from prometheus_tpu.parallel import full_ema_params
        p = full_ema_params(state.params, state.ema_params)
        if args.stage == "mvldm":
            lat = system.sample(
                p, jax.random.PRNGKey(step), batch["cameras_mv"][:1],
                batch["text_emb"][:1], batch["uncond_text_emb"][:1],
                num_inference_steps=20, latent_hw=hw)
            imgs, deps = system.decode_images_and_depths(p, lat)
            views = postprocess_image(np.asarray(imgs[0]))
            logger.log_image("val_mv_images", make_grid(views), step)
            # per-view sweep as a GIF (reference GifVisualizer's role in
            # training snapshots: flip through the views of one scene)
            logger.log_gif("val_mv_views", list(views), step,
                           duration_ms=200)
        elif args.stage == "gsdecoder":
            from prometheus_tpu.utils.image import colorize_depth

            variables = {"params": p, **state.model_state}
            out = system.inference(
                variables, batch["images_mv"][:1, :n_in],
                batch["depths_mv"][:1, :n_in], batch["cameras_mv"][:1, :n_in],
                batch["cameras_mv"][:1, n_in:])
            pred = postprocess_image(np.asarray(out["images_nv_pred"][0]))
            gt = postprocess_image(
                np.asarray(batch["images_mv"][0, n_in:]))
            dep = colorize_depth(np.asarray(out["depths_nv_pred"][0, :, 0])) \
                if "depths_nv_pred" in out else None
            rows = [list(gt), list(pred)] + ([list(dep)] if dep is not None
                                             else [])
            # gt / pred (/ depth) rows in one labeled grid (reference
            # GridVisualizer's role in training snapshots)
            logger.log_grid("val_nvs_renders", rows, step)
        else:  # trajdit: sampled trajectory frusta plot
            from prometheus_tpu.utils.visualization import plot_cameras_png

            cams = system.inference(p, jax.random.PRNGKey(step),
                                    batch["text_emb"][:1],
                                    num_inference_steps=20, image_size=256)
            path = os.path.join(ckpt_dir, "snapshots",
                                f"{step:09d}_val_traj.png")
            os.makedirs(os.path.dirname(path), exist_ok=True)
            plot_cameras_png(path, np.asarray(cams[0]))

    validation_snapshot.logger = None

    # synthetic mode: ONE jitted program per batch instead of ~10 eager
    # dispatches (each eager op pays the tunnel's per-call overhead; the
    # r4 500-step run spent ~0.05 s/step on host-side batch plumbing)
    from functools import partial as _partial
    synth_fn = jax.jit(_partial(
        synthetic_mv_batch, B=B, N=N, img=img, ctx_dim=ctx,
        sv=int(tr.get("images_per_iter", 2)) if args.joint_sv
        and args.stage == "mvldm" else 0))

    t_start = time.time()
    for step in range(int(state.step), max_steps):
        key, k_batch, k_step = jax.random.split(key, 3)
        if loader_iter is not None:
            from prometheus_tpu.parallel import (shard_batch_per_host,
                                                 shard_batch_views)
            host_batch = next(loader_iter)
            if args.debug:
                from prometheus_tpu.utils.nan_guard import assert_finite
                assert_finite(host_batch, f"batch@step{step}")
            batch = (shard_batch_views(mesh, host_batch) if args.sp_views
                     else shard_batch_per_host(mesh, host_batch))
        else:
            from prometheus_tpu.parallel import shard_batch_views
            batch = synth_fn(k_batch)
            batch = (shard_batch_views(mesh, batch) if args.sp_views
                     else shard_batch(mesh, batch))
        state, metrics = step_fn(state, batch, k_step)
        if step % args.log_every == 0 and is_main_process():
            # ONE device fetch for the whole metrics dict (a float() per
            # metric costs a ~25 ms tunnel round-trip each)
            metrics = jax.device_get(metrics)
            line = {"step": step,
                    "time": round(time.time() - t_start, 2),
                    **{k: float(v) for k, v in metrics.items()}}
            print(json.dumps(line), flush=True)
            with open(log_path, "a") as fp:
                fp.write(json.dumps(line) + "\n")
        if args.val_every > 0 and (step + 1) % args.val_every == 0 \
                and is_main_process():
            try:
                validation_snapshot(step + 1, batch, state)
            except Exception as e:  # snapshots must never kill the run
                print(f"[train] validation snapshot failed: {e}")
        if args.save_every > 0 and (step + 1) % args.save_every == 0 \
                and is_main_process():
            save_checkpoint(ckpt_dir, state, step + 1)
    if is_main_process():
        save_checkpoint(ckpt_dir, state, max_steps)
        print(f"[train] done: {max_steps} steps, ckpts in {ckpt_dir}")


if __name__ == "__main__":
    main()
