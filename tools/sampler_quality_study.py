"""Low-step sampler quality with TRAINED weights.

The DPM-Solver++(2M) claim ("~1/3 the model evals of the reference's
100-step Euler ladder") was only validated on random weights, where the
zero-SNR v-pred x0(lambda) trajectory is too rough for the order-2
advantage (tests/test_dpmpp_sampler.py). This study closes that gap without
the published checkpoint: it overfits a tiny MV-LDM on K fixed scenes (a
real optimization run — the loss curve is part of the artifact), then
measures each sampler's deterministic ODE solution against a fine-step
Euler reference (same seed, same guidance) in latent AND decoded-image
PSNR. Trained weights give the sampler the smooth denoiser it sees in
production.

Reference ladder being compared against: 100-step Euler,
``/root/reference/prometheus/systems/mv_ldm_system.py:857``.

    python tools/sampler_quality_study.py [--train_steps 1500]
        [--schedule vprediction|edm] [--out sampler_quality_study.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fixed_scene_batch(key, scene_ids, n_views=2, img=32, ctx=64):
    """Deterministic structured scenes (sinusoid textures keyed by scene id,
    fixed cameras/captions) — a fixed dataset the tiny model can overfit."""
    import jax
    import jax.numpy as jnp

    from prometheus_tpu.utils import get_random_cameras

    B = len(scene_ids)
    yy, xx = jnp.mgrid[0:img, 0:img] / img * 6.28318
    images = []
    for s in scene_ids:
        chans = [jnp.sin(yy * (1 + s % 3) + s) * jnp.cos(xx * (1 + s % 2)),
                 jnp.sin((yy + xx) * (1 + s % 4) * 0.5),
                 jnp.cos(yy * 0.7 + xx * (1 + s % 5) * 0.6)]
        base = jnp.stack(chans, 0)                       # (3, H, W)
        views = jnp.stack([jnp.roll(base, 3 * v, axis=-1)
                           for v in range(n_views)], 0)  # (N, 3, H, W)
        images.append(views)
    images = jnp.stack(images, 0)                        # (B, N, 3, H, W)
    cams = jnp.stack([get_random_cameras(jax.random.PRNGKey(100 + s),
                                         n_views, size=img)
                      for s in scene_ids], 0)
    text = jax.vmap(lambda s: jax.random.normal(
        jax.random.PRNGKey(200 + s), (77, ctx)) * 0.2)(jnp.asarray(scene_ids))
    depths = 0.5 + 0.5 * images[:, :, :1] ** 2
    return {
        "images_mv": images,
        "cameras_mv": cams,
        "depths_mv": depths,
        "text_emb": text,
        "uncond_text_emb": jnp.zeros_like(text),
    }


def psnr(a, b):
    import numpy as np

    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    rng = max(b.max() - b.min(), 1e-8)
    return float(10 * np.log10(rng * rng / mse))


def main():
    from prometheus_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()  # the axon plugin ignores the env var

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--train_steps", type=int, default=1500)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--schedule", default="vprediction",
                    choices=["vprediction", "edm"])
    ap.add_argument("--scenes", type=int, default=4)
    ap.add_argument("--views", type=int, default=2)
    ap.add_argument("--img", type=int, default=32)
    ap.add_argument("--ref_steps", type=int, default=400)
    ap.add_argument("--guidance_scale", type=float, default=7.5)
    ap.add_argument("--out", default="sampler_quality_study.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from prometheus_tpu.models import MVLDMModel
    from prometheus_tpu.ops.schedulers import make_schedule
    from prometheus_tpu.parallel import (init_train_state, make_optimizer,
                                         make_train_step)
    from prometheus_tpu.systems import MVLDMSystem

    key = jax.random.PRNGKey(0)
    img, N = args.img, args.views
    model = MVLDMModel(
        model_channels=32, num_head_channels=16, context_dim=64,
        channel_mult=(1, 2), num_res_blocks=1,
        disable_3d_attentions=(1, 0, 0, 0, 0), use_checkpoint=False,
        clip_layers=2, clip_width=64, vae_ch=32, vae_ch_mult=(1, 2),
        image_size=img)
    system = MVLDMSystem(model=model, schedule=make_schedule(args.schedule),
                         num_pred_views=N)

    batch = fixed_scene_batch(key, list(range(args.scenes)), n_views=N,
                              img=img)
    params = model.init(
        key, batch["images_mv"][:1], jnp.zeros((1, 77), jnp.int32),
        jnp.zeros((1, N, 9, img // 2, img // 2)), batch["text_emb"][:1],
        jnp.zeros((1, N)), batch["cameras_mv"][:1],
        method=MVLDMModel.init_everything)

    def loss_fn(p, ms, b, k):
        # no text/pose dropout: pure overfit target
        loss, metrics = system.multi_view_loss(p, k, b, drop_pose_p=0.0,
                                               drop_text_p=0.0)
        return loss, (metrics, ms)

    tx = make_optimizer(learning_rate=args.lr, weight_decay=0.0)
    state = init_train_state(params, {}, tx, ema=True)
    step_fn = make_train_step(loss_fn, tx, ema_decay=0.999, donate=False)

    # deterministic eval loss (fixed key -> fixed sigmas/noise): the
    # per-step training loss is not comparable across steps because each
    # step draws different sigmas; this IS comparable and is the curve
    k_eval = jax.random.PRNGKey(123)
    eval_loss = jax.jit(lambda p: system.multi_view_loss(
        p, k_eval, batch, drop_pose_p=0.0, drop_text_p=0.0)[0])

    curve = []
    t0 = time.time()
    for step in range(args.train_steps):
        key, k = jax.random.split(key)
        state, metrics = step_fn(state, batch, k)
        if step % 50 == 0 or step == args.train_steps - 1:
            l = float(eval_loss(state.params))
            curve.append({"step": step, "eval_loss": round(l, 5)})
            print(f"[train] step {step}: eval_loss {l:.5f}", flush=True)
    train_s = time.time() - t0
    trained = state.ema_params if state.ema_params is not None else state.params

    # --- sampler comparison: deterministic ODE solutions from one seed ---
    cams = batch["cameras_mv"][:1]
    text = batch["text_emb"][:1]
    uncond = batch["uncond_text_emb"][:1]
    k_sample = jax.random.PRNGKey(7)
    hw = img // 2

    def run(sampler, steps):
        lat = system.sample(trained, k_sample, cams, text, uncond,
                            num_inference_steps=steps,
                            guidance_scale=args.guidance_scale,
                            guidance_type="joint", cfg_rescale=0.0,
                            latent_hw=hw, sampler=sampler)
        imgs = model.apply(trained, lat[:, :, :4],
                           method=MVLDMModel.decode_latent)
        return jax.device_get(lat), jax.device_get(imgs)

    print(f"[study] reference: euler@{args.ref_steps}", flush=True)
    ref_lat, ref_img = run("euler", args.ref_steps)

    candidates = [("euler", 100), ("euler", 50), ("euler", 30),
                  ("dpmpp_2m", 30), ("dpmpp_2m", 16), ("dpmpp_2m", 100)]
    rows = []
    for sampler, steps in candidates:
        lat, im = run(sampler, steps)
        rows.append({
            "sampler": sampler, "steps": steps,
            "latent_psnr_db": round(psnr(lat, ref_lat), 2),
            "image_psnr_db": round(psnr(im, ref_img), 2),
        })
        print(f"[study] {sampler}@{steps}: latent "
              f"{rows[-1]['latent_psnr_db']} dB, image "
              f"{rows[-1]['image_psnr_db']} dB", flush=True)

    # overfit sanity: decoded reference should resemble the training scene
    overfit_psnr = psnr(ref_img, jax.device_get(batch["images_mv"][:1]))
    result = {
        "schedule": args.schedule,
        "train_steps": args.train_steps,
        "train_seconds": round(train_s, 1),
        "loss_first": curve[0]["eval_loss"],
        "loss_last": curve[-1]["eval_loss"],
        "loss_curve": curve,
        "ref_sampler": f"euler@{args.ref_steps}",
        "decoded_vs_train_scene_psnr_db": round(overfit_psnr, 2),
        "samplers": rows,
    }
    with open(args.out, "w") as fp:
        json.dump(result, fp, indent=2)
    print(json.dumps({k: v for k, v in result.items() if k != "loss_curve"}))


if __name__ == "__main__":
    main()
