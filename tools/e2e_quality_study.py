"""Trained-weights END-TO-END quality: text -> latents -> 3DGS -> render.

Extends tools/sampler_quality_study.py (stage-1-only, latent/image PSNR)
through the FULL production path: overfit a tiny MV-LDM (stage 1) AND a tiny
GSDecoder (stage 2) on fixed synthetic scenes, then sample latents from
text, decode images+depths, lift them to gaussians, render at the training
cameras, and report render-space PSNR against the ground-truth scene. An
"oracle" row feeds the GT images+depths straight into stage 2, separating
stage-2 reconstruction quality from stage-1 sampling loss.

Parity target: the reference's rendering-loss eval loop,
``/root/reference/prometheus/systems/mv_ldm_system.py:1039-1125`` (sample ->
gsdecoder -> render -> image metrics vs GT), rebuilt on trained-from-scratch
tiny towers so the datapoint is re-runnable on CPU without checkpoints.

    python tools/e2e_quality_study.py [--train_steps 2000]
        [--gs_train_steps 1200] [--out e2e_quality_study.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sampler_quality_study import fixed_scene_batch, psnr  # noqa: E402


def main():
    from prometheus_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()  # the axon plugin ignores the env var

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--train_steps", type=int, default=2000,
                    help="stage-1 (MV-LDM) overfit steps")
    ap.add_argument("--gs_train_steps", type=int, default=1200,
                    help="stage-2 (GSDecoder) overfit steps")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--scenes", type=int, default=2)
    ap.add_argument("--views", type=int, default=4,
                    help="views per scene; first half feed stage 2")
    ap.add_argument("--img", type=int, default=32)
    ap.add_argument("--guidance_scale", type=float, default=1.0,
                    help="1.0 = pure conditional (the overfit target)")
    ap.add_argument("--out", default="e2e_quality_study.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from prometheus_tpu.models import GSDecoderModel, MVLDMModel
    from prometheus_tpu.ops.schedulers import make_schedule
    from prometheus_tpu.parallel import (init_train_state, make_optimizer,
                                         make_train_step)
    from prometheus_tpu.systems import GSDecoderSystem, MVLDMSystem

    key = jax.random.PRNGKey(0)
    img, N = args.img, args.views
    n_in = N // 2
    hw = img // 2
    batch = fixed_scene_batch(key, list(range(args.scenes)), n_views=N,
                              img=img)
    result = {"scenes": args.scenes, "views": N, "img": args.img,
              "guidance_scale": args.guidance_scale}

    # ---- stage 1: overfit the tiny MV-LDM ----------------------------------
    mv_model = MVLDMModel(
        model_channels=32, num_head_channels=16, context_dim=64,
        channel_mult=(1, 2), num_res_blocks=1,
        disable_3d_attentions=(1, 0, 0, 0, 0), use_checkpoint=False,
        clip_layers=2, clip_width=64, vae_ch=32, vae_ch_mult=(1, 2),
        image_size=img)
    mv_system = MVLDMSystem(model=mv_model,
                            schedule=make_schedule("vprediction"),
                            num_pred_views=N)
    mv_params = mv_model.init(
        key, batch["images_mv"][:1], jnp.zeros((1, 77), jnp.int32),
        jnp.zeros((1, N, 9, hw, hw)), batch["text_emb"][:1],
        jnp.zeros((1, N)), batch["cameras_mv"][:1],
        method=MVLDMModel.init_everything)

    def mv_loss(p, ms, b, k):
        loss, metrics = mv_system.multi_view_loss(p, k, b, drop_pose_p=0.0,
                                                  drop_text_p=0.0)
        return loss, (metrics, ms)

    tx = make_optimizer(learning_rate=args.lr, weight_decay=0.0)
    state = init_train_state(mv_params, {}, tx, ema=True)
    step_fn = make_train_step(mv_loss, tx, ema_decay=0.999, donate=False)
    k_eval = jax.random.PRNGKey(123)
    eval_loss = jax.jit(lambda p: mv_system.multi_view_loss(
        p, k_eval, batch, drop_pose_p=0.0, drop_text_p=0.0)[0])

    t0 = time.time()
    for step in range(args.train_steps):
        key, k = jax.random.split(key)
        state, _ = step_fn(state, batch, k)
        if step % 200 == 0 or step == args.train_steps - 1:
            print(f"[stage1] step {step}: eval_loss "
                  f"{float(eval_loss(state.params)):.5f}", flush=True)
    mv_trained = (state.ema_params if state.ema_params is not None
                  else state.params)
    result["stage1"] = {
        "train_steps": args.train_steps,
        "train_seconds": round(time.time() - t0, 1),
        "final_eval_loss": round(float(eval_loss(mv_trained)), 5),
    }

    # ---- stage 2: overfit the tiny GSDecoder -------------------------------
    gs_model = GSDecoderModel(dit_hidden_size=32, dit_depth=1,
                              dit_num_heads=4, vae_ch=32, vae_ch_mult=(1, 2),
                              max_num_images=N)
    gs_system = GSDecoderSystem(model=gs_model, render_size=img)
    variables = gs_model.init(
        key, jnp.zeros((1, 1, 3, img, img)), jnp.zeros((1, 1, 14, hw, hw)),
        method=GSDecoderModel.init_everything)
    gs_params = variables["params"]
    gs_state = {k2: v for k2, v in variables.items() if k2 != "params"}

    def gs_loss(p, ms, b, k):
        return gs_system.loss(p, ms, b, k, num_input_views=n_in,
                              render_size=img)

    gtx = make_optimizer(learning_rate=args.lr, weight_decay=0.0)
    g_state = init_train_state(gs_params, gs_state, gtx, ema=False)
    g_step = make_train_step(gs_loss, gtx, donate=False)
    t0 = time.time()
    last_psnr = 0.0
    for step in range(args.gs_train_steps):
        key, k = jax.random.split(key)
        g_state, metrics = g_step(g_state, batch, k)
        if step % 200 == 0 or step == args.gs_train_steps - 1:
            last_psnr = float(metrics["psnr_mv"])
            print(f"[stage2] step {step}: novel-view psnr "
                  f"{last_psnr:.2f} dB", flush=True)
    result["stage2"] = {
        "train_steps": args.gs_train_steps,
        "train_seconds": round(time.time() - t0, 1),
        "final_novel_view_psnr_db": round(last_psnr, 2),
    }

    # ---- e2e: text -> latents -> images+depths -> 3DGS -> render -----------
    gs_vars = {"params": g_state.params, **g_state.model_state}

    def render_from(images, depths, cams):
        """stage-2 lift + render at ALL training cameras of the scene."""
        out = gs_system.inference(gs_vars, images[:, :n_in],
                                  depths[:, :n_in], cams[:, :n_in], cams)
        return out["images_nv_pred"]

    def e2e(sampler, steps, scene):
        cams = batch["cameras_mv"][scene:scene + 1]
        text = batch["text_emb"][scene:scene + 1]
        lat = mv_system.sample(
            mv_trained, jax.random.PRNGKey(7), cams, text,
            jnp.zeros_like(text), num_inference_steps=steps,
            guidance_scale=args.guidance_scale, guidance_type="joint",
            cfg_rescale=0.0, latent_hw=hw, sampler=sampler)
        imgs, deps = mv_system.decode_images_and_depths(mv_trained, lat)
        return render_from(imgs, deps, cams)

    def scored(r, scene):
        """PSNR at the SUPERVISED protocol — novel cameras only (stage-2
        training never constrains renders at the input viewpoints; the
        reference's rendering-loss eval supervises novel views too) — plus
        the all-views number as a secondary diagnostic."""
        gt = jax.device_get(batch["images_mv"][scene:scene + 1])
        r = jax.device_get(r)
        return (psnr(r[:, n_in:], gt[:, n_in:]), psnr(r, gt))

    rows = []
    for sampler, steps in (("euler", 100), ("dpmpp_2m", 30)):
        nv, allv = zip(*(scored(e2e(sampler, steps, s), s)
                         for s in range(args.scenes)))
        rows.append({"sampler": sampler, "steps": steps,
                     "render_psnr_db": round(sum(nv) / len(nv), 2),
                     "render_psnr_all_views_db":
                         round(sum(allv) / len(allv), 2),
                     "per_scene": [round(v, 2) for v in nv]})
        print(f"[e2e] {sampler}@{steps}: novel-view render PSNR "
              f"{rows[-1]['render_psnr_db']} dB", flush=True)

    # oracle: GT images+depths through stage 2 only (no sampling) — the
    # stage-2 ceiling; (e2e - oracle) is the stage-1 sampling cost
    nv, allv = zip(*(scored(render_from(
        batch["images_mv"][s:s + 1], batch["depths_mv"][s:s + 1],
        batch["cameras_mv"][s:s + 1]), s) for s in range(args.scenes)))
    result["oracle_stage2_render_psnr_db"] = round(sum(nv) / len(nv), 2)
    result["oracle_stage2_all_views_db"] = round(sum(allv) / len(allv), 2)
    result["e2e"] = rows
    print(f"[e2e] oracle (GT inputs): "
          f"{result['oracle_stage2_render_psnr_db']} dB", flush=True)

    with open(args.out, "w") as fp:
        json.dump(result, fp, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
