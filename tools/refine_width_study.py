"""MV-SDS++ refine width-scaling study (on-chip proof that the flagship
refine path scales).

The tunneled axon backend has repeatedly dropped remote-compiles of the
FLAGSHIP-width refine programs (PARITY round-2/3 notes). This tool runs the
refine step at increasing U-Net widths — flagship structure (SD-2.1 depth,
channel_mult 1/2/4/4, 256^2 renders, flagship gaussian count) with
``model_channels`` scaled — and records per-width compile + steady-state
iteration times. A clean datapoint at width_frac 1.0 IS the flagship refine
proof; if the tunnel drops it, the sub-width trend documents that the path
scales and the failure is the environment.

Reference parity target: ``/root/reference/prometheus/models/
mv_sdspp_refiner.py:242-359`` (train_step / refine loop).

    python tools/refine_width_study.py [--widths 0.25 0.5 1.0] [--iters 4]
        [--gaussians 524288] [--out refine_width_study.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_mvldm(frac: float, *, flagship_clip: bool):
    """MV-LDM with flagship structure and width-scaled channels."""
    import jax
    import jax.numpy as jnp

    from prometheus_tpu.models import MVLDMModel
    from prometheus_tpu.ops.schedulers import make_schedule
    from prometheus_tpu.systems import MVLDMSystem
    from prometheus_tpu.utils import get_random_cameras

    dtype = jnp.bfloat16
    kw = dict(
        model_channels=int(320 * frac),
        num_head_channels=int(64 * frac),
        vae_ch=int(128 * frac),
        image_size=256,
        use_checkpoint=False,
        dtype=dtype,
    )
    if not flagship_clip:
        # sub-width datapoints: the text tower only supplies embeddings the
        # refiner treats as constants — scale it down so init time over the
        # tunnel measures the U-Net/VAE, not CLIP
        kw.update(clip_layers=2, clip_width=64, context_dim=int(1024 * frac))
    model = MVLDMModel(**kw)

    key = jax.random.PRNGKey(0)
    B, N = 1, 1
    hw, img = model.latent_size, model.image_size
    cams = get_random_cameras(key, N, size=img)[None]
    t0 = time.time()
    params = jax.jit(lambda: model.init(
        key, jnp.zeros((B, N, 3, img, img)), jnp.zeros((B, 77), jnp.int32),
        jnp.zeros((B, N, 9, hw, hw), dtype),
        jnp.zeros((B, 77, model.context_dim), dtype),
        jnp.zeros((B, N)), cams, method=MVLDMModel.init_everything))()
    params = jax.tree.map(
        lambda x: x.astype(dtype) if hasattr(x, "dtype")
        and x.dtype == jnp.float32 else x, params)
    jax.device_get(jax.tree.leaves(params)[0].ravel()[0:1])  # real sync
    init_s = time.time() - t0
    system = MVLDMSystem(model=model, schedule=make_schedule("vprediction"),
                         num_pred_views=4)
    return model, params, system, init_s


def synthetic_gaussians(key, n: int):
    """Plausible trained-statistics scene: points in a ball, bimodal opacity,
    ~pixel-footprint lognormal scales (matches ops/gaussian/quality.py's
    realistic-regime scene)."""
    import jax
    import jax.numpy as jnp

    ks = jax.random.split(key, 5)
    xyz = jax.random.ball(ks[0], 3, shape=(1, n)) * 2.0
    feats = jax.random.uniform(ks[1], (1, n, 1, 3))
    op_hi = jax.random.uniform(ks[2], (1, n, 1)) > 0.5
    opacity = jnp.where(op_hi, 0.9, 0.05) * jax.random.uniform(
        ks[2], (1, n, 1), minval=0.5, maxval=1.0)
    scales = jnp.exp(jax.random.normal(ks[3], (1, n, 3)) * 0.5 - 5.0)
    rots = jax.random.normal(ks[4], (1, n, 4))
    rots = rots / jnp.linalg.norm(rots, axis=-1, keepdims=True)
    return (xyz, feats, opacity, scales, rots)


def run_width(frac: float, *, iters: int, n_gauss: int, views: int,
              img_size: int) -> dict:
    import jax
    import jax.numpy as jnp

    from prometheus_tpu.refiners import MultiviewSDSPPRefiner
    from prometheus_tpu.refiners import sds_pp as sds_mod
    from prometheus_tpu.models import MVLDMModel
    from prometheus_tpu.utils import get_random_cameras

    model, params, system, init_s = build_mvldm(
        frac, flagship_clip=(frac >= 1.0))

    # params-first + frozen_params: weights are runtime buffers, so the
    # serialized remote-compile body stays width-independent (the closure
    # form embedded every weight as an MLIR constant — the tunnel rejected
    # the width>=0.5 bodies with HTTP 413 in round 4)
    def encode_fn(p, images):
        return model.apply(p, images[None],
                           method=MVLDMModel.encode_image)[0]

    def decode_fn(p, latents):
        return model.apply(p, latents[None],
                           method=MVLDMModel.decode_latent)[0]

    refiner = MultiviewSDSPPRefiner(
        encode_fn=encode_fn, decode_fn=decode_fn, denoise_fn=None,
        frozen_params=params, mvldm_system=system, mvldm_params=params,
        total_iterations=iters, densification_interval=10 * iters,
        num_views=views, img_size=img_size)

    # time each of the 3 compile units per iteration by wrapping the retry
    # shim every refine call goes through; a device fetch makes the timing
    # real on the tunneled backend (block_until_ready is a no-op there)
    call_times: list[float] = []
    orig = sds_mod.call_with_compile_retry

    def timed(fn, *args, **kw):
        t0 = time.time()
        out = orig(fn, *args, **kw)
        leaf = jax.tree.leaves(out)[0]
        jax.device_get(jnp.ravel(leaf)[0:1])
        call_times.append(time.time() - t0)
        return out

    key = jax.random.PRNGKey(1)
    gaussians = synthetic_gaussians(key, n_gauss)
    ctx = model.context_dim
    text = jax.random.normal(key, (1, 77, ctx), jnp.bfloat16) * 0.02
    uncond = jnp.zeros((1, 77, ctx), jnp.bfloat16)
    dense = get_random_cameras(key, 16, size=img_size)[None]

    sds_mod.call_with_compile_retry = timed
    try:
        t0 = time.time()
        out = refiner.refine_gaussians(gaussians, text, uncond, dense, key)
        jax.device_get(jnp.ravel(out[0])[0:1])
        total_s = time.time() - t0
    finally:
        sds_mod.call_with_compile_retry = orig

    per_iter = [sum(call_times[3 * i : 3 * i + 3])
                for i in range(len(call_times) // 3)]
    steady = sorted(per_iter[1:])[len(per_iter[1:]) // 2] if len(per_iter) > 1 \
        else None
    return {
        "width_frac": frac,
        "model_channels": int(320 * frac),
        "init_s": round(init_s, 1),
        "total_s": round(total_s, 1),
        "iter1_s_incl_compile": round(per_iter[0], 1) if per_iter else None,
        "steady_iter_s": round(steady, 3) if steady is not None else None,
        "per_iter_s": [round(t, 3) for t in per_iter],
        "iters": iters,
        "n_gaussians": n_gauss,
        "views_per_iter": views,
        "img_size": img_size,
        "finite": bool(jnp.isfinite(out[0]).all()),
    }


def main():
    from prometheus_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()  # the axon plugin ignores the env var

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--widths", type=float, nargs="*", default=[0.25, 0.5, 1.0])
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--gaussians", type=int, default=524288)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--img_size", type=int, default=256)
    ap.add_argument("--out", type=str, default="refine_width_study.json")
    args = ap.parse_args()

    results = {"widths": [], "flagship_ok": False}
    for frac in args.widths:
        print(f"[study] width_frac={frac} "
              f"(model_channels={int(320 * frac)})...", flush=True)
        try:
            r = run_width(frac, iters=args.iters, n_gauss=args.gaussians,
                          views=args.views, img_size=args.img_size)
            results["widths"].append(r)
            if frac >= 1.0 and r["finite"]:
                results["flagship_ok"] = True
            print(f"[study] width_frac={frac}: init {r['init_s']}s, "
                  f"iter1 {r['iter1_s_incl_compile']}s, "
                  f"steady {r['steady_iter_s']}s", flush=True)
        except Exception as e:  # noqa: BLE001 — record the failure mode
            results["widths"].append(
                {"width_frac": frac, "error": f"{type(e).__name__}: {e}"})
            print(f"[study] width_frac={frac} FAILED: {e}", flush=True)
        with open(args.out, "w") as fp:
            json.dump(results, fp, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
