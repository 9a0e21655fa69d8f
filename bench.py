"""Benchmark: flagship text -> 3DGS scene generation latency on real hardware.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
Baseline: the rebuild target from BASELINE.md — text -> 3DGS scene in < 5 s
end-to-end (the reference only claims "in seconds" on an RTX A6000;
``/root/reference/README.md:22``). vs_baseline = 5.0 / measured_seconds, so
values > 1 beat the target.

Pipeline measured (random weights — compute cost is identical to trained
weights): TrajDiT 100-step DDIM -> MV-LDM 50-step joint-CFG sampling (8 views,
SD-2.1-size U-Net, bf16) -> GS-VAE decode to pixel-aligned gaussians ->
512^2 render of 8 views. Compile time excluded (one warm-up run).

Env knobs: BENCH_SMALL=1 runs a reduced model (CI/debug).
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# NOTE: no persistent compilation cache here — the axon (tunneled TPU)
# backend's executable serialization path stalls for minutes per entry,
# costing far more than it saves. Re-confirmed round 2: a 12-matmul toy jit
# that compiles in seconds without the cache did not finish compile+serialize
# within 9.5 minutes with jax_compilation_cache_dir set. Compiles are paid
# once in the warm-up run; serving cold-start therefore ships as
# "keep the process warm" (serve.py), not an on-disk executable cache.


def _log(msg: str):
    print(msg, file=sys.stderr, flush=True)


# Progressive results for the deadline watchdog: the tunneled axon backend
# has hours-long DEGRADED phases (round 3: a toy 1024^2 matmul took 346 s to
# compile+run; a flagship warm-up hung > 1 h). If the driver launches this
# bench inside such a phase, hanging forever loses the round artifact —
# instead a watchdog emits whatever stages completed as ONE valid JSON line
# (flagged "deadline_hit") and exits. BENCH_DEADLINE=0 disables.
#
# Round-4 lesson: the driver killed the process BEFORE the watchdog fired
# (rc=124, parsed=null — no artifact at all). The partial result must not
# depend on outliving the driver: _checkpoint() persists the current partial
# JSON to disk after EVERY completed stage, and a SIGTERM handler prints it
# to stdout at kill time so the driver's last-line parse still succeeds.
_PARTIAL: dict = {"stage": "init"}
_PARTIAL_PATH = os.environ.get(
    "BENCH_PARTIAL_PATH",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "bench_partial.json"))


def _partial_payload(flag: str) -> dict:
    best = _PARTIAL.get("best_e2e_s")
    return {
        "metric": "text_to_3dgs_seconds_e2e",
        "value": round(best, 3) if best else -1.0,
        "unit": "s",
        "vs_baseline": round(5.0 / best, 3) if best else 0.0,
        "extra": {flag: True, **_PARTIAL},
    }


def _checkpoint(**updates):
    """Record stage progress: update _PARTIAL and persist it to disk.

    A driver kill (even SIGKILL) at any moment leaves a valid artifact with
    every completed stage in ``bench_partial.json``.
    """
    _PARTIAL.update(**updates)
    try:
        tmp = _PARTIAL_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump(_partial_payload("partial"), f)
        os.replace(tmp, _PARTIAL_PATH)
    except OSError:
        pass


def _install_kill_handler():
    """Print the partial artifact on SIGTERM (the driver's timeout signal)."""
    import signal

    def onterm(signum, frame):
        _log(f"bench: signal {signum} at stage '{_PARTIAL.get('stage')}' — "
             "emitting partial result")
        print(json.dumps(_partial_payload("killed")), flush=True)
        os._exit(0)

    for sig in (signal.SIGTERM, signal.SIGINT, signal.SIGHUP):
        try:
            signal.signal(sig, onterm)
        except (ValueError, OSError):
            pass


def _start_deadline_watchdog():
    import threading

    # 3300 s: above a healthy full run (~1500 s incl. init+compile), and —
    # unlike r4's 7200 s default — comfortably inside the driver's kill
    # window, so the watchdog THREAD (which fires even when the main thread
    # is blocked inside a hung native tunnel compile, where a signal handler
    # cannot preempt) emits the partial artifact before the driver gives up.
    deadline = float(os.environ.get("BENCH_DEADLINE", "3300"))
    if deadline <= 0:
        return

    def fire():
        _log(f"bench: DEADLINE {deadline:.0f}s hit at stage "
             f"'{_PARTIAL.get('stage')}' (degraded tunnel?) — emitting "
             "partial result")
        print(json.dumps(_partial_payload("deadline_hit")), flush=True)
        os._exit(0)

    t = threading.Timer(deadline, fire)
    t.daemon = True
    t.start()


def _probe_tunnel():
    """Fail fast on a degraded tunnel instead of burning the full deadline.

    The axon backend's degraded phases make even a toy 1024^2 matmul take
    300+ s (see the watchdog note above). Before committing to the flagship
    init (~10 min healthy, unbounded degraded), run one toy jit with its own
    short timer: if it can't finish in BENCH_PROBE_TIMEOUT (default 420 s,
    0 disables), emit the partial artifact flagged ``tunnel_degraded`` and
    exit — the driver gets the chip-free stages back in minutes, not hours.
    """
    import threading

    limit = float(os.environ.get("BENCH_PROBE_TIMEOUT", "420"))
    if limit <= 0:
        return

    def fire():
        _log(f"bench: tunnel probe exceeded {limit:.0f}s — degraded "
             "backend, emitting partial result")
        print(json.dumps(_partial_payload("tunnel_degraded")), flush=True)
        os._exit(0)

    t = threading.Timer(limit, fire)
    t.daemon = True
    t.start()
    t0 = time.time()
    y = jax.jit(lambda a: a @ a)(jnp.ones((1024, 1024)))
    jax.device_get(y.ravel()[0:1])
    t.cancel()
    probe_s = time.time() - t0
    _checkpoint(probe_s=round(probe_s, 1))
    _log(f"bench: tunnel probe OK in {probe_s:.1f}s")


def sync(tree):
    """Force completion by fetching one element to the host.

    ``jax.block_until_ready`` does NOT block on the tunneled axon backend
    (verified: a 1.1-TFLOP matmul "completed" in 0.04 ms under it, vs 8.8 ms
    with a device_get sync) — every timing below must end with a real
    device->host fetch of a value that depends on the measured computation.
    """
    leaf = jax.tree.leaves(tree)[0]
    jax.device_get(leaf.ravel()[0:1])


def build_flagship(small: bool = False):
    from prometheus_tpu.models import GSDecoderModel, MVLDMModel, TrajDiTModel
    from prometheus_tpu.ops.schedulers import make_schedule
    from prometheus_tpu.pipeline import PrometheusPipeline
    from prometheus_tpu.systems import MVLDMSystem, TrajDiTSystem

    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16
    if small:
        mv_kw = dict(model_channels=64, num_head_channels=32, context_dim=64,
                     channel_mult=(1, 2), num_res_blocks=1,
                     disable_3d_attentions=(1, 0, 0, 0, 0),
                     clip_layers=2, clip_width=64, vae_ch=32,
                     vae_ch_mult=(1, 2, 4), image_size=64)
        gs_kw = dict(dit_hidden_size=64, dit_depth=2, dit_num_heads=4,
                     vae_ch=32, vae_ch_mult=(1, 2, 4))
        traj_kw = dict(hidden_size=64, num_blocks=2, num_heads=4, text_dim=64)
    else:
        mv_kw = dict(image_size=256)   # flagship SD-2.1 defaults
        gs_kw = dict()
        traj_kw = dict()

    mv_model = MVLDMModel(use_checkpoint=False, dtype=dtype, **mv_kw)
    traj_model = TrajDiTModel(dtype=dtype, **traj_kw)
    gs_model = GSDecoderModel(dtype=dtype, **gs_kw)

    B, N = 1, 8
    hw = mv_model.latent_size
    img = mv_model.image_size
    from prometheus_tpu.utils import get_random_cameras
    cams = get_random_cameras(key, N, size=img)[None]

    t0 = time.time()
    mv_params = jax.jit(lambda: mv_model.init(
        key, jnp.zeros((B, 1, 3, img, img)), jnp.zeros((B, 77), jnp.int32),
        jnp.zeros((B, N, 9, hw, hw), dtype), jnp.zeros((B, 77, mv_model.context_dim), dtype),
        jnp.zeros((B, N)), cams, method=MVLDMModel.init_everything))()
    traj_params = jax.jit(lambda: traj_model.init(
        key, jnp.zeros((1, 29, 11)),
        jnp.zeros((1, 77, mv_model.context_dim), dtype),
        jnp.zeros((1,))))()
    gs_vars = jax.jit(lambda: gs_model.init(
        key, jnp.zeros((B, 1, 3, img, img), dtype),
        jnp.zeros((B, N, 14, hw, hw), dtype),
        method=GSDecoderModel.init_everything))()
    # Inference params live in bf16: the flagship towers are ~1.9B params and
    # would not fit the 16 GB v5e in fp32 alongside render intermediates.
    def to_bf16(tree):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)

    mv_params, traj_params, gs_vars = (to_bf16(mv_params),
                                       to_bf16(traj_params), to_bf16(gs_vars))
    sync(mv_params)  # real fetch: block_until_ready is a no-op on the tunnel
    init_s = time.time() - t0

    mv_sys = MVLDMSystem(model=mv_model, schedule=make_schedule("vprediction"),
                         num_pred_views=N)
    traj_sys = TrajDiTSystem(model=traj_model)
    pipe = PrometheusPipeline(
        mvldm=mv_sys, mvldm_params=mv_params,
        traj=traj_sys, traj_params=traj_params,
        gsdecoder=gs_model, gsdecoder_vars=gs_vars,
    )
    return pipe, init_s


def run_once(pipe, key, *, steps, render_size, image_size, render_cap=1024,
             cfg_frac=None, sampler="euler"):
    result = pipe.generate(
        "a cozy wooden cabin in a snowy forest", key,
        num_views=8, num_inference_steps=steps, num_traj_steps=100,
        guidance_scale=7.5, guidance_type="joint", cfg_rescale=0.7,
        render_size=render_size, image_size=image_size,
        render_tile_capacity=render_cap, cfg_interval_frac=cfg_frac,
        sampler=sampler,
    )
    sync(result["images_gs_render"])
    sync(result["images_pred"])
    return result


def bench_train_step(pipe, *, batch_size=1, num_views=8):
    """Flagship stage-2 training-step throughput + estimated MFU.

    One jitted step: latent v-pred MSE, bf16, remat U-Net, AdamW on the
    U-Net only (VAE/CLIP frozen, reference mv_ldm.py:52-64), EMA update.
    """
    import optax

    from prometheus_tpu.models import MVLDMModel
    from prometheus_tpu.parallel import (init_train_state, make_optimizer,
                                         make_train_step)
    from prometheus_tpu.systems import MVLDMSystem
    from prometheus_tpu.utils import get_random_cameras

    # BENCH_REMAT=dots: selective remat (save matmul outputs) — trades HBM
    # for recompute FLOPs; A/B'd on-chip for the MFU target
    mv_model = pipe.mvldm.model.clone(
        use_checkpoint=True,
        remat_policy=os.environ.get("BENCH_REMAT", "full"))
    system = MVLDMSystem(model=mv_model, schedule=pipe.mvldm.schedule,
                         num_pred_views=num_views)
    params = pipe.mvldm_params
    img = mv_model.image_size

    def _frozen(path, _):
        names = [str(getattr(k, "key", getattr(k, "name", ""))) for k in path]
        return any(n in ("vae", "text_encoder") for n in names)

    frozen_mask = jax.tree_util.tree_map_with_path(_frozen, params)
    # bf16 first moment + donated state buffers: the flagship step fits the
    # 16 GB v5e (fp32 moments + undonated state RESOURCE_EXHAUSTED it).
    # frozen_mask keeps grads/opt/EMA to the trainable U-Net subtree.
    tx = make_optimizer(learning_rate=1e-5, mu_dtype=jnp.bfloat16)
    state = init_train_state(params, {}, tx, frozen_mask=frozen_mask)

    def loss_fn(p, ms, batch, k):
        loss, metrics = system.multi_view_loss(p, k, batch)
        return loss, (metrics, ms)

    step_fn = make_train_step(loss_fn, tx, donate=True,
                              frozen_mask=frozen_mask)

    key = jax.random.PRNGKey(3)
    cams = jnp.tile(get_random_cameras(key, num_views, size=img)[None],
                    (batch_size, 1, 1))
    batch = {
        "images_mv": jax.random.uniform(
            key, (batch_size, num_views, 3, img, img), jnp.bfloat16, -1, 1),
        "cameras_mv": cams,
        "depths_mv": jax.random.uniform(
            key, (batch_size, num_views, 1, img, img), jnp.bfloat16, 0.05, 1),
        "text_emb": (jax.random.normal(
            key, (batch_size, 77, mv_model.context_dim), jnp.bfloat16) * 0.02),
        "uncond_text_emb": jnp.zeros(
            (batch_size, 77, mv_model.context_dim), jnp.bfloat16),
    }

    flops = None
    try:
        cost = step_fn.lower(state, batch, key).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
    except Exception as e:
        _log(f"bench: cost_analysis unavailable ({e})")

    state, metrics = step_fn(state, batch, key)   # compile + 1st step
    sync(metrics["loss"])
    prof_dir = os.environ.get("BENCH_PROFILE_TRAIN", "")
    if prof_dir:
        # two traced steps for the offline MFU breakdown (parse_trace.py);
        # excluded from the timing loop below
        from prometheus_tpu.profiling import trace

        with trace(prof_dir):
            for _ in range(2):
                state, metrics = step_fn(state, batch, key)
            sync(metrics["loss"])
        _log(f"bench: train-step trace written to {prof_dir}")
    n_it = 4
    t0 = time.time()
    for _ in range(n_it):
        state, metrics = step_fn(state, batch, key)
    sync(metrics["loss"])
    dt = (time.time() - t0) / n_it

    dev = jax.devices()[0]
    peak = 197e12 if "v5 lite" in getattr(dev, "device_kind", "") else None
    out = {
        "train_step_s": round(dt, 4),
        "train_examples_per_s": round(batch_size / dt, 3),
        "train_batch": [batch_size, num_views, img],
    }
    if flops:
        out["train_step_tflops"] = round(flops / 1e12, 2)
        if peak:
            out["train_mfu"] = round(flops / dt / peak, 4)
    # donate=True invalidated the ORIGINAL pipe.mvldm_params buffers at the
    # first step (train.py:435 fixed the same hazard for frozen text params);
    # hand the live final-state tree back so a later bench_train_step call
    # (the bs2 datapoint) or any post-bench pipeline use sees valid arrays.
    # A deep pre-copy instead would transiently double flagship params on
    # the 16 GB chip, which is exactly what donation is avoiding here.
    pipe.mvldm_params = state.params
    return out


def main():
    from prometheus_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    _install_kill_handler()
    _start_deadline_watchdog()
    # chip-free stage FIRST: host data-plane throughput (native C++ vs
    # pure-python transform). jax-free subprocess, so the artifact carries a
    # real measured number even if the TPU tunnel is degraded (the deadline
    # watchdog emits completed stages).
    if os.environ.get("BENCH_LOADER", "1") == "1":
        try:
            import subprocess
            import sys as _sys
            r = subprocess.run(
                [_sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "tools", "bench_loader.py"),
                 "--scenes", "4", "--frames", "12", "--seconds", "8"],
                capture_output=True, text=True, timeout=600)
            loader = json.loads(r.stdout.strip().splitlines()[-1])
            _checkpoint(loader=loader)
            _log(f"bench: loader {loader.get('images_per_s_native')} img/s "
                 f"native, {loader.get('images_per_s_python')} python")
        except Exception as e:  # never let the host stage sink the bench
            _log(f"bench: loader bench failed ({e})")
    # chip-free stage: render quality vs the EXACT compositor on the
    # trained-statistics scene, forced onto the host CPU in a subprocess
    # (jax.config jax_platforms=cpu — the axon plugin ignores the env var).
    # Keeps a real quality number in the artifact even when the tunnel is
    # degraded; the on-chip psnr_vs_exact at full density still runs later.
    if os.environ.get("BENCH_QUALITY_CPU", "1") == "1":
        try:
            import subprocess
            import sys as _sys
            code = (
                "import jax\n"
                "jax.config.update('jax_platforms', 'cpu')\n"
                "import json\n"
                "from prometheus_tpu.ops.gaussian.quality import ("
                "make_trained_stats_scene, psnr_vs_exact)\n"
                "from prometheus_tpu.utils import get_random_cameras\n"
                "cams = get_random_cameras(jax.random.PRNGKey(0), 1,"
                " size=512)[None]\n"
                "scene = make_trained_stats_scene(jax.random.PRNGKey(5),"
                " cams, n_gaussians=524288)\n"
                "one = tuple(g[0] for g in scene)\n"
                "out = {}\n"
                "for label, cap in (('psnr_vs_exact_db', 1024),"
                " ('fast_psnr_vs_exact_db', 512)):\n"
                "    db = psnr_vs_exact(cams[0, 0], one,"
                " jax.random.PRNGKey(42), h=512, w=512, tile_capacity=cap,"
                " n_sample_tiles=16)\n"
                "    out[label] = round(float(db), 1)\n"
                "print(json.dumps(out))\n")
            r = subprocess.run([_sys.executable, "-c", code],
                               capture_output=True, text=True, timeout=900)
            if not r.stdout.strip():  # crash/OOM: surface the real error
                raise RuntimeError(
                    f"rc={r.returncode} stderr tail: {r.stderr[-300:]}")
            q = json.loads(r.stdout.strip().splitlines()[-1])
            _checkpoint(quality_cpu_trained_stats_512=q)
            _log(f"bench: CPU quality vs exact {q}")
        except Exception as e:  # never let the host stage sink the bench
            _log(f"bench: CPU quality stage failed ({e})")
    _checkpoint(stage="tunnel_probe")
    _probe_tunnel()
    small = os.environ.get("BENCH_SMALL", "0") == "1"
    # 100 denoise steps = the reference inference config
    # (/root/reference/inference.py:44-59); override with BENCH_STEPS
    steps = int(os.environ.get("BENCH_STEPS", "100"))
    bench_train = os.environ.get("BENCH_TRAIN", "1") == "1" and not small
    render_size = 128 if small else 512
    platform = jax.devices()[0].platform

    _log(f"bench: building {'small' if small else 'flagship'} models...")
    pipe, init_s = build_flagship(small)
    image_size = pipe.mvldm.model.image_size
    _log(f"bench: init done in {init_s:.1f}s; warm-up (compiles)...")
    _checkpoint(stage="warmup", init_s=round(init_s, 1))

    if os.environ.get("BENCH_E2E", "1") == "0":
        # train-step-only mode (debug/iteration): skip the e2e pipeline
        _log("bench: BENCH_E2E=0 -> training-step benchmark only")
        out = bench_train_step(pipe)
        print(json.dumps({"metric": "train_step_s",
                          "value": out["train_step_s"], "unit": "s",
                          "vs_baseline": 0.0, "extra": out}))
        return

    key = jax.random.PRNGKey(7)
    t0 = time.time()
    run_once(pipe, key, steps=steps, render_size=render_size,
             image_size=image_size)  # warm-up: includes all compiles
    compile_s = time.time() - t0
    _log(f"bench: warm-up done in {compile_s:.1f}s; measuring...")
    _checkpoint(stage="measuring", compile_s=round(compile_s, 1))

    times = []
    result = None
    prof_dir = os.environ.get("BENCH_PROFILE", "")
    if prof_dir:
        # one traced run (excluded from timing stats): xplane dump for
        # offline op-level analysis
        from prometheus_tpu.profiling import trace

        with trace(prof_dir):
            run_once(pipe, jax.random.PRNGKey(99), steps=steps,
                     render_size=render_size, image_size=image_size)
        _log(f"bench: profiler trace written to {prof_dir}")
    for i in range(3 if small else 2):
        t0 = time.time()
        result = run_once(pipe, jax.random.PRNGKey(100 + i), steps=steps,
                          render_size=render_size, image_size=image_size)
        times.append(time.time() - t0)
        _checkpoint(best_e2e_s=min(times))
    best = min(times)

    # STAGE ORDER (degraded-tunnel resilience): everything that REUSES the
    # warm-up compiles or only needs small new programs (quality PSNR,
    # render FPS, overflow stats) runs FIRST, then the train step (MFU —
    # one big compile, high value), and the compile-heavy optional extras
    # (fast-render cap recompile, CFG-interval, dpmpp scan) run LAST. On a
    # degraded tunnel each NEW compile can eat tens of minutes, and the r4
    # deadline partial lost FPS/MFU to the fast-render+dpmpp compiles.
    import numpy as np

    last_key = 100 + (3 if small else 2) - 1   # same scene as `result`

    # quality vs the EXACT compositor at production density (VERDICT r2
    # weak #1): random-tile-subset PSNR for the quality-default and fast
    # capacities, on this scene AND a trained-statistics synthetic scene
    _checkpoint(stage="quality")
    quality = {}
    try:
        from prometheus_tpu.ops.gaussian.quality import (
            make_trained_stats_scene, psnr_vs_exact)

        qkey = jax.random.PRNGKey(42)
        cam0 = result["cameras"][0, 0]
        gs_one = tuple(g[0] for g in result["gaussians"])
        backend = pipe._backend()
        for label, cap in (("psnr_vs_exact_db", 1024),
                           ("fast_psnr_vs_exact_db", 512)):
            db = psnr_vs_exact(cam0, gs_one, qkey, h=render_size,
                               w=render_size, tile_capacity=cap,
                               n_sample_tiles=32, backend=backend)
            sync(db)
            quality[label] = round(float(db), 1)
        ts_scene = make_trained_stats_scene(
            jax.random.PRNGKey(5), result["cameras"],
            n_gaussians=int(result["gaussians"][0].shape[1]))
        ts_one = tuple(g[0] for g in ts_scene)
        db = psnr_vs_exact(cam0, ts_one, qkey, h=render_size,
                           w=render_size, tile_capacity=1024,
                           n_sample_tiles=32, backend=backend)
        sync(db)
        quality["trained_stats_psnr_vs_exact_db"] = round(float(db), 1)
        # trained-stats render FPS (the realistic-regime speed datapoint)
        from prometheus_tpu.ops.gaussian import render_gaussians as _rg

        sync(_rg(result["cameras"], ts_scene, h=render_size, w=render_size,
                 backend=backend))
        n_frames = result["cameras"].shape[1] * 4
        t0 = time.time()
        for _ in range(4):
            out_ts = _rg(result["cameras"], ts_scene, h=render_size,
                         w=render_size, backend=backend)
        sync(out_ts)
        quality["trained_stats_render_fps"] = round(
            n_frames / (time.time() - t0), 1)
    except Exception as e:
        _log(f"bench: psnr_vs_exact failed ({e})")

    # secondary metric: splat render FPS at the render resolution
    from prometheus_tpu.ops.gaussian import render_gaussians

    cams = result["cameras"]
    gaussians = result["gaussians"]
    backend = pipe._backend()
    sync(render_gaussians(
        cams, gaussians, h=render_size, w=render_size, backend=backend))
    n_frames = cams.shape[1] * 4
    t0 = time.time()
    for _ in range(4):
        out = render_gaussians(cams, gaussians, h=render_size, w=render_size,
                               backend=backend)
    sync(out)
    render_fps = n_frames / (time.time() - t0)

    # tile-cap truncation diagnostics at production density (VERDICT weak #5)
    overflow = {}
    try:
        from functools import partial

        from prometheus_tpu.ops.gaussian.projection import project_gaussians
        from prometheus_tpu.ops.gaussian.tiled import tile_overflow_stats
        from prometheus_tpu.utils.cameras import (camera_c2w,
                                                  camera_intrinsics,
                                                  opengl_to_opencv)

        cam0 = cams[0, 0]
        c2w34 = opengl_to_opencv(camera_c2w(cam0)[:3, :4])
        w2c = jnp.linalg.inv(jnp.concatenate(
            [c2w34, jnp.asarray([[0.0, 0.0, 0.0, 1.0]])], 0))
        fx, fy, cx, cy, _, _ = camera_intrinsics(cam0, h=render_size,
                                                 w=render_size)
        proj = jax.jit(partial(project_gaussians, img_h=render_size,
                               img_w=render_size))(
            gaussians[0][0], gaussians[3][0], gaussians[4][0], w2c,
            fx, fy, cx, cy, opacities=gaussians[2][0][..., 0])
        stats = tile_overflow_stats(proj, 16, render_size // 16,
                                    render_size // 16, (32, 32))
        overflow = {k: int(v) for k, v in stats.items()}
    except Exception as e:
        _log(f"bench: overflow stats failed ({e})")

    _checkpoint(stage="train_step", render_fps=round(render_fps, 1),
                tile_overflow=overflow, **quality)
    train_extra = {}
    if bench_train:
        _log("bench: training-step benchmark (compile)...")
        try:
            train_extra.update(bench_train_step(pipe))
        except Exception as e:
            _log(f"bench: train-step bench failed ({e})")
        # batch-2 datapoint: amortizes the fixed optimizer/EMA update phase
        # (~16 ms/step); reported alongside the reference-matched batch-1
        try:
            bs2 = bench_train_step(pipe, batch_size=2)
            train_extra.update({f"{k}_bs2": v for k, v in bs2.items()
                                if k in ("train_step_s", "train_mfu",
                                         "train_examples_per_s")})
        except Exception as e:
            _log(f"bench: bs2 train-step bench failed ({e})")
        _checkpoint(**train_extra)

    # ---- compile-heavy optional extras (LAST; see stage-order note) ----
    # fast-render mode: capacity-512 worklists (depth-ordered truncation
    # behind near-saturated alpha; measured exact on the trained-stats
    # scene with the full default instance budget — fast_psnr_vs_exact_db
    # above records it per round). Reported alongside, not as, the primary
    # quality-default number.
    _checkpoint(stage="fast_render")
    run_once(pipe, jax.random.PRNGKey(last_key), steps=steps,
             render_size=render_size, image_size=image_size,
             render_cap=512)                   # warm-up: cap-512 compile
    t0 = time.time()
    fast = run_once(pipe, jax.random.PRNGKey(last_key), steps=steps,
                    render_size=render_size, image_size=image_size,
                    render_cap=512)
    fast_s = time.time() - t0
    a = np.asarray(fast["images_gs_render"], np.float32)
    b = np.asarray(result["images_gs_render"], np.float32)
    mse = float(np.mean((a - b) ** 2))
    fast_psnr = 10.0 * np.log10(4.0 / max(mse, 1e-12))
    _checkpoint(e2e_fast_render_s=round(fast_s, 3),
                fast_render_psnr_db=round(fast_psnr, 1))

    # optional CFG-interval fast mode datapoint (guidance on the first
    # BENCH_CFG_FRAC of steps only; NOT the primary metric — the primary
    # e2e stays reference-exact full-interval CFG)
    cfg_frac = os.environ.get("BENCH_CFG_FRAC", "")
    if cfg_frac:
        frac = float(cfg_frac)
        run_once(pipe, jax.random.PRNGKey(last_key), steps=steps,
                 render_size=render_size, image_size=image_size,
                 cfg_frac=frac)                 # warm-up compile
        t0 = time.time()
        run_once(pipe, jax.random.PRNGKey(last_key), steps=steps,
                 render_size=render_size, image_size=image_size,
                 cfg_frac=frac)
        extra_cfg = {"e2e_cfg_interval_s": round(time.time() - t0, 3),
                     "cfg_interval_frac": frac}
    else:
        extra_cfg = {}

    # optional DPM-Solver++(2M) fast-sampler datapoint (BENCH_DPMPP=steps,
    # e.g. 30): same ODE at ~1/3 the model evals; NOT the primary metric —
    # the primary e2e stays the reference's 100-step Euler
    dpm_steps = os.environ.get("BENCH_DPMPP", "30")  # "" disables
    if dpm_steps:
        ns = int(dpm_steps)
        _checkpoint(stage=f"dpmpp_{ns}")
        run_once(pipe, jax.random.PRNGKey(last_key), steps=ns,
                 render_size=render_size, image_size=image_size,
                 sampler="dpmpp_2m")            # warm-up compile
        t0 = time.time()
        run_once(pipe, jax.random.PRNGKey(last_key), steps=ns,
                 render_size=render_size, image_size=image_size,
                 sampler="dpmpp_2m")
        extra_cfg[f"e2e_dpmpp{ns}_s"] = round(time.time() - t0, 3)

    extra = {
        "platform": platform, "steps": steps,
        "render_size": render_size, "init_s": round(init_s, 1),
        "compile_s": round(compile_s, 1),
        "all_times": [round(t, 3) for t in times],
        "e2e_fast_render_s": round(fast_s, 3),
        "fast_render_psnr_db": round(fast_psnr, 1),
        "render_fps": round(render_fps, 1),
        "num_gaussians": int(result["gaussians"][0].shape[1]),
        "scenes_per_min_per_chip": round(60.0 / best, 2),
        "tile_overflow": overflow,
        **extra_cfg,
        **quality,
        **train_extra,
    }
    if "loader" in _PARTIAL:
        extra["loader"] = _PARTIAL["loader"]

    metric = "text_to_3dgs_seconds_e2e" + ("_small" if small else "")
    print(json.dumps({
        "metric": metric,
        "value": round(best, 3),
        "unit": "s",
        "vs_baseline": round(5.0 / best, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
