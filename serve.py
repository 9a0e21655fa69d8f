#!/usr/bin/env python
"""Batched multi-prompt text -> 3DGS serving (BASELINE config 5).

Shards a batch of prompts over the device mesh's ``data`` axis — diffusion
sampling, gaussian decoding, and tile rasterization all run SPMD — and
reports scenes/min throughput. Size the batch to the mesh: the flagship
models (bf16) fill a 16 GB v5e at one scene per chip, so use
``--batch_size == num_chips`` (batch 1 on a single chip; the single-scene
latency benchmark is ``bench.py``).

Cold start: the first batch pays init + XLA compile once per process
(~minutes for the flagship); the serving model is "keep the process warm" —
JAX's persistent compilation cache is NOT usable on the tunneled axon
backend (its executable-serialization path stalls: a toy 12-matmul jit that
compiles in seconds hung >9.5 min with ``jax_compilation_cache_dir`` set;
re-confirmed round 2). On directly-attached TPU hosts enable the cache via
``JAX_COMPILATION_CACHE_DIR`` and cold start drops to checkpoint-load time.

Usage:
    python serve.py --prompt_file prompts.txt --batch_size 8 [--small]
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python serve.py --selftest       # sharded dry-run on a CPU mesh
"""
from __future__ import annotations

import argparse
import json
import os
import time


def generate_batch(pipe, prompts: list[str], key, mesh=None, *,
                   num_views=8, num_inference_steps=50, guidance_scale=7.5,
                   cfg_rescale=0.7, render_size=512, image_size=256,
                   latent_hw=None, compiled_sample=None, shard_views=False):
    """Run the full pipeline on a batch of prompts, optionally sharded.

    ``compiled_sample``: an AOT-compiled sampler executable (``aot_sampler``)
    — skips trace+compile of the dominant program on warm starts.
    ``shard_views``: LATENCY mode — instead of sharding prompts over the
    mesh (throughput), shard each scene's views over it
    (``sample_view_sharded`` + ``decode_and_render_view_sharded``); right
    for small batches on big meshes (batch 1 on 8 chips)."""
    import jax
    import jax.numpy as jnp

    from prometheus_tpu.parallel import data_sharding

    B = len(prompts)
    text_emb = pipe.encode_text(prompts)
    uncond = jnp.broadcast_to(pipe.encode_text([""]), text_emb.shape)
    k_traj, k_mv = jax.random.split(key)
    dense = pipe.generate_trajectory(k_traj, text_emb, num_steps=100,
                                     image_size=image_size)
    cameras = pipe.sparse_views(dense, num_views)

    hw = latent_hw or pipe.mvldm.model.latent_size
    if shard_views and mesh is not None:
        latents = pipe.mvldm.sample_view_sharded(
            mesh, pipe.mvldm_params, k_mv, cameras, text_emb, uncond,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale, guidance_type="joint",
            cfg_rescale=cfg_rescale, latent_hw=hw)
        _, _, gaussians, imgs, deps, _ = pipe.decode_and_render_view_sharded(
            mesh, latents, cameras, render_size=render_size)
        return {"cameras": cameras, "dense_cameras": dense,
                "latents_pred": latents, "gaussians": gaussians,
                "images_gs_render": imgs, "depths_gs_render": deps}

    if mesh is not None:
        s = data_sharding(mesh)
        text_emb, uncond, cameras = (jax.device_put(x, s)
                                     for x in (text_emb, uncond, cameras))

    if compiled_sample is not None:
        latents = compiled_sample(pipe.mvldm_params, k_mv, cameras,
                                  text_emb, uncond)
    else:
        latents = pipe.mvldm.sample(
            pipe.mvldm_params, k_mv, cameras, text_emb, uncond,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale, guidance_type="joint",
            cfg_rescale=cfg_rescale, latent_hw=hw)
    gaussians = pipe.decode_gaussians(latents, cameras)
    imgs, deps, masks = pipe.render_views_chunked(
        cameras, gaussians, h=render_size, w=render_size,
        backend=pipe._backend())
    return {"cameras": cameras, "dense_cameras": dense,
            "latents_pred": latents, "gaussians": gaussians,
            "images_gs_render": imgs, "depths_gs_render": deps}


def aot_sampler(pipe, path: str, *, batch_size: int, num_views: int,
                num_inference_steps: int, guidance_scale: float = 7.5,
                cfg_rescale: float = 0.7, latent_hw: int | None = None,
                text_len: int = 77):
    """AOT-persist the dominant serving program (the MV-LDM sampling scan).

    Cold start = init + XLA compile; the sampler is the bulk of the compile
    budget (157 s of the round-2 flagship warm-up). This lowers+compiles it
    for the serving shapes and pickles the serialized executable
    (``jax.experimental.serialize_executable``); the next process start
    deserializes and skips trace+compile entirely. Complements (and works
    where) the persistent compilation cache (which stalls on the tunneled
    axon backend — see module docstring) does not.

    Returns a callable ``(params, key, cameras, text_emb, uncond) ->
    latents``. Shapes are baked in: one AOT file per serving configuration.
    """
    import pickle

    import jax
    import jax.numpy as jnp
    from jax.experimental.serialize_executable import (deserialize_and_load,
                                                       serialize)

    # single-device program (the per-chip serving deployment). An AOT
    # executable takes its inputs at the EXACT compiled placement — pin
    # everything to device 0 so the program is 1-shard regardless of how
    # many local devices exist (multi-chip serving uses the live jit path).
    dev0 = jax.devices()[0]
    place = jax.sharding.SingleDeviceSharding(dev0)

    def placed(tree):
        return jax.tree.map(lambda x: jax.device_put(x, place), tree)

    def wrap(compiled):
        def call(params, key, cameras, text_emb, uncond):
            return compiled(*placed((params, key, cameras, text_emb,
                                     uncond)))
        return call

    if os.path.exists(path):
        with open(path, "rb") as fp:
            payload = pickle.load(fp)
        # execution_devices defaults to ALL client devices — pin to device 0
        # (the compiled program is single-device)
        return wrap(deserialize_and_load(
            payload["bytes"], payload["in_tree"], payload["out_tree"],
            execution_devices=[dev0]))

    hw = latent_hw or pipe.mvldm.model.latent_size
    ctx = pipe.mvldm.model.context_dim
    B, N = batch_size, num_views
    dtype = pipe.mvldm.model.dtype
    args = placed((pipe.mvldm_params, jax.random.PRNGKey(0),
                   jnp.zeros((B, N, 18)),
                   jnp.zeros((B, text_len, ctx), dtype),
                   jnp.zeros((B, text_len, ctx), dtype)))
    # .lower must go through the unbound jit (binding via the instance
    # attribute works for __call__ but not for the AOT entry points)
    lowered = type(pipe.mvldm).sample.lower(
        pipe.mvldm, *args, num_inference_steps=num_inference_steps,
        guidance_scale=guidance_scale, guidance_type="joint",
        cfg_rescale=cfg_rescale, latent_hw=hw)
    compiled = lowered.compile()
    ser, in_tree, out_tree = serialize(compiled)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fp:
        pickle.dump({"bytes": ser, "in_tree": in_tree,
                     "out_tree": out_tree}, fp)
    return wrap(compiled)


def serve_http(pipe, port: int, *, export_dir: str, num_views: int,
               num_steps: int, render_size: int, compiled_sample=None,
               mesh=None, host: str = "127.0.0.1", started=None,
               queue_size: int = 16, batch_window_s: float = 0.05,
               max_batch: int | None = None):
    """Stdlib HTTP endpoint over the warm process (no reference analog —
    its inference is offline CLI only).

    - ``GET  /healthz``  -> {"status": "ok", "queued": N}
    - ``POST /generate`` JSON {"prompt": str, "seed"?: int, "num_steps"?,
      "num_views"?, "render_size"?} -> exports splat/ply under
      ``export_dir/<id>`` and returns the paths + wall time.

    Concurrency model: handlers enqueue into a BOUNDED queue (503 when full
    — explicit backpressure instead of unbounded latency) and one dispatcher
    thread owns the chip. Under load it micro-batches: it drains up to
    ``max_batch`` queued requests within ``batch_window_s``, groups them by
    (steps, views, render_size), pads each default-shape group to
    ``max_batch`` prompts, and runs ONE SPMD ``generate_batch`` sharded over
    the mesh's ``data`` axis — a v5e-8 serves 8 prompts per sampler run. A
    lone request on a multi-chip mesh instead shards its VIEWS (latency
    mode). ``max_batch`` defaults to the mesh size; 1 disables batching
    (single-chip behavior unchanged). Off-default shapes recompile and run
    solo: keep hot-path requests on the defaults.

    Determinism: a request's ``seed`` is honored exactly when it runs solo;
    inside a micro-batch the scene key is folded from (batch key, slot), so
    identical batches reproduce but a given seed is not portable across
    load patterns.
    """
    import queue as queue_mod
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import jax

    from prometheus_tpu.utils.platform import device_sync

    n_dev = mesh.shape["data"] if mesh is not None else 1
    if max_batch is None:
        max_batch = n_dev
    max_batch = max(1, max_batch)
    if n_dev > 1 and max_batch % n_dev:
        # padded micro-batches shard over the data axis: keep them divisible
        max_batch += n_dev - max_batch % n_dev
    jobs: "queue_mod.Queue[dict]" = queue_mod.Queue(maxsize=queue_size)
    counter = {"n": 0, "runs": 0}
    counter_lock = threading.Lock()

    def run_group(group: list[dict]):
        """One generate_batch over same-shape jobs; completes their events."""
        steps, views, rsize = group[0]["shape"]
        defaults = (steps, views, rsize) == (num_steps, num_views,
                                             render_size)
        solo = len(group) == 1
        # lone request on a multi-chip mesh: shard its views (latency mode);
        # a full group shards prompts (throughput mode)
        sv = solo and n_dev > 1 and views % n_dev == 0
        prompts = [j["prompt"] for j in group]
        n_real = len(prompts)
        if defaults and not sv and max_batch > 1:
            prompts = prompts + [""] * (max_batch - n_real)  # one jitted shape
        key = jax.random.PRNGKey(group[0]["seed"])
        if not solo:
            key = jax.random.fold_in(key, n_real)
        aot = compiled_sample if (defaults and not sv
                                  and len(prompts) == max_batch == 1) else None
        t0 = time.time()
        out = generate_batch(
            pipe, prompts, key,
            mesh if (sv or len(prompts) > 1) else None,
            num_views=views, num_inference_steps=steps, render_size=rsize,
            image_size=pipe.mvldm.model.image_size,
            latent_hw=pipe.mvldm.model.latent_size,
            compiled_sample=aot, shard_views=sv)
        device_sync(out["images_gs_render"])
        dt = time.time() - t0
        counter["runs"] += 1
        import numpy as np

        from prometheus_tpu.utils import export_gaussians

        g = tuple(np.asarray(x) for x in out["gaussians"])
        for b, job in enumerate(group):
            out_dir = os.path.join(export_dir, f"{job['id']:05d}")
            os.makedirs(out_dir, exist_ok=True)
            base = os.path.join(out_dir, "scene")
            export_gaussians(base, tuple(x[b : b + 1] for x in g))
            job["result"] = {"id": job["id"], "prompt": job["prompt"],
                             "seconds": round(dt, 2),
                             "batched_with": n_real - 1,
                             "paths": {"ply": base + ".ply",
                                       "splat": base + ".splat"}}
            job["done"].set()

    def dispatcher():
        while True:
            job = jobs.get()
            if job is None:
                return
            batch = [job]
            if max_batch > 1:
                deadline = time.time() + batch_window_s
                while len(batch) < max_batch:
                    left = deadline - time.time()
                    if left <= 0:
                        break
                    try:
                        nxt = jobs.get(timeout=left)
                    except queue_mod.Empty:
                        break
                    if nxt is None:
                        jobs.put(None)  # re-post shutdown for the outer loop
                        break
                    batch.append(nxt)
            # group by shape; each group is one compiled program. Only the
            # warmed default shape micro-batches (padded to max_batch, which
            # divides the mesh); off-default requests run solo
            default_shape = (num_steps, num_views, render_size)
            groups: list[list[dict]] = []
            default_group: list[dict] = []
            for j in batch:
                if j["shape"] == default_shape:
                    default_group.append(j)
                else:
                    groups.append([j])
            if default_group:
                groups.insert(0, default_group)
            for group in groups:
                try:
                    run_group(group)
                except Exception as e:  # noqa: BLE001 — report, keep serving
                    for j in group:
                        j["error"] = f"{type(e).__name__}: {e}"
                        j["done"].set()

    worker = threading.Thread(target=dispatcher, daemon=True)
    worker.start()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # route to stdout, not stderr spam
            print(f"[serve] {self.address_string()} {fmt % a}")

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok", "queued": jobs.qsize()})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/generate":
                self._json(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n) or b"{}")
                prompt = req["prompt"]
            except Exception as e:
                self._json(400, {"error": f"bad request: {e}"})
                return
            import threading as _t
            with counter_lock:
                rid = counter["n"]
                counter["n"] += 1
            job = {"id": rid, "prompt": prompt,
                   "seed": int(req.get("seed", 0)),
                   "shape": (int(req.get("num_steps", num_steps)),
                             int(req.get("num_views", num_views)),
                             int(req.get("render_size", render_size))),
                   "done": _t.Event(), "result": None, "error": None}
            try:
                jobs.put_nowait(job)
            except queue_mod.Full:
                self._json(503, {"error": "queue full", "queued": queue_size})
                return
            job["done"].wait()
            if job["error"] is not None:
                self._json(500, {"error": job["error"]})
            else:
                self._json(200, job["result"])

    srv = ThreadingHTTPServer((host, port), Handler)
    srv._dispatch_stats = counter  # introspection for tests
    print(f"[serve] HTTP listening on {host}:{srv.server_address[1]} "
          f"(POST /generate; queue {queue_size}, max_batch {max_batch}, "
          f"window {batch_window_s*1000:.0f} ms)")
    if started is not None:
        started(srv)          # hand the bound server to tests
    try:
        srv.serve_forever()
    finally:
        jobs.put(None)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--prompt_file", default=None)
    ap.add_argument("--prompt", default=None)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--num_steps", type=int, default=50)
    ap.add_argument("--num_views", type=int, default=8)
    ap.add_argument("--render_size", type=int, default=512)
    ap.add_argument("--export_dir", default=None)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--selftest", action="store_true",
                    help="tiny sharded batch on the local mesh, then exit")
    ap.add_argument("--shard_views", action="store_true",
                    help="LATENCY mode: shard each scene's views over the "
                         "mesh instead of sharding the prompt batch")
    ap.add_argument("--ckpt", default=None,
                    help="orbax bundle dir / torch full.ckpt; random init "
                         "if absent (same loader as inference.py)")
    ap.add_argument("--bpe_vocab", default=None,
                    help="CLIP BPE merges file (exact tokenization)")
    ap.add_argument("--http", type=int, default=None, metavar="PORT",
                    help="serve an HTTP JSON API (POST /generate) instead "
                         "of the batch loop; warm-up + AOT apply first")
    ap.add_argument("--queue_size", type=int, default=16,
                    help="bounded request queue; overflow returns 503")
    ap.add_argument("--batch_window_ms", type=float, default=50.0,
                    help="micro-batching window: wait this long to fill a "
                         "prompt batch before dispatching")
    ap.add_argument("--max_batch", type=int, default=None,
                    help="max prompts per dispatched batch (default: mesh "
                         "size; 1 disables micro-batching)")
    ap.add_argument("--aot_dir", default=None,
                    help="AOT-persist/reuse the compiled sampler here "
                         "(serialize_executable; shape-specific)")
    ap.add_argument("--compilation_cache", default=None,
                    help="enable the JAX persistent compilation cache at "
                         "this dir (do NOT use on the tunneled axon "
                         "backend — its serialization path stalls)")
    args = ap.parse_args()

    import jax

    from prometheus_tpu.utils.platform import device_sync, honor_jax_platforms_env
    honor_jax_platforms_env()
    if args.compilation_cache:
        jax.config.update("jax_compilation_cache_dir", args.compilation_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import build_flagship
    from prometheus_tpu.parallel import make_mesh

    mesh = make_mesh()
    n_dev = mesh.shape["data"]
    print(f"[serve] mesh: {n_dev} device(s)")

    if args.selftest:
        pipe, _ = build_flagship(small=True)
        prompts = [f"selftest scene {i}" for i in range(n_dev)]
        t0 = time.time()
        out = generate_batch(pipe, prompts, jax.random.PRNGKey(0), mesh,
                             num_views=4, num_inference_steps=2,
                             render_size=64, image_size=pipe.mvldm.model.image_size,
                             latent_hw=pipe.mvldm.model.latent_size)
        device_sync(out["images_gs_render"])
        assert out["images_gs_render"].shape[0] == n_dev
        print(f"[serve] selftest OK: {n_dev} prompts sharded over {n_dev} "
              f"devices in {time.time()-t0:.1f}s")
        t0 = time.time()
        out = generate_batch(pipe, prompts[:1], jax.random.PRNGKey(0), mesh,
                             num_views=2 * n_dev, num_inference_steps=2,
                             render_size=64,
                             image_size=pipe.mvldm.model.image_size,
                             latent_hw=pipe.mvldm.model.latent_size,
                             shard_views=True)
        device_sync(out["images_gs_render"])
        assert out["images_gs_render"].shape[:2] == (1, 2 * n_dev)
        print(f"[serve] selftest OK: 1 prompt, {2 * n_dev} views sharded "
              f"over {n_dev} devices in {time.time()-t0:.1f}s")
        return

    prompts = []
    if args.prompt:
        prompts = [args.prompt] * args.batch_size
    elif args.prompt_file:
        with open(args.prompt_file) as fp:
            prompts = [l.strip() for l in fp if l.strip()]
    if not prompts and args.http is None:
        raise SystemExit("provide --prompt or --prompt_file (or --http)")

    if args.http is not None:
        args.batch_size = 1          # HTTP serves one scene per request

    from inference import build_pipeline
    pipe = build_pipeline(args)      # --ckpt restore or random init
    key = jax.random.PRNGKey(0)
    sv = bool(args.shard_views) and n_dev > 1
    if args.shard_views and n_dev > 1 and args.num_views % n_dev:
        raise SystemExit(f"--shard_views needs num_views ({args.num_views}) "
                         f"divisible by the mesh size ({n_dev})")
    if sv:
        args.batch_size = 1          # latency mode: one scene at a time
    bs = min(args.batch_size, len(prompts)) if prompts else args.batch_size
    compiled_sample = None
    if args.aot_dir and n_dev > 1:
        print("[serve] --aot_dir is single-device (per-chip serving); "
              f"mesh has {n_dev} devices -> using the live jit path")
        args.aot_dir = None
    if args.aot_dir:
        t0 = time.time()
        aot_path = os.path.join(
            args.aot_dir,
            f"sampler_b{bs}_v{args.num_views}_s{args.num_steps}.aot")
        hit = os.path.exists(aot_path)
        compiled_sample = aot_sampler(
            pipe, aot_path, batch_size=bs, num_views=args.num_views,
            num_inference_steps=args.num_steps)
        print(f"[serve] AOT sampler {'loaded' if hit else 'compiled+saved'} "
              f"in {time.time()-t0:.1f}s ({aot_path})")
    if args.http is not None:
        # pay init + compile before accepting traffic, through the exact
        # routings the dispatcher will use: a lone request view-shards over
        # a multi-chip mesh; a micro-batch shards max_batch prompts
        max_batch = args.max_batch if args.max_batch is not None else n_dev
        max_batch = max(1, max_batch)
        sv = n_dev > 1 and args.num_views % n_dev == 0
        t0 = time.time()
        out = generate_batch(pipe, ["warm-up"], key, mesh if sv else None,
                             num_views=args.num_views,
                             num_inference_steps=args.num_steps,
                             render_size=args.render_size,
                             image_size=pipe.mvldm.model.image_size,
                             latent_hw=pipe.mvldm.model.latent_size,
                             compiled_sample=compiled_sample, shard_views=sv)
        device_sync(out["images_gs_render"])
        if max_batch > 1:
            out = generate_batch(pipe, ["warm-up"] * max_batch, key, mesh,
                                 num_views=args.num_views,
                                 num_inference_steps=args.num_steps,
                                 render_size=args.render_size,
                                 image_size=pipe.mvldm.model.image_size,
                                 latent_hw=pipe.mvldm.model.latent_size)
            device_sync(out["images_gs_render"])
        print(f"[serve] warm in {time.time()-t0:.1f}s")
        serve_http(pipe, args.http,
                   export_dir=args.export_dir or "serve_out",
                   num_views=args.num_views, num_steps=args.num_steps,
                   render_size=args.render_size,
                   compiled_sample=compiled_sample, mesh=mesh,
                   queue_size=args.queue_size,
                   batch_window_s=args.batch_window_ms / 1000.0,
                   max_batch=args.max_batch)
        return

    # warm-up on the first batch size (view-sharded in latency mode)
    t0 = time.time()
    out = generate_batch(pipe, prompts[:bs], key, mesh,
                         num_views=args.num_views,
                         num_inference_steps=args.num_steps,
                         render_size=args.render_size,
                         image_size=pipe.mvldm.model.image_size,
                         compiled_sample=compiled_sample, shard_views=sv)
    device_sync(out["images_gs_render"])
    warm = time.time() - t0

    done = 0
    t0 = time.time()
    for i in range(0, len(prompts), bs):
        chunk = prompts[i : i + bs]
        n_real = len(chunk)              # padding below is NOT a scene
        if len(chunk) < bs:
            chunk = chunk + [""] * (bs - len(chunk))
        out = generate_batch(pipe, chunk, jax.random.PRNGKey(i), mesh,
                             num_views=args.num_views,
                             num_inference_steps=args.num_steps,
                             render_size=args.render_size,
                             image_size=pipe.mvldm.model.image_size,
                             compiled_sample=compiled_sample, shard_views=sv)
        device_sync(out["images_gs_render"])
        done += n_real
        if args.export_dir:
            import numpy as np

            from prometheus_tpu.utils import export_gaussians

            os.makedirs(args.export_dir, exist_ok=True)
            g = tuple(np.asarray(x) for x in out["gaussians"])
            for b in range(n_real):
                gb = tuple(x[b : b + 1] for x in g)
                export_gaussians(
                    os.path.join(args.export_dir, f"{i + b:04d}"), gb)
    dt = time.time() - t0
    print(json.dumps({
        "scenes": done, "seconds": round(dt, 2),
        "scenes_per_min_per_chip": round(done / dt * 60 / max(n_dev, 1), 2),
        "warmup_s": round(warm, 1),
    }))


if __name__ == "__main__":
    main()
