"""Per-stage rasterizer profile at production density (512^2, 524k splats).

Times each pipeline stage of the tiled/Pallas render as its own jitted
program — project, binning expansion (both slot-decode variants, the
PROMETHEUS_BIN_DECODE A/B in ops/gaussian/tiled.py), fused-key sort,
segment+gather, Pallas compositing kernel — plus both end-to-end backends.
This is the measurement VERDICT r3 #4 asks for: the r2 trace said the
render is binning-bound (expand ~16 ms > kernel ~9 ms per view), so the
win is in the expand/sort stages, and the decode variants stress different
TPU slow paths (scatter+scan vs searchsorted gathers).

Tunnel-aware timing: per-call sync overhead over the tunneled axon backend
is ~25 ms — comparable to a whole stage — so each stage is dispatched
``reps`` times pipelined and synced ONCE at the end (single-core TPU
execution serializes the reps; CLAUDE.md "Environment gotchas").

    python tools/raster_profile.py [--n 524288] [--size 512] [--reps 20]
        [--out raster_profile.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(out):
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf.ravel()[0:1])


_T0 = time.time()


def _progress(msg: str):
    print(f"[profile +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def time_stage(fn, args, reps, warmup=2, label=""):
    """Median-of-3 of (reps pipelined dispatches + one sync) / reps."""
    vals = []
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        _sync(out)
        vals.append((time.time() - t0) / reps)
    vals.sort()
    if label:
        _progress(f"{label}: {vals[1] * 1e3:.2f} ms")
    return vals[1]


def main():
    from prometheus_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()  # the axon plugin ignores the env var

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=524288)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--tile_size", type=int, default=16)
    ap.add_argument("--capacity", type=int, default=1024)
    ap.add_argument("--out", default="raster_profile.json")
    ap.add_argument("--fast", action="store_true",
                    help="skip the known-slow bsearch variants (saves two "
                         "tunnel compiles when iterating on the winner)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from prometheus_tpu.ops.gaussian import tiled
    from prometheus_tpu.ops.gaussian.pallas_kernel import (
        composite_tiled_pallas, gather_rows, run_compositor_kernel)
    from prometheus_tpu.ops.gaussian.projection import project_gaussians
    from prometheus_tpu.ops.gaussian.quality import (_camera_setup,
                                                     make_trained_stats_scene)
    from prometheus_tpu.utils import get_random_cameras

    h = w = args.size
    ts = args.tile_size
    grid_h, grid_w = h // ts, w // ts
    n_tiles = grid_h * grid_w
    max_tiles = (32, 32)

    # Pallas stages need a real TPU; on CPU (smoke runs) use interpret mode
    interpret = jax.devices()[0].platform != "tpu"

    cams = get_random_cameras(jax.random.PRNGKey(0), 1, size=h)
    scene = make_trained_stats_scene(jax.random.PRNGKey(5), cams,
                                     n_gaussians=args.n)
    xyz, features, opacity, scales, rotations = (a[0] for a in scene)
    colors, opac = features[:, 0, :], opacity[..., 0]
    w2c, fx, fy, cx, cy = _camera_setup(cams[0], h, w)
    s_max = tiled.default_instance_budget(args.n)

    timings = {}

    # --- stage: projection ---
    proj_fn = jax.jit(lambda: project_gaussians(
        xyz, scales, rotations, w2c, fx, fy, cx, cy, h, w, opacities=opac))
    timings["project_ms"] = time_stage(
        proj_fn, (), args.reps, label="project_ms") * 1e3
    proj = jax.block_until_ready(proj_fn())

    # --- stage: binning expansion, all slot decodes ---
    # PROMETHEUS_BIN_DECODE is read at TRACE time, so each variant needs its
    # own traced program; jitting through a distinct wrapper per mode keeps
    # the cache entries separate.
    expand = {}
    # fscatter lost the r5 A/B by >10x (a 14M-row scatter runs ~65 ns/row
    # on this chip) — kept only in the slow sweep for the record
    modes = ("scanu",) if args.fast \
        else ("scanu", "fscatter", "addcumsum", "scan", "bsearch")
    for mode in modes:
        os.environ["PROMETHEUS_BIN_DECODE"] = mode

        def _expand(p, o, _mode=mode):   # _mode: distinct trace per variant
            return tiled._tile_instances(p, ts, grid_w, grid_h, max_tiles,
                                         s_max, opacities=o)

        fn = jax.jit(_expand)
        timings[f"expand_{mode}_ms"] = time_stage(
        fn, (proj, opac), args.reps, label=f"expand_{mode}_ms") * 1e3
        expand[mode] = jax.block_until_ready(fn(proj, opac))
    os.environ.pop("PROMETHEUS_BIN_DECODE", None)
    tile_id, depth_key, gauss_idx = expand[modes[0]]

    # --- expand sub-stages (where do the ms go inside _tile_instances?) ---
    # Isolated jits lose cross-stage fusion, so these are indicative, not
    # additive-to-the-total; they answer "scatter+scan vs gather+cull".
    from prometheus_tpu.ops.gaussian.tiled import _clamped_windows
    import jax.numpy as _jnp

    def _prefix(p, o):
        ex0, ey0, wx, wy = _clamped_windows(p, ts, grid_w, grid_h, max_tiles)
        cover = _jnp.where(p.valid, wx * wy, 0).astype(_jnp.int32)
        op = jax.lax.stop_gradient(o).astype(_jnp.float32)
        _, order = jax.lax.sort((-_jnp.where(_jnp.isfinite(op), op, 0.0),
                                 _jnp.arange(p.mean2d.shape[0],
                                             dtype=_jnp.int32)),
                                num_keys=1)
        cover_o = cover[order]
        ends = _jnp.cumsum(cover_o.astype(_jnp.float32))
        return ends - cover_o.astype(_jnp.float32), cover_o, order

    pre_fn = jax.jit(_prefix)
    timings["sub_prefix_ms"] = time_stage(pre_fn, (proj, opac),
                                          args.reps) * 1e3
    starts, cover_o, order = jax.block_until_ready(pre_fn(proj, opac))
    n = int(proj.mean2d.shape[0])

    def _decode_scanu(st, cov):
        pos = _jnp.arange(n, dtype=_jnp.int32)
        alive = (cov > 0) & (st < s_max)
        st_i = _jnp.where(alive, st, _jnp.float32(s_max)).astype(_jnp.int32)
        marks = _jnp.zeros((s_max,), _jnp.int32).at[
            _jnp.where(alive, st_i, s_max + pos)
        ].max(pos, mode="drop", unique_indices=True)
        return jax.lax.associative_scan(_jnp.maximum, marks)

    def _decode_scan(st, cov):
        pos = _jnp.arange(n, dtype=_jnp.int32)
        alive = (cov > 0) & (st < s_max)
        st_i = _jnp.where(alive, st, _jnp.float32(s_max)).astype(_jnp.int32)
        marks = _jnp.zeros((s_max,), _jnp.int32).at[
            _jnp.where(alive, st_i, s_max)].max(pos, mode="drop")
        return jax.lax.associative_scan(_jnp.maximum, marks)

    dec_u = jax.jit(_decode_scanu)
    timings["sub_decode_scanu_ms"] = time_stage(
        dec_u, (starts, cover_o), args.reps, label="sub_decode_scanu_ms") * 1e3
    if not args.fast:
        dec_c = jax.jit(_decode_scan)
        timings["sub_decode_scan_ms"] = time_stage(
        dec_c, (starts, cover_o), args.reps, label="sub_decode_scan_ms") * 1e3
    p_of_slot = jax.block_until_ready(dec_u(starts, cover_o))

    def _gather_cull(p, o, st, ordr, pslot):
        ex0, ey0, wx, wy = _clamped_windows(p, ts, grid_w, grid_h, max_tiles)
        cols = [st.astype(_jnp.float32),
                ex0[ordr].astype(_jnp.float32),
                ey0[ordr].astype(_jnp.float32),
                _jnp.maximum(wx[ordr], 1).astype(_jnp.float32),
                _jnp.where(_jnp.isfinite(p.depth[ordr]), p.depth[ordr], 0.0),
                ordr.astype(_jnp.float32)]
        mean_o = jax.lax.stop_gradient(p.mean2d)[ordr]
        conic_o = jax.lax.stop_gradient(p.conic)[ordr]
        op_o = jax.lax.stop_gradient(o)[ordr].astype(_jnp.float32)
        from prometheus_tpu.ops.gaussian.naive import ALPHA_CUTOFF
        q_cut = _jnp.log(_jnp.maximum(op_o, 1e-12) / ALPHA_CUTOFF)
        cols += [mean_o[:, 0], mean_o[:, 1], conic_o[:, 0], conic_o[:, 1],
                 conic_o[:, 2], q_cut]
        deco = _jnp.stack(cols, axis=1)
        rows = deco[pslot]
        j = _jnp.arange(s_max, dtype=_jnp.int32)
        l = j - rows[:, 0].astype(_jnp.int32)
        w_i = rows[:, 3].astype(_jnp.int32)
        ty = rows[:, 2].astype(_jnp.int32) + l // w_i
        tx = rows[:, 1].astype(_jnp.int32) + l % w_i
        ts_f = _jnp.float32(ts)
        x0 = tx.astype(_jnp.float32) * ts_f
        y0 = ty.astype(_jnp.float32) * ts_f
        min_sig = tiled._rect_min_sigma(rows[:, 6], rows[:, 7], rows[:, 8],
                                        rows[:, 9], rows[:, 10],
                                        x0, y0, x0 + ts_f, y0 + ts_f)
        ok = min_sig <= rows[:, 11]
        return _jnp.where(ok, ty * grid_w + tx, grid_w * grid_h)

    gc_fn = jax.jit(_gather_cull)
    timings["sub_gather_cull_ms"] = time_stage(
        gc_fn, (proj, opac, starts, order, p_of_slot), args.reps, label="sub_gather_cull_ms") * 1e3

    # --- stage: combined expand+sort per strategy (the csort mode has no
    # separate expand: the sort IS the compaction) ---
    binsort_modes = ("scanu", "csort") if args.fast \
        else ("scanu", "fscatter", "csort")
    for mode in binsort_modes:
        os.environ["PROMETHEUS_BIN_DECODE"] = mode

        def _binsort(p, o, _mode=mode):
            return tiled.sorted_instances(p, ts, grid_w, grid_h, max_tiles,
                                          s_max, opacities=o)

        fn = jax.jit(_binsort)
        timings[f"binsort_{mode}_ms"] = time_stage(
        fn, (proj, opac), args.reps, label=f"binsort_{mode}_ms") * 1e3
    os.environ.pop("PROMETHEUS_BIN_DECODE", None)

    # --- stage: fused-key sort ---
    sort_fn = jax.jit(
        lambda t, d, g: tiled.sort_tile_instances(t, d, g, n_tiles))
    timings["sort_ms"] = time_stage(
        sort_fn, (tile_id, depth_key, gauss_idx), args.reps, label="sort_ms") * 1e3
    sorted_tile, sorted_gauss = jax.block_until_ready(
        sort_fn(tile_id, depth_key, gauss_idx))

    # --- stage: per-tile segments + worklist gather ---
    def _seg_gather(st, sg, p):
        r = jnp.arange(n_tiles, dtype=jnp.int32)
        starts = jnp.searchsorted(st, r).astype(jnp.int32)
        ends = jnp.searchsorted(st, r, side="right")
        counts = jnp.minimum(ends - starts, args.capacity).astype(jnp.int32)
        offs = jnp.arange(args.capacity, dtype=jnp.int32)
        in_seg = offs[None, :] < counts[:, None]
        sg_pad = jnp.concatenate(
            [sg, jnp.zeros((args.capacity,), sg.dtype)])
        g = jax.vmap(lambda s: jax.lax.dynamic_slice(
            sg_pad, (s,), (args.capacity,)))(starts)
        return gather_rows(p, colors, opac, g, in_seg), counts

    seg_fn = jax.jit(_seg_gather)
    timings["segments_gather_ms"] = time_stage(
        seg_fn, (sorted_tile, sorted_gauss, proj), args.reps, label="segments_gather_ms") * 1e3
    data, counts = jax.block_until_ready(
        seg_fn(sorted_tile, sorted_gauss, proj))

    # --- stage: Pallas compositing kernel ---
    kern_fn = jax.jit(lambda d, c: run_compositor_kernel(
        d, c, h, w, tile_size=ts, capacity=args.capacity,
        interpret=interpret))
    timings["kernel_ms"] = time_stage(
        kern_fn, (data, counts), args.reps, label="kernel_ms") * 1e3

    # --- end-to-end: pallas backend per binning strategy, XLA backend on
    # the default ---
    for mode in binsort_modes:
        os.environ["PROMETHEUS_BIN_DECODE"] = mode
        # composite_tiled_pallas is itself jitted and reads the env at ITS
        # trace — that inner-jit cache is shared across our outer wrappers,
        # so clear it per mode (the first r5 profile silently measured
        # scanu three times without this)
        composite_tiled_pallas.clear_cache()

        def _e2e(p, o, _mode=mode):
            return composite_tiled_pallas(
                p, colors, o, h, w, tile_size=ts, capacity=args.capacity,
                max_tiles=max_tiles, s_max=s_max, interpret=interpret)

        suffix = "" if mode == "scanu" else f"_{mode}"
        timings[f"e2e_pallas{suffix}_ms"] = time_stage(
        jax.jit(_e2e), (proj, opac), args.reps, label=f"e2e_pallas{suffix}_ms") * 1e3
    os.environ.pop("PROMETHEUS_BIN_DECODE", None)
    e2e_xla = jax.jit(lambda p, o: tiled.composite_tiled(
        p, colors, o, h, w, tile_size=ts, tile_capacity=args.capacity,
        max_tiles_y=max_tiles[0], max_tiles_x=max_tiles[1], s_max=s_max))
    timings["e2e_xla_ms"] = time_stage(
        e2e_xla, (proj, opac), args.reps, label="e2e_xla_ms") * 1e3

    dev = jax.devices()[0].platform
    result = {
        "platform": dev, "n_gaussians": args.n, "size": args.size,
        "s_max": int(s_max), "capacity": args.capacity, "reps": args.reps,
        "timings_ms": {k: round(v, 3) for k, v in timings.items()},
        "fps_pallas": round(1e3 / timings["e2e_pallas_ms"], 1),
        "decode_winner": min(
            binsort_modes, key=lambda m: timings[f"binsort_{m}_ms"]),
        "fps_best": round(1e3 / min(
            timings[k] for k in timings if k.startswith("e2e_pallas")), 1),
    }
    with open(args.out, "w") as fp:
        json.dump(result, fp, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
