#!/usr/bin/env python
"""Offline op-level breakdown of a jax.profiler xplane trace.

The tunneled dev host has no TensorBoard UI (and the installed
tensorboard_plugin_profile converter is ABI-broken against this
tensorflow), so this parses the raw ``*.xplane.pb`` capture (from
``prometheus_tpu.profiling.trace`` / ``BENCH_PROFILE``) directly with the
XSpace proto and prints per-plane top ops by summed duration. Reference
analog: the torch profiler tables the reference prints per training epoch.

Run with PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python (the _pb2 modules
in this image predate the installed C++ protobuf).

Usage:  python tools/parse_trace.py /tmp/trace_dir [--top 30]
"""
from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def find_xplanes(trace_dir: str):
    hits = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                            recursive=True))
    if not hits:
        raise FileNotFoundError(f"no *.xplane.pb under {trace_dir}")
    return hits


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--plane", default="",
                    help="substring filter on plane name (e.g. TPU)")
    ap.add_argument("--line", default="",
                    help="substring filter on line name (e.g. XLA Ops)")
    args = ap.parse_args()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    for path in find_xplanes(args.trace_dir):
        print(f"[trace] {path}", file=sys.stderr)
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if args.plane and args.plane.lower() not in plane.name.lower():
                continue
            meta = {m.id: m.name for m, m in
                    ((v, v) for v in plane.event_metadata.values())}
            for line in plane.lines:
                if args.line and args.line.lower() not in line.name.lower():
                    continue
                agg = defaultdict(lambda: [0.0, 0])   # name -> [ps, count]
                span = 0
                for ev in line.events:
                    name = meta.get(ev.metadata_id, str(ev.metadata_id))
                    agg[name][0] += ev.duration_ps
                    agg[name][1] += 1
                    span = max(span, ev.offset_ps + ev.duration_ps)
                if not agg:
                    continue
                total = sum(v[0] for v in agg.values())
                print(f"\n== plane '{plane.name}' line '{line.name}' "
                      f"events={sum(v[1] for v in agg.values())} "
                      f"busy={total/1e9:.3f}ms span={span/1e9:.3f}ms ==")
                rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
                print(f"{'ms':>10} {'%busy':>6} {'count':>6}  op")
                for name, (ps, cnt) in rows[: args.top]:
                    print(f"{ps/1e9:10.3f} {100*ps/total:6.2f} {cnt:6d}  "
                          f"{name[:100]}")


if __name__ == "__main__":
    main()
