"""Export an interactive HTML viewer for a generated 3DGS scene.

The viser-workflow analog (``/root/reference/vis/check_viser.py:1``) with a
TPU-pod-friendly deployment: one standalone HTML file (WebGL2 splat
renderer, scene embedded) you can scp/serve/share — no python process, no
viser, no network deps.

    python tools/view_scene.py scene.splat [--out viewer.html]
    python tools/view_scene.py scene.ply   [--max_splats 300000]
    python tools/view_scene.py scene.splat --fetch   # reference, don't embed

``inference.py``/``eval.py`` exports produce ``scene.splat`` next to the
``.ply``; point this tool at either.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("scene", help=".splat or .ply file")
    ap.add_argument("--out", default=None,
                    help="output html (default: <scene>.viewer.html)")
    ap.add_argument("--max_splats", type=int, default=500_000,
                    help="embed at most this many (importance-ordered) splats")
    ap.add_argument("--title", default=None)
    ap.add_argument("--fetch", action="store_true",
                    help="reference the .splat by relative URL instead of "
                         "embedding (smaller html; needs an http server)")
    args = ap.parse_args()

    from prometheus_tpu.utils.viewer_html import export_viewer_html

    scene = args.scene
    out = args.out or os.path.splitext(scene)[0] + ".viewer.html"
    title = args.title or os.path.basename(scene)

    if scene.endswith(".ply"):
        from prometheus_tpu.utils.gs_io import load_ply
        from prometheus_tpu.utils.viewer_html import gaussians_to_splat_bytes

        data = gaussians_to_splat_bytes(load_ply(scene))
        path = export_viewer_html(out, data, title=title,
                                  max_splats=args.max_splats)
    elif args.fetch:
        rel = os.path.relpath(scene, os.path.dirname(out) or ".")
        path = export_viewer_html(out, None, title=title, fetch_url=rel)
    else:
        path = export_viewer_html(out, scene, title=title,
                                  max_splats=args.max_splats)
    size = os.path.getsize(path)
    print(f"wrote {path} ({size / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
