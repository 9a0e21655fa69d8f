#!/usr/bin/env python
"""DL3DV-10K download / unzip tooling (dependency-free).

Parity target: ``/root/reference/tools/dl3dv10k/download.py`` (HF batch/hash
layout, per-subset lists, unzip-after-download) and ``unzip_dl3dv.py``.
Differences: plain ``urllib`` against a URL template instead of the
huggingface_hub client (no extra deps; works with ``file://`` mirrors and
proxies), csv parsed with the stdlib.

Usage:
    # download the 1K batch of images+poses at 960P into data/dl3dv
    python tools/download_dl3dv.py download --meta DL3DV-valid.csv \
        --subset 1K --reso 960P --file_type images+poses --out data/dl3dv

    # a single scene by hash
    python tools/download_dl3dv.py download --meta DL3DV-valid.csv \
        --hash <hash> --reso 480P --out data/dl3dv

    # unzip a directory of scene zips (reference unzip_dl3dv.py)
    python tools/download_dl3dv.py unzip --src data/zips --out data/dl3dv

After download + unzip, build annotations with
``tools/build_metadata.py dl3dv-raw`` and teacher depths with
``tools/generate_depths.py``.

NOTE: this build environment has zero network egress — the download command
is exercised against ``file://`` fixtures in tests and documented for real
hosts.
"""
from __future__ import annotations

import argparse
import csv
import os
import sys
import time
import urllib.request
import zipfile

RESOLUTION2REPO = {
    "480P": "DL3DV/DL3DV-ALL-480P",
    "960P": "DL3DV/DL3DV-ALL-960P",
    "2K": "DL3DV/DL3DV-ALL-2K",
    "4K": "DL3DV/DL3DV-ALL-4K",
}
DEFAULT_URL_TEMPLATE = \
    "https://huggingface.co/datasets/{repo}/resolve/main/{rel_path}"


def build_download_list(meta_csv: str, subset: str, hash_name: str,
                        reso: str, file_type: str) -> list[dict]:
    """Mirror of the reference's get_download_list (download.py:116-171)."""
    def item(hash_name, batch):
        if file_type == "images+poses":
            return {"repo": RESOLUTION2REPO[reso],
                    "rel_path": f"{batch}/{hash_name}.zip"}
        if file_type == "video":
            return {"repo": "DL3DV/DL3DV-ALL-video",
                    "rel_path": f"{batch}/{hash_name}/video.mp4"}
        if file_type == "colmap_cache":
            return {"repo": "DL3DV/DL3DV-ALL-ColmapCache",
                    "rel_path": f"{batch}/{hash_name}.zip"}
        raise ValueError(file_type)

    rows = list(csv.DictReader(open(meta_csv)))
    if hash_name:
        match = [r for r in rows if r["hash"] == hash_name]
        if not match:
            raise SystemExit(f"hash {hash_name} not in {meta_csv}")
        return [item(hash_name, match[0]["batch"])]
    return [item(r["hash"], r["batch"]) for r in rows
            if r["batch"] == subset]


def download(items: list[dict], out_dir: str, url_template: str,
             max_retries: int = 5) -> int:
    ok = 0
    for it in items:
        rel = it["rel_path"]
        dst = os.path.join(out_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        url = url_template.format(repo=it["repo"], rel_path=rel)
        succ = False
        for attempt in range(max_retries):
            try:
                urllib.request.urlretrieve(url, dst)
                succ = True
                break
            except Exception as e:  # noqa: BLE001 - retry loop
                print(f"[dl3dv] retry {attempt + 1}/{max_retries} "
                      f"{rel}: {e}")
                time.sleep(min(2 ** attempt, 30))
        if not succ:
            print(f"[dl3dv] FAILED {rel}")
            continue
        ok += 1
        if rel.endswith(".zip"):
            with zipfile.ZipFile(dst) as zf:
                zf.extractall(os.path.join(out_dir, os.path.dirname(rel)))
            os.remove(dst)
    print(f"[dl3dv] {ok}/{len(items)} downloaded")
    return ok


def unzip_dir(src: str, out: str):
    """Unzip every scene zip under ``src`` (reference unzip_dl3dv.py)."""
    os.makedirs(out, exist_ok=True)
    n = 0
    for base, _dirs, files in os.walk(src):
        for f in sorted(files):
            if not f.endswith(".zip"):
                continue
            path = os.path.join(base, f)
            try:
                with zipfile.ZipFile(path) as zf:
                    zf.extractall(out)
                n += 1
            except zipfile.BadZipFile:
                print(f"[dl3dv] skip bad zip {path}")
    print(f"[dl3dv] unzipped {n} archives -> {out}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("download")
    d.add_argument("--meta", required=True, help="DL3DV-valid.csv")
    d.add_argument("--subset", default="1K", help="batch name, e.g. 1K/2K")
    d.add_argument("--hash", default="", help="single scene hash")
    d.add_argument("--reso", default="960P", choices=list(RESOLUTION2REPO))
    d.add_argument("--file_type", default="images+poses",
                   choices=["images+poses", "video", "colmap_cache"])
    d.add_argument("--out", required=True)
    d.add_argument("--url_template", default=DEFAULT_URL_TEMPLATE,
                   help="supports file:// mirrors for offline use")
    u = sub.add_parser("unzip")
    u.add_argument("--src", required=True)
    u.add_argument("--out", required=True)
    args = ap.parse_args()
    if args.cmd == "download":
        items = build_download_list(args.meta, args.subset, args.hash,
                                    args.reso, args.file_type)
        sys.exit(0 if download(items, args.out, args.url_template) ==
                 len(items) else 1)
    unzip_dir(args.src, args.out)


if __name__ == "__main__":
    main()
