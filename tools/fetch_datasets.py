#!/usr/bin/env python
"""Dataset acquisition: SA-1B captions, JourneyDB, MVImgNet, RealEstate10K.

Parity targets: ``/root/reference/tools/sa1b/get_hfdatset.py`` (HF caption
tarball fetch), ``tools/journeydb/`` + ``tools/mvimagenet/copy_mvimgnet.py``
(archive staging), ``tools/rel10k/load_rel10k.py`` (.torch chunk staging),
``tools/download_hf_model.py``. Differences: one dependency-free CLI over a
URL template (plain ``urllib``; works with ``file://`` mirrors, HF resolve
URLs, and proxies), manifest-driven so the exact file list is explicit and
resumable (existing files are skipped), with optional archive extraction.

Usage:
    # SA-1B LLaVA captions (the reference's PixArt-alpha caption dump)
    python tools/fetch_datasets.py sa1b-captions --out data/sa1b

    # JourneyDB / MVImgNet / RE10K from an explicit manifest (one relative
    # path per line; '#' comments), any mirror
    python tools/fetch_datasets.py fetch --manifest journeydb_files.txt \
        --url_template "https://my-mirror/{rel_path}" --out data/journeydb

    # after download:  tools/build_metadata.py journeydb-csv / mvimgnet /
    # re10k-index;  captions/depths via tools/generate_captions.py /
    # tools/generate_depths.py

NOTE: this build environment has zero network egress — fetching is
exercised against ``file://`` fixtures in tests and documented for real
hosts. An HF auth token is honored via the HF_TOKEN env var.
"""
from __future__ import annotations

import argparse
import os
import sys
import tarfile
import time
import urllib.request
import zipfile

HF_URL = "https://huggingface.co/datasets/{repo}/resolve/main/{rel_path}"

# the reference's known acquisition points (sa1b/get_hfdatset.py:14,
# rel10k_dataset.py docstrings); kept as data so mirrors are one flag away
PRESETS = {
    "sa1b-captions": {
        "repo": "PixArt-alpha/SAM-LLaVA-Captions10M",
        "files": ["SA1B_caption.tar.gz"],
    },
    "re10k-pixelsplat": {
        # the community .torch-chunk repack both the reference and this
        # repo's RealEstate10K dataset consume
        "repo": "dylanebert/re10k",
        "files": ["re10k/train/index.json", "re10k/test/index.json"],
    },
}


def _fetch_one(url: str, dst: str, retries: int = 5) -> bool:
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    req = urllib.request.Request(url)
    tok = os.environ.get("HF_TOKEN")
    if tok and not url.startswith("file:"):
        req.add_header("Authorization", f"Bearer {tok}")
    for attempt in range(retries):
        try:
            tmp = dst + ".part"
            with urllib.request.urlopen(req) as r, open(tmp, "wb") as fp:
                while chunk := r.read(1 << 20):
                    fp.write(chunk)
            os.replace(tmp, dst)
            return True
        except Exception as e:  # noqa: BLE001 - retry loop
            print(f"[fetch] retry {attempt + 1}/{retries} {url}: {e}")
            time.sleep(min(2 ** attempt, 30))
    return False


def _extract(path: str, out_dir: str) -> bool:
    if path.endswith((".tar.gz", ".tgz", ".tar")):
        with tarfile.open(path) as tf:
            tf.extractall(out_dir, filter="data")
        return True
    if path.endswith(".zip"):
        with zipfile.ZipFile(path) as zf:
            zf.extractall(out_dir)
        return True
    return False


def fetch(rel_paths: list[str], out: str, url_template: str,
          extract: bool = False, keep_archives: bool = True) -> int:
    done = 0
    for rel in rel_paths:
        dst = os.path.join(out, rel)
        if os.path.exists(dst):
            print(f"[fetch] exists, skip {rel}")
            done += 1
            continue
        url = url_template.format(rel_path=rel)
        if not _fetch_one(url, dst):
            print(f"[fetch] FAILED {rel}")
            continue
        done += 1
        if extract and _extract(dst, os.path.dirname(dst)):
            print(f"[fetch] extracted {rel}")
            if not keep_archives:
                os.remove(dst)
    print(f"[fetch] {done}/{len(rel_paths)} files in {out}")
    return done


def read_manifest(path: str) -> list[str]:
    with open(path, encoding="utf-8") as fp:
        return [ln.strip() for ln in fp
                if ln.strip() and not ln.lstrip().startswith("#")]


def main():
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = ap.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("fetch", help="manifest-driven fetch from any mirror")
    f.add_argument("--manifest", required=True,
                   help="text file: one relative path per line")
    f.add_argument("--out", required=True)
    f.add_argument("--url_template", required=True,
                   help="e.g. 'file:///mirror/{rel_path}' or an HF resolve "
                        "URL template")
    f.add_argument("--extract", action="store_true",
                   help="unpack .tar.gz/.zip next to the download")
    f.add_argument("--rm_archives", action="store_true")

    for name, spec in PRESETS.items():
        p = sub.add_parser(name, help=f"preset: {spec['repo']}")
        p.add_argument("--out", required=True)
        p.add_argument("--url_template",
                       default=HF_URL.replace("{repo}", spec["repo"]),
                       help="override to use a mirror")
        p.add_argument("--extract", action="store_true", default=True)

    args = ap.parse_args()
    if args.cmd == "fetch":
        rels = read_manifest(args.manifest)
        n = fetch(rels, args.out, args.url_template, args.extract,
                  keep_archives=not args.rm_archives)
    else:
        spec = PRESETS[args.cmd]
        n = fetch(spec["files"], args.out, args.url_template, args.extract)
        want = len(spec["files"])
        sys.exit(0 if n == want else 1)
    sys.exit(0 if n == len(rels) else 1)


if __name__ == "__main__":
    main()
